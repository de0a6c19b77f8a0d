package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class EdnSpec extends AnyFunSuite {
  import Edn._

  test("parses the reference index.clj shape (FIXTURES.md §1)") {
    val edn =
      """{:command-maps [{:uuid 42
        |                 :argmap {:max-generations "100" :problem "binomial-3"}}]}""".stripMargin
    val cms = commandMaps(edn)
    assert(cms.length == 1)
    assert(cms.head.uuid == "42")
    assert(cms.head.argmap == Map(
      "max-generations" -> "100", "problem" -> "binomial-3"))
  }

  test("multiple command maps, string uuids, commas as whitespace") {
    val edn = """{:command-maps [{:uuid "u-1", :argmap {:a 1, :b two}}
                 {:uuid "u-2" :argmap {:c [1 2 3]}}]}"""
    val cms = commandMaps(edn)
    assert(cms.map(_.uuid) == Vector("u-1", "u-2"))
    assert(cms(0).argmap == Map("a" -> "1", "b" -> "two"))
    assert(cms(1).argmap == Map("c" -> "[1 2 3]"))
  }

  test("config-file shape (reference ~/.db_config, src/db_loader.clj:67-84)") {
    val v = parse("""{:id 17 :user "etosch" :problem_data {p1 1 p2 2}}""")
    v match {
      case EMap(es) =>
        assert(es.collectFirst { case (EKeyword("id"), ENumber(n)) => n }
          .contains("17"))
      case _ => fail("expected map")
    }
  }

  test("comments and nested structures") {
    val v = parse("{:a [1 {:b \"x\"}] ; trailing comment\n :c -5}")
    assert(render(v) == "{a [1 {b x}], c -5}")
  }

  test("missing command-maps key -> empty") {
    assert(commandMaps("{:other 1}").isEmpty)
  }

  test("trailing garbage is a parse error, not silently ignored") {
    intercept[Edn.ParseError](parse("{:id 5} {:id 9}"))
    intercept[Edn.ParseError](parse("{:id 5} junk"))
    // trailing whitespace/comments are fine
    assert(render(parse("{:id 5}  ; done\n")) == "{id 5}")
  }
}
