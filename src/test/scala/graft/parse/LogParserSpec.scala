package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests for the pure parsers (SURVEY.md §5.1/§5.3).
  * Fixture grammar per FIXTURES.md §1/§2 (reconstructed from the reference's
  * regexes, src/db_loader.clj:228-243, src/parse_logs_ecj.clj:89-123).
  * Property tests use seeded random generation (no scalatestplus in the
  * offline cache).
  */
class LogParserSpec extends AnyFunSuite {

  val clojushFixture: String =
    """Clojush version = 1.2.3
      |population-size = 1000
      |mutation-rate = 0.01
      |tournament-size = nil
      |;;;;;;;;;;;;;;;;;;;;
      |-*- Report at generation 0
      |best-fitness: 12.5
      |mean-fitness: 40.2
      |note: nil
      |;;;;;;;;;;;;;;;;;;;;
      |-*- Report at generation 1
      |best-fitness: 3.0
      |mean-fitness: 22.9
      |;;;;;;;;;;;;;;;;;;;;
      |SUCCESS at generation 1""".stripMargin

  test("clojush golden: header params, nil skipped") {
    val run = LogParser.parseClojush(clojushFixture)
    assert(run.headerParams == Seq(
      "Clojush version" -> "1.2.3",
      "population-size" -> "1000",
      "mutation-rate" -> "0.01"))
    assert(run.clojushVersion.contains("1.2.3"))
  }

  test("clojush golden: nil kept when skipNils=false") {
    val run = LogParser.parseClojush(clojushFixture, skipNils = false)
    assert(run.headerParams.contains("tournament-size" -> "nil"))
    assert(run.generations.head._2.contains("note" -> "nil"))
  }

  test("multi-separator lines are dropped (unlimited split, arity-2 keep)") {
    // reference :140,175: split without limit, keep only exact [k v] pairs —
    // a line with two separators yields 3 parts and is dropped entirely
    val fixture =
      """a = 1
        |bad = x = y
        |;;;;
        |-*- Report at generation 0
        |good: 1
        |bad: x: y""".stripMargin
    val run = LogParser.parseClojush(fixture)
    assert(run.headerParams == Seq("a" -> "1"))
    assert(run.generations == Seq(0 -> Seq("good" -> "1")))
  }

  test("clojush golden: generations keyed by trailing int of -*- line") {
    val run = LogParser.parseClojush(clojushFixture)
    assert(run.generations == Seq(
      0 -> Seq("best-fitness" -> "12.5", "mean-fitness" -> "40.2"),
      1 -> Seq("best-fitness" -> "3.0", "mean-fitness" -> "22.9")))
  }

  test("clojush golden: one summary row, SUCCESS parsed (intended semantics)") {
    assert(LogParser.parseClojush(clojushFixture).summary.contains((true, 1)))
    val failed = clojushFixture.replace("SUCCESS at generation 1",
      "FAILURE at generation 7")
    assert(LogParser.parseClojush(failed).summary.contains((false, 7)))
  }

  test("summary regex is real alternation, not the ref's character class") {
    // Reference bug (src/db_loader.clj:205): '[SUCCESS|FAILURE]' would match
    // any line with any of those letters; ours must NOT.
    val bogus = clojushFixture.replace("SUCCESS at generation 1",
      "CESS at generation 9")
    assert(LogParser.parseClojush(bogus).summary.isEmpty)
  }

  test("seq-split: delimiters dropped, no empty segments") {
    val segs = LogParser.seqSplit(
      Seq(";;", "a", "b", ";;;", ";;", "c", ";;"), ";+\\s*$".r)
    assert(segs == Vector(Vector("a", "b"), Vector("c")))
  }

  test("seq-split property: concat of segments == input minus delimiters") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val lines = Seq.fill(rnd.nextInt(30))(
        if (rnd.nextBoolean()) "x" + rnd.alphanumeric.take(5).mkString
        else ";" * (1 + rnd.nextInt(4)))
      val segs = LogParser.seqSplit(lines, ";+\\s*$".r)
      assert(segs.flatten == lines.filterNot(l => ";+\\s*$".r.findFirstIn(l).isDefined))
      assert(segs.forall(_.nonEmpty))
    }
  }

  test("round-trip property: params -> rendered log -> parser == params") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val kvs = (1 to (1 + rnd.nextInt(10))).map { i =>
        (s"key-$i-" + rnd.alphanumeric.take(4).mkString,
          rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      }.filter(_._2 != "nil").distinctBy(_._1)
      val log = (kvs.map { case (k, v) => s"$k = $v" } ++
        Seq(";;;;", "SUCCESS at generation 3")).mkString("\n")
      val run = LogParser.parseClojush(log)
      assert(run.headerParams == kvs)
      assert(run.summary.contains((true, 3)))
    }
  }

  test("uuid from filename") {
    assert(LogParser.uuidFromFilename("/a/b/run_abc-123.log").contains("abc-123"))
    assert(LogParser.uuidFromFilename("/a/b/run_x_y9.log.gz").contains("y9"))
    assert(LogParser.uuidFromFilename("nounderscore.log").isEmpty)
  }

  val ecjFixture: String =
    """preamble to ignore
      |Generation: 0
      |Best Individual: Fitness: 0.82
      |Tree: (+ x
      |  (* x x))
      |Generation: 1
      |Best Individual: Fitness: 0.95
      |End of Run: found ideal individual""".stripMargin

  test("ecj golden: marker-started groups, preamble dropped") {
    val groups = LogParser.ecjReadGen(ecjFixture.split("\n").toIndexedSeq)
    assert(groups.length == 3)
    assert(groups(0).head == "Generation: 0")
    assert(groups(2).head == "End of Run: found ideal individual")
  }

  test("ecj golden: continuation merge un-wraps values") {
    val merged = LogParser.ecjMergeContinuations(
      Seq("Tree: (+ x", "  (* x x))"))
    assert(merged == Vector("Tree: (+ x (* x x))"))
  }

  test("ecj golden: clean-data squeezes keys, trims values, null empties") {
    val cleaned = LogParser.ecjCleanData(
      Seq("Best Individual: Fitness: 0.82", "Empty Key:", "No Colon Line"))
    assert(cleaned(0) == ("BestIndividual", Some("Fitness: 0.82")))
    assert(cleaned(1) == ("EmptyKey", None))
    assert(cleaned(2) == ("NoColonLine", None))
  }

  test("ecj full parse") {
    val groups = LogParser.parseEcj(ecjFixture)
    assert(groups.length == 3)
    assert(groups(1).contains(("Generation", Some("1"))))
    assert(groups(0).exists { case (k, v) =>
      k == "Tree" && v.contains("(+ x (* x x))") })
  }
}
