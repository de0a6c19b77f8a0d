package graft.parse

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure parser core (SURVEY.md §5.3) —
  * runs under sbt test via scalacheck's own test framework.
  */
object ParserProps extends Properties("LogParser") {

  private val delim = ";+\\s*$".r
  private val contentLine: Gen[String] =
    Gen.alphaNumStr.map("x" + _) // never matches the delimiter
  private val anyLine: Gen[String] =
    Gen.frequency(4 -> contentLine, 1 -> Gen.choose(1, 5).map(";" * _))

  property("seqSplit concatenation invariant") =
    Prop.forAll(Gen.listOf(anyLine)) { lines =>
      val segs = LogParser.seqSplit(lines, delim)
      segs.flatten == lines.filterNot(l => delim.findFirstIn(l).isDefined)
    }

  property("seqSplit yields no empty segments") =
    Prop.forAll(Gen.listOf(anyLine)) { lines =>
      LogParser.seqSplit(lines, delim).forall(_.nonEmpty)
    }

  property("header KV round-trip") = {
    val kv = for {
      k <- Gen.identifier.suchThat(_.nonEmpty)
      v <- Gen.identifier.suchThat(v => v.nonEmpty && v != "nil")
    } yield (k, v)
    Prop.forAll(Gen.nonEmptyListOf(kv)) { kvs0 =>
      val kvs = kvs0.distinctBy(_._1)
      val log = kvs.map { case (k, v) => s"$k = $v" }.mkString("\n")
      LogParser.parseClojush(log).headerParams == kvs
    }
  }

  property("ecj continuation merge preserves token content") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf(
      Gen.identifier.map(_ + ": value"),
      Gen.identifier.map("  " + _)))) { lines =>
      val merged = LogParser.ecjMergeContinuations(lines)
      // every non-space character of the input survives the merge
      merged.mkString(" ").filterNot(_.isWhitespace).sorted ==
        lines.mkString(" ").filterNot(_.isWhitespace).sorted
    }

  property("uuid extraction finds the last underscore token") =
    Prop.forAll(Gen.identifier, Gen.identifier) { (a, b) =>
      LogParser.uuidFromFilename(s"/p/${a}_$b.log").contains(b)
    }
}
