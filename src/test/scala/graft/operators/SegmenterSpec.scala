package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Windowed segmentation operators match the pure-parser semantics
  * (R1–R3) on keyed ordered rows.
  */
class SegmenterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val lines = Seq(
    // (file, lineno, text)
    ("f1", 1, "a"), ("f1", 2, ";;"), ("f1", 3, "b"), ("f1", 4, "c"),
    ("f1", 5, ";;"), ("f2", 1, "x"), ("f2", 2, "y")
  ).toDF("file", "lineno", "text")

  test("R1 delimiterSegments: delimiters dropped, runs numbered per file") {
    val out = Segmenter.delimiterSegments(
      lines, $"file", $"lineno", $"text".rlike(";+$"))
      .groupBy($"file", $"seg").agg(collect_list($"text").as("ls"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).toList)).toSet
    assert(out == Set(("f1", 0L, List("a")), ("f1", 1L, List("b", "c")),
      ("f2", 0L, List("x", "y"))))
  }

  test("R2 markerSegments: marker kept as head, preamble dropped") {
    val ecj = Seq(
      ("f", 1, "preamble"), ("f", 2, "Generation: 0"), ("f", 3, "k: v"),
      ("f", 4, "Generation: 1"), ("f", 5, "k2: v2")
    ).toDF("file", "lineno", "text")
    val out = Segmenter.markerSegments(
      ecj, $"file", $"lineno", $"text".rlike("Generation:|of Run:"))
      .groupBy($"seg").agg(sort_array(collect_list($"text")).as("ls"))
      .orderBy($"seg").collect().map(_.getSeq[String](1).toList)
    assert(out.toList == List(
      List("Generation: 0", "k: v"), List("Generation: 1", "k2: v2")))
  }

  test("R3 mergeContinuations: continuation rows fold into anchors in order") {
    val rows = Seq(
      ("f", 1, "Tree: (+ x"), ("f", 2, "  (* x x))"), ("f", 3, "Fit: 0.9"),
      ("f", 4, "  extra"), ("f", 5, "  more")
    ).toDF("file", "lineno", "text")
    val out = Segmenter.mergeContinuations(
      rows, $"file", $"lineno", !$"text".contains(":"), $"text")
      .orderBy($"ord").collect().map(_.getAs[String]("merged")).toList
    assert(out == List("Tree: (+ x (* x x))", "Fit: 0.9 extra more"))
  }

  test("windowed R1 agrees with pure seq-split on the same input") {
    val text = Seq("h1", "h2", ";;;", "g1", ";;;", "g2", "g3")
    val df = text.zipWithIndex.map { case (t, i) => ("f", i, t) }
      .toDF("file", "lineno", "text")
    val windowed = Segmenter.delimiterSegments(
      df, $"file", $"lineno", $"text".rlike(";+$"))
      .groupBy($"seg").agg(sort_array(collect_list(struct($"lineno", $"text"))).as("s"))
      .orderBy($"seg").collect()
      .map(_.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1)).toVector).toVector
    val pure = graft.parse.LogParser.seqSplit(text, ";+$".r)
    assert(windowed == pure)
  }
}
