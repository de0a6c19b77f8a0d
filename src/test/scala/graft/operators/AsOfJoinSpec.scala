package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def quotes = Seq(
    ("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 3L, 20.0)
  ).toDF("sym", "qt", "px")

  test("backward: latest right row at or before each left time") {
    val trades = Seq(
      ("A", 2L), ("A", 5L), ("A", 6L), ("B", 1L), ("B", 4L)
    ).toDF("sym", "tt")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
      .orderBy("sym", "tt")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("A", 2L, Some(10.0)),   // qt=1 carried forward
      ("A", 5L, Some(11.0)),   // equal time matches
      ("A", 6L, Some(11.0)),
      ("B", 1L, None),         // no quote yet
      ("B", 4L, Some(20.0))))
  }

  test("backward rejects right-value names that exist on the left") {
    val trades = Seq(("A", 2L, 1.0)).toDF("sym", "tt", "px")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
    }
    assert(e.getMessage.contains("px"))
  }
}
