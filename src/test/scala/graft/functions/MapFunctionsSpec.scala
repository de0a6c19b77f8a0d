package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F15 map-function surface (SURVEY.md §2.4): the EAV tables pivot to
  * map-typed columns for schema-on-read access; these pin the map built-ins
  * the engine exposes for that shape (construction from grouped entries,
  * key/value extraction, lookup, value transformation).
  */
class MapFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eav = Seq(
    (1L, "rate", "0.1"), (1L, "size", "100"), (2L, "rate", "0.2")
  ).toDF("id", "param", "value")

  test("EAV rows collapse to a map column via map_from_entries") {
    val m = eav.groupBy($"id")
      .agg(map_from_entries(collect_list(struct($"param", $"value"))).as("params"))
    val row1 = m.filter($"id" === 1L)
      .select(element_at($"params", "size")).head().getString(0)
    assert(row1 == "100")
    assert(m.filter($"id" === 2L)
      .select(map_keys($"params")).head().getSeq[String](0) == Seq("rate"))
  }

  test("map_values / transform_values / map_concat behave") {
    val m = eav.groupBy($"id")
      .agg(map_from_entries(collect_list(struct($"param", $"value"))).as("params"))
    val doubled = m.select($"id",
      transform_values($"params", (_, v) => concat(v, lit("!"))).as("p2"))
    assert(doubled.filter($"id" === 2L)
      .select(element_at($"p2", "rate")).head().getString(0) == "0.2!")
    val merged = m.filter($"id" === 2L)
      .select(map_concat($"params", map(lit("extra"), lit("x"))).as("p3"))
    assert(merged.select(size(map_keys($"p3"))).head().getInt(0) == 2)
  }

  test("map round-trips through the EAV explode (map_entries inverse)") {
    val m = eav.groupBy($"id")
      .agg(map_from_entries(collect_list(struct($"param", $"value"))).as("params"))
    val back = m.select($"id", explode(map_entries($"params")).as("e"))
      .select($"id", $"e.key".as("param"), $"e.value".as("value"))
    assert(back.count() == eav.count())
    assert(back.except(eav).isEmpty && eav.except(back).isEmpty)
  }
}
