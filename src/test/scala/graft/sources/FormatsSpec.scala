package graft.sources

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** S8's non-parquet formats, demonstrated: JSON and ORC round-trip the same
  * rows, and the ORC scan takes predicate pushdown like parquet does.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  lazy val src = Tables.orders(spark, sf)
    .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")

  def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, Double)] =
    df.select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet

  test("JSON round-trip preserves rows") {
    val dir = Files.createTempDirectory(Paths.get("target"), "fmt_json").toString
    src.write.mode("overwrite").json(dir)
    assert(rows(spark.read.json(dir)) == rows(src))
  }

  test("ORC round-trip preserves rows and takes predicate pushdown") {
    val dir = Files.createTempDirectory(Paths.get("target"), "fmt_orc").toString
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(rows(back) == rows(src))

    val filtered = back.filter($"o_totalprice" > 100000.0)
      .select($"o_orderkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"),
      s"ORC scan did not push the filter:\n$plan")
    // and pruned the schema to the referenced columns
    assert(!plan.contains("o_orderstatus") || plan.contains("ReadSchema"),
      s"no column pruning evidence:\n$plan")
  }
}
