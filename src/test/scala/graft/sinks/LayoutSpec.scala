package graft.sinks

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed joins run without a shuffle; partitioned reads prune
  * directories (plan-level assertions).
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("same-bucketed tables join with zero Exchange") {
    val sf = "/root/testdata/sf0.001"
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Layout.writeBucketed(
      graft.Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
      "b_lineitem", Seq("l_orderkey"), 8)
    Layout.writeBucketed(
      graft.Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice"),
      "b_orders", Seq("o_orderkey"), 8)

    // merge hint: force the sort-merge path (Catalyst would broadcast these
    // tiny tables) — that's the plan shape fact-fact joins take at scale
    val joined = spark.table("b_lineitem").hint("merge")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
    assert(joined.count() == 6000)
    assert(!Layout.hasShuffle(joined),
      s"bucketed join should be shuffle-free:\n${joined.queryExecution.executedPlan}")

    // contrast: the same merge join on raw parquet must shuffle both sides
    val raw = graft.Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      .hint("merge")
      .join(graft.Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice"),
        $"l_orderkey" === $"o_orderkey")
    assert(Layout.hasShuffle(raw))
  }

  test("partitioned write prunes directories on read") {
    val path = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "part").toString
    val sf = "/root/testdata/sf0.001"
    Layout.writePartitioned(
      graft.Tables.orders(spark, sf)
        .withColumn("order_year", year($"o_orderdate")),
      path, Seq("order_year"))
    val pruned = spark.read.parquet(path).filter($"order_year" === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"expected partition filters in:\n$plan")
    assert(pruned.count() > 0)
    // all rows in the pruned scan really are 1997
    assert(pruned.filter($"order_year" =!= 1997).count() == 0)
  }
}
