package graft.sources

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout claim, demonstrated: both join sides bucketed+sorted
  * by the join key → the join plans with NO shuffle exchange at all.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ lineitem joins with zero exchanges") {
    // a previous JVM may have left the table dir without catalog metadata
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sf), "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)

    // force the SMJ path (the sf0.001 tables would broadcast otherwise)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join itself is exchange-free: the ONLY exchange allowed is the
      // one feeding the final aggregation
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange"),
        s"bucketed join still shuffles its inputs:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan is not bucket-aware:\n$plan")

      // and the result matches the plain (shuffled) join
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum($"l_quantity").as("q"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
