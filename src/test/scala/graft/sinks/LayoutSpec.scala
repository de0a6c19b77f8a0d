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

  test("zValue is the Morton interleave, monotone per dimension") {
    // reference implementation: bit-by-bit interleave
    def mortonRef(a: Long, b: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val samples = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (12345L, 67890L), (0x55555555L, 0x2AAAAAAAL))
    val got = samples.toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == samples.map { case (a, b) => mortonRef(a, b) },
      "zValue diverged from the bit-by-bit Morton reference")
    // z is non-negative for 31-bit keys (signed ordering IS the Z-order)
    assert(got.forall(_ >= 0L))
    // dominance monotone: growing either key never shrinks z
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = rng.nextInt(1 << 30).toLong
      val b = rng.nextInt(1 << 30).toLong
      val da = rng.nextInt(1 << 10).toLong
      val db = rng.nextInt(1 << 10).toLong
      assert(mortonRef(a + da, b + db) >= mortonRef(a, b))
    }
  }

  test("writeZOrdered round-trips the data and tightens both dimensions") {
    val sf = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "zord").toString
    val ev = graft.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value")
    Layout.writeZOrdered(ev, path, "user_id", "event_id", numFiles = 8)
    val back = spark.read.parquet(path)
    // lossless (the __z sort key does not leak into the data)
    assert(back.columns.toSeq.sorted == Seq("event_id", "user_id", "value"))
    assert(back.count() == ev.count())
    assert(back.except(ev).isEmpty && ev.except(back).isEmpty)
  }

  test("z-ordered files narrow BOTH dimensions on balanced-width keys") {
    // Z-order's contract is per-BIT interleaving, so the file envelopes
    // tighten in both dimensions only when the two keys have comparable
    // bit widths (a 4-bit × 10-bit pair degrades toward a single-dim
    // sort on the wide key — the standard Morton caveat, documented on
    // zValue). Balanced case: a 32×32 grid, 8 files ⇒ each file must
    // cover a fraction of BOTH ranges, which no single-column sort does.
    val path = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "zgrid").toString
    val grid = spark.range(0, 1024)
      .select(($"id" % 32).as("a"), ($"id" / 32).cast("long").as("b"))
    Layout.writeZOrdered(grid, path, "a", "b", numFiles = 8)
    val spans = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"a") - min($"a")).as("aspan"),
        (max($"b") - min($"b")).as("bspan"))
      .collect()
    assert(spans.length == 8)
    val narrowBoth = spans.count(r =>
      r.getLong(1) <= 16 && r.getLong(2) <= 16)
    assert(narrowBoth >= spans.length / 2,
      s"expected most files ≤ half-range in both dims: " +
        spans.map(r => (r.getLong(1), r.getLong(2))).mkString(","))
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
