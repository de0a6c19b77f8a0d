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

  test("window over custkey-bucketed+sorted orders plans with ZERO " +
      "exchanges below the WindowExec") {
    // the r18_w3_layout_3way property: bucketing by the window's partition
    // key satisfies its clustering requirement outright (2.7x over the
    // plain single-exchange plan at the 100x corpus) — pin it so a
    // refactor can't silently reintroduce the window shuffle
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders_cust_w")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "b_orders_cust_w")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    Bucketing.writeBucketedSorted(Tables.orders(spark, sf),
      "b_orders_cust_w", "o_custkey",
      Seq("o_custkey", "o_orderdate", "o_orderkey"), 4)
    try {
      val f = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey").rowsBetween(-2, 0)
      val df = spark.table("b_orders_cust_w")
        .select($"o_custkey", $"o_orderkey",
          avg($"o_totalprice").over(f).as("mavg3"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window "), s"no window in plan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"custkey-bucketed window shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan is not bucket-aware:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_cust_w")
  }

  test("Tables bucketed layout: fails loudly unwritten, resolves and re-registers written") {
    val layout = "orderkey"
    val names = Tables.BucketedLayouts(layout).keys.toSeq
    def catTables = names.map(Tables.bucketedName(layout, _, sf))
    // clean slate: no catalog entries, no warehouse dirs
    catTables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
    }
    System.setProperty("graft.bucketed", layout)
    try {
      // selected-but-unwritten must FAIL, not fall back to parquet
      val ex = intercept[IllegalArgumentException] {
        Tables.orders(spark, sf).count()
      }
      assert(ex.getMessage.contains("bucketwrite"), ex.getMessage)
      // unknown layout names are rejected outright
      System.setProperty("graft.bucketed", "nonsense")
      intercept[IllegalArgumentException] { Tables.orders(spark, sf) }
      System.setProperty("graft.bucketed", layout)

      // write the layout, then resolution must serve the bucketed tables
      // with content identical to the plain parquet read
      Tables.BucketedLayouts(layout).foreach { case (table, key) =>
        Bucketing.writeBucketed(
          Tables.bucketedSource(spark, sf, table),
          Tables.bucketedName(layout, table, sf),
          key, Tables.BucketCount)
      }
      def ordersRows() = Tables.orders(spark, sf)
        .orderBy($"o_orderkey").collect().toSeq
      System.clearProperty("graft.bucketed")
      val plain = ordersRows()
      System.setProperty("graft.bucketed", layout)
      assert(ordersRows() == plain, "bucketed content must equal plain")

      // simulate a NEW session: catalog entry gone, FILES still present
      // (that is what an in-memory catalog dying between sessions leaves
      // behind). DROP on a managed table deletes its files too, so stash
      // the dir around the drop.
      val t = Tables.bucketedName(layout, "orders", sf)
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      val stash = java.nio.file.Files.createTempDirectory("bk").resolve(t)
      def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
        java.nio.file.Files.walk(from).forEach { p =>
          val dest = to.resolve(from.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(dest)
          else java.nio.file.Files.copy(p, dest)
        }
      }
      copyTree(loc.toPath, stash)
      spark.sql(s"DROP TABLE $t")
      assert(!spark.catalog.tableExists(t))
      copyTree(stash, loc.toPath)
      // remove the stash (walk deletes children before parents)
      java.nio.file.Files.walk(stash.getParent).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      assert(ordersRows() == plain, "re-registered content must equal plain")
      assert(spark.catalog.tableExists(t), "resolve must have re-registered")
      // a bare scan reports "Bucketed: false (disabled by query planner)"
      // because nothing consumes the distribution — assert the CATALOG
      // metadata instead: the re-registered table carries the bucket spec
      val desc = spark.sql(s"DESCRIBE EXTENDED $t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc.get("Num Buckets").contains(Tables.BucketCount.toString),
        s"re-registered table lost its bucket spec: $desc")
      assert(desc.get("Bucket Columns").exists(_.contains("o_orderkey")),
        s"re-registered table lost its bucket key: $desc")
    } finally {
      System.clearProperty("graft.bucketed")
      catTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("events-by-user_id layout: identical results, exchange-free sessions") {
    // r13 verdict item 5: the event-analytics family shuffles events by
    // user_id every run; the bucketed layout must (a) change NOTHING about
    // results — t4_session rows identical plain vs bucketed — and (b)
    // satisfy the session aggregation's ClusteredDistribution(user_id)
    // straight off the scan: no Exchange hashpartitioning(user_id…)
    val layout = "orderkey"
    val t = Tables.bucketedName(layout, "events", sf)
    graft.SparkTestSession.dropManagedTable(t)
    Bucketing.writeBucketedSorted(
      Tables.bucketedSource(spark, sf, "events"), t, "user_id",
      Seq("user_id", "ts"), Tables.BucketCount)
    def session() = graft.SparkEntry.queries("t4_session")(spark, sf)
    val plain = session().collect().toSeq
    System.setProperty("graft.bucketed", layout)
    try {
      // only the events table of the layout is written here: resolve must
      // serve events bucketed while this query touches no other table
      val bucketed = session()
      assert(bucketed.collect().toSeq == plain)
      val txt = bucketed.queryExecution.executedPlan.toString
      assert(txt.contains("Bucketed: true"), txt)
      assert(!txt.contains("Exchange hashpartitioning(user_id#"),
        s"session aggregation still shuffles events by user_id:\n$txt")
    } finally {
      System.clearProperty("graft.bucketed")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
