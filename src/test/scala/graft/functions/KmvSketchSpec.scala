package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the one-pass KMV aggregate (KmvSketch) — r19 verdict item 4:
  *  - TAKEORDERED EQUIVALENCE: graft_kmv over RAW (duplicated) rows is
  *    bit-identical to distinct-then-ORDER BY (h, id) LIMIT k with
  *    per-key bool_or flags — the x_kmv_onepass gate's claim, pinned on
  *    adversarial synthetic data (every key duplicated, flags split
  *    across occurrences so ONLY the in-buffer OR can reunite them);
  *  - PARTITIONING INVARIANCE: the merge() law (k-smallest of unions)
  *    under 1, 7, and 32-way adversarial repartitioning;
  *  - SERIALIZATION PATH: ObjectHashAggregateExec's sort-based fallback
  *    (serialize/deserialize mid-stream) must not change results;
  *  - UNDER-FULL BUFFER: n < k returns the whole key set, sorted;
  *  - NULL SKIP: null h/id rows are skipped, null flags read false;
  *  - SQL SURFACE: the GraftExtensions-registered graft_kmv matches the
  *    Column API bit-for-bit.
  */
class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 500 distinct keys, each appearing 6 times; the in_a flag rides only
  // occurrence 0 and in_b only occurrence 1, so the retained entry's
  // flags are correct ONLY if the buffer ORs recurring keys. Hashes are
  // adversarial too: h = key % 97 forces heavy h-ties so the id
  // tie-break carries weight, and duplicate (h, id) pairs hit both the
  // under-root probe and the root-equality path.
  private lazy val synth = spark.range(3000)
    .select(($"id" % 500).as("key"), ($"id" / 500).cast("int").as("occ"))
    .select(($"key" % 97).as("h"), $"key".as("id"),
      ($"occ" === 0 && $"key" % 3 === 0).as("in_a"),
      ($"occ" === 1 && $"key" % 2 === 0).as("in_b"))
    .localCheckpoint(true)

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(KmvSketch.kmv($"h", $"id", $"in_a", $"in_b", k).as("sk"))
      .select(posexplode($"sk").as(Seq("pos", "e")))
      .select($"pos", $"e.h", $"e.id", $"e.in_a", $"e.in_b")
      .collect().toSeq

  private def viaSort(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"h", $"id")
      .agg(max($"in_a").as("in_a"), max($"in_b").as("in_b"))
      .orderBy($"h", $"id").limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy($"h", $"id")).cast("int").as("rn"),
        $"h", $"id", $"in_a", $"in_b")
      .select(($"rn" - 1).as("pos"), $"h", $"id", $"in_a", $"in_b")
      .collect().toSeq

  test("equals distinct + TakeOrdered with bool_or flags (k=64)") {
    assert(viaAgg(synth, 64) == viaSort(synth, 64))
  }

  test("flag union across occurrences: split flags reunite in-buffer") {
    val rows = viaAgg(synth, 64)
    // keys divisible by 6 carry BOTH flags, from different occurrences
    val both = rows.filter(r => r.getLong(2) % 6 == 0)
    assert(both.nonEmpty)
    assert(both.forall(r => r.getBoolean(3) && r.getBoolean(4)))
  }

  test("partitioning invariance: 1, 7, 32-way reshards agree") {
    val base = viaAgg(synth, 64)
    for (p <- Seq(1, 7, 32))
      assert(viaAgg(synth.repartition(p, $"id"), 64) == base, s"p=$p")
  }

  test("under-full buffer returns the whole key set, sorted") {
    val rows = viaAgg(synth, 4096)
    assert(rows.size == 500)
    assert(rows == viaSort(synth, 4096))
  }

  test("sort-based fallback (serialize/deserialize mid-stream) agrees") {
    val prior = spark.conf
      .getOption("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf
      .set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1")
    try {
      // grouped form so >1 buffer per task forces the fallback
      val grouped = synth.withColumn("g", $"id" % 3)
        .groupBy($"g").agg(KmvSketch.kmv($"h", $"id", $"in_a", $"in_b", 16)
          .as("sk"))
        .select($"g", posexplode($"sk"))
        .orderBy($"g", $"pos").collect().toSeq
      spark.conf
        .set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "128")
      val normal = synth.withColumn("g", $"id" % 3)
        .groupBy($"g").agg(KmvSketch.kmv($"h", $"id", $"in_a", $"in_b", 16)
          .as("sk"))
        .select($"g", posexplode($"sk"))
        .orderBy($"g", $"pos").collect().toSeq
      assert(grouped == normal)
    } finally prior match {
      case Some(v) => spark.conf
        .set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None => spark.conf
        .unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
  }

  test("null h/id skipped; null flags read false") {
    val df = Seq[(Option[Long], Option[Long], Option[Boolean], Option[Boolean])](
      (Some(5L), Some(1L), None, Some(true)),
      (Some(3L), Some(2L), Some(true), None),
      (None, Some(3L), Some(true), Some(true)),
      (Some(7L), None, Some(true), Some(true)))
      .toDF("h", "id", "in_a", "in_b")
    val rows = viaAgg(df, 8)
    assert(rows.map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3),
      r.getBoolean(4))) == Seq((3L, 2L, true, false), (5L, 1L, false, true)))
  }

  test("SQL surface graft_kmv matches the Column API") {
    synth.createOrReplaceTempView("kmv_synth")
    val sql = spark.sql(
      """SELECT posexplode(sk) AS (pos, e) FROM (
        |  SELECT graft_kmv(h, id, in_a, in_b, 64) AS sk FROM kmv_synth)"""
        .stripMargin)
      .select($"pos", $"e.h", $"e.id", $"e.in_a", $"e.in_b")
      .collect().toSeq
    assert(sql == viaAgg(synth, 64))
  }

  test("k bounds are enforced") {
    intercept[IllegalArgumentException] {
      KmvSketch.kmv($"h", $"id", $"in_a", $"in_b", 0)
    }
  }
}
