package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bounded-heap grouped top-k aggregate (TopKPairs):
  *  - WINDOW EQUIVALENCE: graft_topk(score, id, k) exploded with ranks is
  *    bit-identical to the row_number window formulation (score DESC, id
  *    ASC ties) — the a14_group_topk gate's claim, pinned here on
  *    adversarial synthetic data (heavy ties, NaN-free doubles, groups
  *    smaller and larger than k);
  *  - PARTITIONING INVARIANCE: the partial-aggregation path (map-side
  *    heaps merged on the reduce side) yields the same result under 1,
  *    7, and 32-way adversarial repartitioning — the merge() law;
  *  - SERIALIZATION PATH: forcing ObjectHashAggregateExec's sort-based
  *    fallback after 2 groups exercises serialize/deserialize mid-stream
  *    and must not change results;
  *  - NULL SKIP + SHORT GROUPS: null scores/ids are skipped, a group with
  *    fewer than k rows returns all its rows, still ordered;
  *  - SQL SURFACE: the GraftExtensions-registered graft_topk matches the
  *    Column API bit-for-bit.
  */
class TopKPairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 40 groups × ~200 rows, scores drawn from 13 distinct values so ties
  // are everywhere and the id tie-break carries real weight
  private lazy val synth = spark.range(8000)
    .select(($"id" % 40).as("g"),
      (xxhash64($"id") % 13).cast("double").as("score"),
      $"id".as("rid"))
    .localCheckpoint(true)

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(TopKPairs.topk($"score", $"rid", k).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("rid"), $"col.score".as("score"))
      .orderBy($"g", $"rank")
      .collect().toSeq

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"rid")
    df.select($"g", $"score", $"rid",
        row_number().over(w).cast("long").as("rank"))
      .filter($"rank" <= k)
      .select($"g", $"rank", $"rid", $"score")
      .orderBy($"g", $"rank")
      .collect().toSeq
  }

  test("window equivalence on tie-heavy synthetic data (k=5)") {
    assert(viaAgg(synth, 5) == viaWindow(synth, 5))
  }

  test("k larger than every group returns whole groups, ranked") {
    assert(viaAgg(synth, 1000) == viaWindow(synth, 1000))
  }

  test("k=1 is max_by semantics with deterministic ties") {
    assert(viaAgg(synth, 1) == viaWindow(synth, 1))
  }

  test("partitioning invariance: 1, 7, 32-way reshards agree") {
    val base = viaAgg(synth, 7)
    assert(viaAgg(synth.repartition(1), 7) == base)
    assert(viaAgg(synth.repartition(7, $"rid"), 7) == base)
    assert(viaAgg(synth.repartition(32, $"score"), 7) == base)
  }

  test("sort-based fallback (serialize/deserialize mid-stream) agrees") {
    val expected = viaAgg(synth, 5)
    spark.sessionState.conf.setConfString(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    try {
      assert(viaAgg(synth.repartition(11, $"rid"), 5) == expected)
    } finally spark.sessionState.conf.unsetConf(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
  }

  test("null scores and ids are skipped, not ranked") {
    val withNulls = synth
      .withColumn("score",
        when($"rid" % 5 === 0, lit(null).cast("double")).otherwise($"score"))
      .withColumn("rid",
        when($"rid" % 7 === 0, lit(null).cast("long")).otherwise($"rid"))
    val clean = withNulls.filter($"score".isNotNull && $"rid".isNotNull)
    assert(viaAgg(withNulls, 5) == viaWindow(clean, 5))
  }

  test("NaN scores rank greatest, matching the window formulation") {
    // NaN sorts as the GREATEST double in Spark (and DuckDB); the heap
    // compares with SQL total-order semantics so a NaN at the root must
    // not freeze inserts and NaN rows must outrank every finite score.
    val withNaN = synth.withColumn("score",
      when($"rid" % 11 === 0, lit(Double.NaN)).otherwise($"score"))
    assert(viaAgg(withNaN, 5) == viaWindow(withNaN, 5))
    // adversarial order: NaN arrives FIRST (sits at the root while the
    // heap fills) and finite scores follow — pre-fix this froze the heap
    val nanFirst = spark.range(100)
      .select(lit(0L).as("g"),
        when($"id" < 3, lit(Double.NaN))
          .otherwise($"id".cast("double")).as("score"),
        $"id".as("rid"))
      .coalesce(1).sortWithinPartitions($"rid")
    assert(viaAgg(nanFirst, 5) == viaWindow(nanFirst, 5))
    // NaN must occupy the top ranks, ids ascending among the NaN ties
    val top = viaAgg(nanFirst, 5)
    assert(top.take(3).map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L))
    assert(top.take(3).forall(_.getDouble(3).isNaN))
  }

  test("SQL surface graft_topk matches the Column API") {
    synth.createOrReplaceTempView("topk_synth")
    val sql = spark.sql("""
      SELECT g, CAST(pos + 1 AS BIGINT) AS rank, col.id AS rid,
        col.score AS score
      FROM (SELECT g, graft_topk(score, rid, 5) AS top
            FROM topk_synth GROUP BY g)
      LATERAL VIEW posexplode(top) AS pos, col
      ORDER BY g, rank""").collect().toSeq
    assert(sql == viaAgg(synth, 5))
  }

  test("k bounds are enforced") {
    intercept[IllegalArgumentException] {
      TopKPairs.topk($"score", $"rid", 0)
    }
    intercept[IllegalArgumentException] {
      TopKPairs.topk($"score", $"rid", 65537)
    }
  }
}
