package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The streaming top-k claims: per-epoch top-k rows re-ranked across
  * epochs (with a checkpoint restart in between) are EXACTLY the batch
  * per-window top-k of all streamed events — the structural merge law
  * (a pair beaten by k others in its own epoch is beaten globally);
  * crash-replay of a batch is bit-idempotent under the epoch overwrite;
  * OUT-OF-PROTOCOL duplication corrupts the ranking (same event in two
  * slots) — the documented CmsStream-style contrast that makes the
  * exactly-once discipline load-bearing; compaction preserves the
  * merged view. */
class TopKStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"w_start", $"rank").collect().map(_.toString).toSeq

  test("streamed ≡ batch top-k; replay-safe; dup corrupts; compaction stable") {
    val dir = tmp("tk_events"); val ckpt = tmp("tk_ck"); val store = tmp("tk_store")
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"value").localCheckpoint(true)

    // two stream legs with a restart between them (same checkpoint)
    events.filter($"event_id" % 2 === 0)
      .coalesce(1).write.mode("append").parquet(dir)
    TopKStream.run(spark, dir, ckpt, store).awaitTermination()
    events.filter($"event_id" % 2 =!= 0)
      .coalesce(1).write.mode("append").parquet(dir)
    TopKStream.run(spark, dir, ckpt, store).awaitTermination()

    val streamed = rows(TopKStream.merged(spark, store))
    val batch = rows(TopKStream.topOf(TopKStream.windowed(events)))
    assert(streamed == batch,
      "re-ranked epoch top-k diverged from the batch top-k")
    assert(streamed.nonEmpty)

    // the merge law's premise, asserted directly: every merged top-k
    // member exists in some epoch's stored rows
    val stored = EpochStore.read(spark, store)
      .select($"w_start", $"event_id").collect()
      .map(r => (r.get(0), r.getLong(1))).toSet
    TopKStream.merged(spark, store)
      .select($"w_start", $"event_id").collect()
      .foreach(r => assert(stored((r.get(0), r.getLong(1)))))

    // crash-replay of batch 1 (same id, same data): bit-idempotent
    TopKStream.processBatch(events.filter($"event_id" % 2 =!= 0), 1L, store)
    assert(rows(TopKStream.merged(spark, store)) == streamed,
      "replayed batch changed the ranking")

    // compaction collapses the live epochs; merged view unchanged
    TopKStream.compact(spark, store)
    assert(rows(TopKStream.merged(spark, store)) == streamed,
      "compaction changed the merged ranking")

    // OUT-OF-PROTOCOL duplication (new batch id, old data): the same
    // event can now hold two slots — the ranking MUST change, which is
    // why exactly-once rests on the epoch overwrite (torture-pinned in
    // EpochStore), not on ranking idempotence. Done LAST: an epoch
    // store has no "delete an epoch" repair (an empty-frame overwrite
    // writes no partition under dynamic mode — by design).
    TopKStream.processBatch(events.filter($"event_id" % 2 === 0), 9999L, store)
    assert(rows(TopKStream.merged(spark, store)) != streamed,
      "duplicated batch failed to perturb the ranking — merge not exact")
  }

  test("per-epoch store is bounded: ≤ K rows per window per epoch") {
    val store = tmp("tk_bound")
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"value")
    TopKStream.processBatch(events, 0L, store)
    val counts = EpochStore.read(spark, store)
      .groupBy($"w_start").agg(count(lit(1)).as("n"))
      .agg(max($"n")).collect().head.getLong(0)
    assert(counts <= TopKStream.K)
  }
}
