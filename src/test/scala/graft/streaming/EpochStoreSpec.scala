package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The shared exactly-once epoch-store contract, pinned ONCE (r14 verdict
  * item 6: AnnStream/SketchStream/HllStream/GraphStream each hand-rolled
  * this; drift between four copies is how subtle replay bugs start):
  *
  *  1. replay idempotence — re-writing an epoch replaces its partition,
  *     the multiset is unchanged;
  *  2. compaction equivalence — one partition left, same merged rows;
  *  3. COMPACTION-SAFE CONCURRENT READS (the r14 ADVICE exposure): in the
  *     window where the compacted partition is committed but the absorbed
  *     partitions are not yet deleted, a reader must NOT double-count;
  *  4. epochs arriving after a compaction are read alongside it, and a
  *     second compaction absorbs both (strictly increasing compacted id);
  *  5. latest/latestBelow serve snapshot-per-epoch stores;
  *  6. an epoch id at/below the compaction high-water mark (a fresh
  *     checkpoint lineage pointed at an old store) fails LOUDLY instead
  *     of being silently hidden by the read rule.
  */
class EpochStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def bag(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.groupBy($"k", $"v").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def frame(rows: (Long, Long)*) = rows.toDF("k", "v")

  test("replay idempotence, compaction equivalence, post-compaction epochs") {
    val store = tmp("es_basic")
    EpochStore.writeEpoch(frame(1L -> 10L, 2L -> 20L), 0L, store)
    EpochStore.writeEpoch(frame(1L -> 10L, 3L -> 30L), 1L, store)
    val before = bag(EpochStore.read(spark, store))
    assert(before == Map((1L, 10L) -> 2L, (2L, 20L) -> 1L, (3L, 30L) -> 1L))

    // crash-replay epoch 1: partition replaced, multiset unchanged
    EpochStore.writeEpoch(frame(1L -> 10L, 3L -> 30L), 1L, store)
    assert(bag(EpochStore.read(spark, store)) == before, "replay drifted")

    // compact (identity merge): same rows, exactly one partition left
    EpochStore.compact(spark, store)
    assert(bag(EpochStore.read(spark, store)) == before, "compaction drifted")
    val parts = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(parts.length == 1, s"compaction left partitions: $parts")
    assert(parts.head == s"batch=${EpochStore.CompactedBase + 1L}",
      "compacted id must encode the absorbed high-water mark")

    // a later epoch reads alongside the compacted snapshot ...
    EpochStore.writeEpoch(frame(4L -> 40L), 2L, store)
    assert(bag(EpochStore.read(spark, store)) ==
      before + ((4L, 40L) -> 1L), "post-compaction epoch missing")
    // ... and a second compaction absorbs both under a HIGHER id
    EpochStore.compact(spark, store)
    assert(bag(EpochStore.read(spark, store)) ==
      before + ((4L, 40L) -> 1L), "second compaction drifted")
    val parts2 = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(parts2 == Seq(s"batch=${EpochStore.CompactedBase + 2L}"))

    // nothing new to absorb → no-op (compacted ids stay strictly
    // increasing by construction)
    EpochStore.compact(spark, store)
    assert(new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq ==
      Seq(s"batch=${EpochStore.CompactedBase + 2L}"))
  }

  test("a concurrent reader in the compaction window does not double-count") {
    val store = tmp("es_window")
    EpochStore.writeEpoch(frame(1L -> 10L, 2L -> 20L), 0L, store)
    EpochStore.writeEpoch(frame(1L -> 10L), 1L, store)
    val live = bag(EpochStore.read(spark, store))

    // reproduce compact()'s state between "snapshot committed" and
    // "absorbed partitions deleted": write the compacted partition by
    // hand, leave the plain ones in place — both copies now on disk
    EpochStore.read(spark, store).localCheckpoint(true)
      .withColumn("batch", lit(EpochStore.CompactedBase + 1L))
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(store)
    val names = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(names.length == 3, s"window state not constructed: $names")

    // the r14 exposure: a naive read sums both copies; the read rule
    // must exclude the absorbed partitions and see the live multiset
    assert(bag(EpochStore.read(spark, store)) == live,
      "reader double-counted during the compaction window")
  }

  test("latest/latestBelow serve snapshot-per-epoch stores") {
    val store = tmp("es_snap")
    assert(EpochStore.latestBelow(spark, store, "epoch", 10L).isEmpty)
    EpochStore.writeEpoch(frame(1L -> 100L), 0L, store, key = "epoch")
    EpochStore.writeEpoch(frame(1L -> 200L), 1L, store, key = "epoch")
    assert(bag(EpochStore.latest(spark, store, "epoch")) ==
      Map((1L, 200L) -> 1L))
    // strictly-below: a replayed epoch 1 must seed from epoch 0
    assert(bag(EpochStore.latestBelow(spark, store, "epoch", 1L).get) ==
      Map((1L, 100L) -> 1L))
    assert(EpochStore.latestBelow(spark, store, "epoch", 0L).isEmpty)
  }

  test("pruneSnapshots keeps the newest `keep` epochs; floor enforced") {
    val store = tmp("es_prune")
    for (i <- 0L to 4L)
      EpochStore.writeEpoch(frame(1L -> (i * 10L)), i, store, key = "epoch")
    // prune to the newest 2: ids 0..2 dropped, latest + predecessor kept
    val dropped = EpochStore.pruneSnapshots(spark, store, "epoch", keep = 2)
    assert(dropped == Seq(0L, 1L, 2L))
    val left = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSeq.sorted
    assert(left == Seq("epoch=3", "epoch=4"))
    // serving + warm-start surfaces still correct
    assert(bag(EpochStore.latest(spark, store, "epoch")) ==
      Map((1L, 40L) -> 1L))
    assert(bag(EpochStore.latestBelow(spark, store, "epoch", 4L).get) ==
      Map((1L, 30L) -> 1L))
    // pruning again is a no-op; keep < 2 is rejected (replay needs the
    // newest epoch's predecessor)
    assert(EpochStore.pruneSnapshots(spark, store, "epoch", keep = 2).isEmpty)
    intercept[IllegalArgumentException] {
      EpochStore.pruneSnapshots(spark, store, "epoch", keep = 1)
    }
    // a compacted store is a DELTA store: pruning it would change the
    // merged multiset — must refuse loudly
    val delta = tmp("es_prune_delta")
    EpochStore.writeEpoch(frame(1L -> 10L), 0L, delta)
    EpochStore.writeEpoch(frame(2L -> 20L), 1L, delta)
    EpochStore.compact(spark, delta)
    EpochStore.writeEpoch(frame(3L -> 30L), 2L, delta)
    intercept[IllegalArgumentException] {
      EpochStore.pruneSnapshots(spark, delta)
    }
  }

  test("an epoch at/below the compaction high-water mark fails loudly") {
    val store = tmp("es_lineage")
    EpochStore.writeEpoch(frame(1L -> 10L), 0L, store)
    EpochStore.writeEpoch(frame(2L -> 20L), 1L, store)
    EpochStore.compact(spark, store)
    // a fresh checkpoint lineage restarting at batch 0 must not be
    // silently hidden by the read rule
    val e = intercept[IllegalArgumentException] {
      EpochStore.writeEpoch(frame(3L -> 30L), 0L, store)
    }
    assert(e.getMessage.contains("high-water"))
    // the next id the real lineage would use still works
    EpochStore.writeEpoch(frame(3L -> 30L), 2L, store)
    assert(bag(EpochStore.read(spark, store)) ==
      Map((1L, 10L) -> 1L, (2L, 20L) -> 1L, (3L, 30L) -> 1L))
  }
}
