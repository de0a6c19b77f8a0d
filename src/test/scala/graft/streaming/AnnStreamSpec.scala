package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.ext.IvfAnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The incremental-IVF claims, demonstrated:
  *  - vectors streamed in across TWO runs (restart on the same
  *    checkpoint) against a codebook trained on the FIRST chunk only
  *    yield EXACTLY the assignments of one batch pass of the full corpus
  *    against the same codebook (the train/add contract), and search
  *    results over the extended index equal the batch index's;
  *  - a crash-replayed batch OVERWRITES its own (cluster, batch)
  *    partitions (dynamic partition overwrite) — index size unchanged,
  *    no duplicates, other batches intact;
  *  - probe-time partition pruning still reaches the scan of the grown
  *    index.
  */
class AnnStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  test("streamed IVF extension ≡ batch assignment; search parity; replay-safe") {
    val dir = tmp("ann_vecs")
    val ckpt = tmp("ann_ck")
    val idx = tmp("ann_idx")

    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("ev"))
      .localCheckpoint(true)

    // train on the seed chunk only; the stream only ever ADDS
    val seed = emb.filter($"vec_id" % 3 === 0)
    val cents = IvfAnn.build(seed, nCentroids = 8).centroids
    val centsArr = cents.sortBy(_._1).map(_._2.toArray)

    // run 1: two chunks; run 2 (RESTART, same checkpoint): the third
    Seq(0, 1).foreach { m =>
      emb.filter($"vec_id" % 3 === m)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    AnnStream.run(spark, dir, ckpt, idx, cents).awaitTermination()
    emb.filter($"vec_id" % 3 === 2)
      .coalesce(1).write.mode("append").parquet(dir)
    AnnStream.run(spark, dir, ckpt, idx, cents).awaitTermination()

    val extended = AnnStream.readExtended(spark, idx, cents)

    // exact assignment parity with one batch pass on the same codebook
    val got = extended.assigned.select($"vec_id", $"cluster")
      .as[(Long, Int)].collect().toMap
    val batchAssigned = IvfAnn.assign(emb, centsArr)
    val want = batchAssigned.select($"vec_id", $"cluster")
      .as[(Long, Int)].collect().toMap
    assert(got.size == emb.count(), "extended index must hold every vector")
    assert(got == want, "incremental assignment diverged from batch")

    // search parity: extended index ≡ in-memory batch index
    val queries = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("qid"), $"ev".as("qv")).localCheckpoint(true)
    def results(i: IvfAnn.Index) =
      IvfAnn.searchJoin(i, queries, nProbe = 3, k = 5)
        .select($"qid", $"rn", $"vec_id", $"cos")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(results(extended) ==
      results(IvfAnn.Index(batchAssigned, cents)),
      "search over the extended index diverged from the batch index")

    // crash replay of the second run's batch: identical rows, dynamic
    // overwrite ⇒ size unchanged, other batches untouched
    val before = spark.read.parquet(idx).count()
    IvfAnn.assign(emb.filter($"vec_id" % 3 === 2), centsArr)
      .withColumn("batch", lit(1L))
      .write.partitionBy("cluster", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(idx)
    assert(spark.read.parquet(idx).count() == before,
      "replayed batch must overwrite its partitions, not append")
    assert(results(AnnStream.readExtended(spark, idx, cents)) ==
      results(IvfAnn.Index(batchAssigned, cents)),
      "replay changed search results")

    // probe-time partition pruning reaches the grown index's scan
    val qv = emb.filter($"vec_id" === 0).head().getSeq[Double](1)
    val plan = IvfAnn.search(extended, qv, nProbe = 3, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"probe over extended index does not prune partitions:\n$plan")
  }
}
