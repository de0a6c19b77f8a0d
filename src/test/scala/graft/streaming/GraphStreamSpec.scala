package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The streaming-graph-maintenance claims, demonstrated:
  *  - edges streamed in across batches (including a RESTART on the same
  *    checkpoint) re-converge to EXACTLY the ranks a cold batch
  *    pageRankConverged(tol=0) computes over the full accumulated edge
  *    set — warm start changes only the iteration count, never a unit;
  *  - the warm path takes FEWER iterations than cold on a small
  *    perturbation (the r13_pagerank_warm result, streaming form);
  *  - a crash-replayed batch is bit-idempotent: re-processing the same
  *    batch id leaves the edge store without duplicates and the epoch's
  *    ranks identical (dynamic partition overwrite + seed-from-below).
  */
class GraphStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  // hub-shaped graph (the GraphsSpec warm-start family): reaches an EXACT
  // integer fixed point, which is what makes cold ≡ warm a bit-equality
  // obligation — k-out-regular graphs without the hub can limit-cycle at
  // the unit level (GraphStream scaladoc caveat, measured)
  private def baseEdges(n: Long) =
    spark.range(n).select($"id".as("src"),
      explode(array(($"id" * 7 + 1) % n, ($"id" * 13 + 5) % n, lit(0L)))
        .as("dst"))

  private def edgeChunk(n: Long, seed: Int, m: Long) =
    spark.range(n)
      .select($"id".as("src"),
        pmod(xxhash64($"id", lit(seed)), lit(m)).as("dst"))

  test("streamed warm re-convergence ≡ cold fixed point; restart-safe") {
    val dir = tmp("gs_edges"); val ckpt = tmp("gs_ck"); val store = tmp("gs_store")
    val n = 1500L
    // batch 1: the base graph; batch 2 (restart, same checkpoint): a ~2%
    // edge arrival
    baseEdges(n).coalesce(1).write.mode("append").parquet(dir)
    GraphStream.run(spark, dir, ckpt, store).awaitTermination()
    edgeChunk(30, 3, n).coalesce(1).write.mode("append").parquet(dir)
    GraphStream.run(spark, dir, ckpt, store).awaitTermination()

    val streamed = GraphStream.latestRanks(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // cold batch reference over the SAME accumulated edges
    val edges = spark.read.parquet(s"$store/edges").select($"src", $"dst")
    val nodes = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
    val (cold, coldIters) = graft.ext.Graphs.pageRankConverged(
      nodes, edges, maxIters = 100, tolPerNode = 0L)
    assert(coldIters < 100, "reference run did not reach the exact fixed point")
    val want = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.size == want.size)
    assert(streamed == want, "streamed warm fixed point diverged from cold")

    // the warm epoch re-converged in fewer iterations than cold
    val (warmIters, warmStatus) = GraphStream.processBatch(
      spark, edgeChunk(30, 4, n), 2L, store)
    assert(warmStatus == graft.ext.Graphs.StatusFixedPoint)
    assert(warmIters < coldIters,
      s"warm=$warmIters cold=$coldIters — warm start bought nothing")
  }

  test("replaying a batch is bit-idempotent (edges and ranks)") {
    val store = tmp("gs_replay")
    val n = 800L
    GraphStream.processBatch(spark, edgeChunk(n, 1, n), 0L, store)
    GraphStream.processBatch(spark, edgeChunk(40, 2, n), 1L, store)
    def edgeCount = spark.read.parquet(s"$store/edges").count()
    def ranks1 = spark.read.parquet(s"$store/ranks")
      .filter($"epoch" === 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (ec, r1) = (edgeCount, ranks1)
    // crash-replay batch 1: same id, same data
    GraphStream.processBatch(spark, edgeChunk(40, 2, n), 1L, store)
    assert(edgeCount == ec, "replayed batch duplicated edges")
    assert(ranks1 == r1, "replayed batch changed the epoch's ranks")

    // compaction preserves the edge MULTISET and later epochs converge
    // identically off the compacted store
    def edgeBag = spark.read.parquet(s"$store/edges")
      .groupBy($"src", $"dst").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val bagBefore = edgeBag
    GraphStream.compactEdges(spark, store)
    assert(edgeBag == bagBefore, "compaction changed the edge multiset")
    val parts = new java.io.File(s"$store/edges").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(parts.length == 1, s"compaction left partitions: $parts")
    val (itersAfter, _) = GraphStream.processBatch(
      spark, edgeChunk(10, 3, n), 2L, store)
    assert(itersAfter > 0)
  }
}
