package graft.ext

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DedupClustersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("multi-hop chain resolves to one component; singletons stay put") {
    // chain 1-2-3 (diameter 2, needs >1 propagation round), pair 5-6,
    // isolated 9
    val verts = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (6L, 5L)).toDF("a", "b")
    val comps = DedupClusters.components(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("foreign edge endpoints neither appear in output nor bridge components") {
    // 0 is absent from vertices: the 1-0 and 0-5 edges must be ignored —
    // not merge {1,2} with {5,6}, not emit a row for 0, and not let the
    // foreign min id 0 win any canonical election
    val verts = Seq(1L, 2L, 5L, 6L).toDF("id")
    val edges = Seq((1L, 2L), (5L, 6L), (1L, 0L), (0L, 5L)).toDF("a", "b")
    val comps = DedupClusters.components(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("non-convergence within maxIter fails loudly, never silently wrong") {
    val n = 12L
    val verts = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      DedupClusters.components(verts, edges, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("long path converges within the diameter bound") {
    val n = 12L
    val verts = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val comps = DedupClusters.components(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(comps.values.toSet == Set(1L))
  }

  test("pointer jumping converges a deep chain in logarithmic rounds") {
    // a 64-vertex path has diameter 63: plain propagation needs ~63 rounds,
    // pointer jumping must finish within ~log2 + slack
    val n = 64L
    val verts = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val comps = DedupClusters.components(verts, edges, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(comps.values.toSet == Set(1L))
    assert(comps.size == 64)
  }

  test("collapsed minhash clusters equal the full-corpus composition exactly") {
    import org.apache.spark.sql.functions._
    // real docs + planted exact clones at shifted ids: the collapsed
    // composition (components over representatives, clones inherit) must
    // equal running the full pipeline over every doc -- same ids, same
    // min-id component labels
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 150).select($"doc_id", $"text")
    val cloned = base.union(
      base.select(($"doc_id" + 10000).as("doc_id"), $"text"))

    val full = {
      val pairs = MinHashDedup.candidatePairs(cloned, 32, 8)
        .filter($"est_jaccard" >= 0.5).select($"a", $"b")
      val verts = cloned.withColumn("toks", split($"text", " "))
        .filter(size($"toks") >= 3).select($"doc_id".as("id"))
      DedupClusters.components(verts, pairs)
        .select($"id".as("doc_id"), $"comp")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val collapsed = DedupClusters.minhashClustersCollapsed(cloned)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collapsed == full,
      s"collapsed-only: ${collapsed -- full}; full-only: ${full -- collapsed}")
    // and every planted clone landed in its original's component
    val byId = collapsed.toMap
    base.collect().map(_.getLong(0)).foreach { id =>
      assert(byId(id + 10000) == byId(id), s"clone of $id split off")
    }
  }
}
