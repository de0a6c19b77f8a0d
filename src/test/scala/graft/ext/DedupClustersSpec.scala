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
}
