package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The at-rest bucketed edge layout must be a pure LAYOUT change:
  * PageRank over EdgeStore-served edges is bit-identical to PageRank over
  * the derived edge frame (ranks are integer fixed-point, so "identical"
  * means every (id, r) pair, not a tolerance). Also pins the loud-failure
  * contract for an unwritten layout and the src-bucketed scan shape.
  */
class EdgeStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def graph(n: Long) = {
    val nodes = spark.range(n).select($"id")
    val edges = spark.range(n)
      .select($"id".as("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select($"src", pmod(xxhash64($"src", $"j"), lit(n)).as("dst"))
    (nodes, edges)
  }

  test("bucketed at-rest edges reproduce derived PageRank bit-for-bit") {
    val (nodes, edges) = graph(2000)
    graft.SparkTestSession.dropManagedTable(EdgeStore.tableName("spec_pr"))
    EdgeStore.write(graft.ext.Graphs.prepareEdges(edges), "spec_pr")
    val derived = graft.ext.Graphs.pageRank(nodes, edges, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val atRest = graft.ext.Graphs.pageRankPrepared(nodes,
        EdgeStore.read(spark, "spec_pr"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atRest == derived)
  }

  test("the at-rest scan is bucketed by src (no edge-side exchange)") {
    val (nodes, _) = graph(2000)
    val ed = EdgeStore.read(spark, "spec_pr")
    // one power-iteration step: the edge side of the join must keep its
    // bucketed-scan partitioning — every ShuffleExchange in the plan sits
    // on the rank/aggregation side, none above the edge-table scan
    val step = graft.ext.Graphs.pageRankPrepared(nodes, ed, 1)
    step.collect()
    // the AQE final plan hides subtrees behind QueryStageExec nodes, so
    // pin the shape on the rendered plan text: the edge-table scan must
    // report Bucketed: true, and NO exchange may repartition by src (the
    // edge-side key) — the only exchanges allowed are on the rank (id)
    // and aggregation (nid) sides
    val txt = step.queryExecution.executedPlan.toString
    assert(txt.contains(EdgeStore.tableName("spec_pr")), txt)
    assert(txt.contains("Bucketed: true"), txt)
    assert(!txt.contains("Exchange hashpartitioning(src#"),
      s"edge side of the join was exchanged:\n$txt")
  }

  test("an unwritten layout fails loudly instead of re-deriving") {
    val e = intercept[IllegalArgumentException] {
      EdgeStore.read(spark, "never_written_layout")
    }
    assert(e.getMessage.contains("EdgeStore.write"))
  }
}
