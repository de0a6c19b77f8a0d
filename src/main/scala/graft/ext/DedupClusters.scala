package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-component dedup clustering: given near-duplicate PAIRS (from
  * MinHash/SimHash banding, n-gram Jaccard, or content-hash equality),
  * resolve them into duplicate GROUPS with one canonical id per group — the
  * step a training-data pipeline actually needs ("keep one doc per cluster"),
  * since near-dup relations are not transitive-closed as emitted.
  *
  * Algorithm: iterative min-label propagation (the standard distributed
  * connected-components loop, cf. GraphX/Pregel CC). Each vertex starts
  * labeled with its own id; every iteration each vertex takes the min of its
  * own and its neighbors' labels; converges in O(component diameter)
  * iterations to the unique fixpoint (min is a semilattice, so the result is
  * order- and partitioning-independent — AQE/cluster-safe).
  *
  * Scale: each iteration is one equi-join + one aggregation — all shuffles
  * on the vertex id, so partitioning is stable across iterations and AQE
  * coalesces the tiny tail. `localCheckpoint` truncates the growing lineage
  * (the classic iterative-Spark trap). Near-dup graphs are sparse forests of
  * small clusters, so diameter — and the iteration count — stays small even
  * at 100 TB corpus scale.
  */
object DedupClusters {

  /** @param vertices one column `id`
    * @param edges    columns `a`, `b` — undirected (orientation ignored)
    * @return (id, comp) where comp = min id in the component
    */
  def components(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    // the contract is "(id, comp) over `vertices`": an edge endpoint absent
    // from `vertices` must neither appear in the output nor bridge two real
    // components — without this semi-join the propagation join injects
    // foreign `a` endpoints straight into the label table
    val vids = vertices.select(col("id"))
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .join(vids.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(vids.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
      .distinct().cache()
    var labels = vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint() // materialize + truncate lineage
      changed = next.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") < col("prev")).count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    // a silent non-converged return would split one real component into
    // several phantom "canonical" docs — fail loudly instead
    if (changed > 0) throw new IllegalStateException(
      s"components() did not converge within $maxIter iterations " +
        s"($changed labels still changing); raise maxIter above the " +
        "largest component diameter")
    labels
  }
}
