package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout utilities for at-rest data (SURVEY.md "Partitioning &
  * shuffle"): bucketing for co-located joins, date/key partitioning for
  * partition pruning.
  *
  * At 100 TB the dominant cost of fact-fact joins is the shuffle; bucketing
  * both tables by the join key at write time moves that cost to ingest
  * (once), after which every join on the bucket key is exchange-free.
  * Partitioned directories turn time/category predicates into file listing,
  * not data reads.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table. Joins between two
    * tables bucketed on the same key with the same count run without any
    * Exchange (verified by LayoutSpec's plan assertion).
    */
  def writeBucketed(df: DataFrame, table: String, bucketKeys: Seq[String],
      nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` partitioned by directory keys (low-cardinality columns:
    * dates, categories). Readers with equality/range predicates on the
    * partition columns scan only matching directories.
    */
  def writePartitioned(df: DataFrame, path: String, partitionKeys: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .partitionBy(partitionKeys: _*)
      .parquet(path)

  /** True if the executed plan of `df` contains a SHUFFLE exchange
    * (broadcast exchanges don't count — they move the small side only).
    * Unwraps the AQE AdaptiveSparkPlanExec wrapper, whose `collect` exposes
    * no children. */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case e: ShuffleExchangeLike => e }.nonEmpty
  }
}
