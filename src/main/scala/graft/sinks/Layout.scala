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

  /** Morton (Z-order) value of two non-negative 32-bit keys: interleaves
    * their bits (a in even positions, b in odd) into one long whose
    * ordering clusters rows that are close in BOTH dimensions. Sorting
    * at rest by this value gives row groups whose min/max envelopes are
    * tight in a AND b simultaneously, so a conjunctive range predicate
    * skips row groups that a single-column sort can only skip in its one
    * sorted dimension — the standard lakehouse multi-dimensional
    * clustering technique, here as a pure codegen'd column expression
    * (five mask-shift spreading steps per operand, no UDF). DuckDB
    * reproduces it with the same shift/mask arithmetic, so z-values are
    * oracle-derivable (`x_zorder_value`).
    *
    * Caller contract: both keys must fit in 31 bits (the first mask
    * keeps bits 0..30; higher bits are discarded rather than throwing,
    * matching the scale contract of hash-derived keys elsewhere). The
    * 31-bit bound keeps every z-value non-negative, so plain signed
    * BIGINT ordering — Spark and DuckDB alike — is the Z-order.
    *
    * Skew caveat (standard Morton behavior, spec-pinned both ways): the
    * interleave is per-BIT, so both dimensions tighten only when the two
    * keys have comparable bit widths; a 4-bit × 17-bit pair degrades
    * toward a single-dimension sort on the wide key until the split tree
    * is deep enough to reach the narrow key's bits. When widths are
    * skewed, range-bucket the wide key first (e.g. `value / width`) or
    * interleave ranks, as lakehouse OPTIMIZE ZORDER implementations do.
    */
  def zValue(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    // spread the 31 bits of x across the even bit positions of a long:
    // classic mask-shift ladder (public-domain bit-twiddling identity)
    def spread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val m0 = x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
      val m1 = m0.bitwiseOR(shiftleft(m0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x3333333333333333L))
      m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write `df` Z-order-clustered at rest: range-partition + sort by
    * `zValue(a, b)` so both file min/max envelopes and parquet row-group
    * statistics are tight in both dimensions. Readers need no special
    * path — parquet row-group skipping on the pushed-down per-column
    * predicates does the pruning (measured: `r10_zorder` probe). */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    val z = zValue(col(a), col(b)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

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
