package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the scalable replacement for
  * `Window.orderBy(x)` with no partitionBy, which Spark executes as ONE
  * partition holding every row (the WindowExec warning; a dead end at
  * 100 TB for high-cardinality order columns).
  *
  * Two-phase shape (the classic scan): range-repartition by the order
  * column, cumulative-sum WITHIN each partition (parallel windows), then
  * add each partition's exclusive offset — a |partitions|-row frame
  * aggregated once and joined back broadcast. Total: one range shuffle +
  * one tiny broadcast, no single-partition stage anywhere.
  *
  * Contract: order-column values must be UNIQUE (the caller's frame is
  * typically a value-frequency table, one row per distinct value) —
  * RangePartitioner may split EQUAL keys across partition boundaries,
  * which would make "rows before mine" ambiguous. Uniqueness makes the
  * global order total and the result deterministic at any partition
  * count (spec-pinned: 1 partition ≡ 8 partitions ≡ the single-window
  * form).
  */
object PrefixSum {

  /** Adds `out` = Σ valueCol over all rows with orderCol strictly BELOW
    * this row's (exclusive prefix sum in `orderCol` order). */
  def exclusivePrefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      out: String,
      numPartitions: Int = 32): DataFrame = {
    // internal scratch columns would silently clobber caller data of the
    // same name (withColumn overwrites) and then be dropped — refuse loudly
    val internal = Set("__pid", "__cum_in", "__offset")
    require(!df.columns.exists(internal),
      s"exclusivePrefixSum: input must not contain ${internal.mkString("/")} " +
        "(internal scratch columns)")
    val parted = df.repartitionByRange(numPartitions, col(orderCol))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumIn = parted
      .withColumn("__pid", spark_partition_id())
      .withColumn("__cum_in", coalesce(sum(col(valueCol)).over(w), lit(0L)))
    // per-partition totals → exclusive partition offsets (|partitions|
    // rows: the only unpartitioned window runs over that tiny frame)
    val offsets = cumIn.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__ptot"))
      .withColumn("__offset",
        coalesce(sum(col("__ptot")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    cumIn.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__cum_in") + col("__offset"))
      .drop("__pid", "__cum_in", "__offset")
  }
}
