package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed (chunked-fallback) forms of the reference's order-sensitive
  * stream-reshaping operators (SURVEY.md §2.5 R1–R3) as reusable DataFrame
  * transforms.
  *
  * The preferred path for log files is per-file in-task parsing
  * (graft.parse.LogParser — zero shuffles); these window forms exist for
  * inputs that arrive as ordered ROWS (e.g. a single pathological multi-GB
  * file exploded to lines, or any keyed ordered stream). Cost model: one
  * shuffle on `part` + two window passes — `part` is the parallelism unit,
  * so a 100 TB input with many files/keys scales horizontally.
  */
object Segmenter {

  /** R1 `seq-split`: rows where `isDelim` are segment boundaries (dropped);
    * emits `segCol` numbering the non-delimiter runs within each `part`
    * ordered by `ord`. Mirrors reference src/db_loader.clj:54-63.
    */
  def delimiterSegments(df: DataFrame, part: Column, ord: Column,
      isDelim: Column, segCol: String = "seg"): DataFrame = {
    val w = Window.partitionBy(part).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(segCol, sum(isDelim.cast("int")).over(w))
      .filter(!isDelim)
  }

  /** R2 ECJ `read-gen`: a row where `isMarker` STARTS a new segment and is
    * kept as its head; rows before the first marker are dropped.
    * Mirrors reference src/parse_logs_ecj.clj:89-105.
    */
  def markerSegments(df: DataFrame, part: Column, ord: Column,
      isMarker: Column, segCol: String = "seg"): DataFrame = {
    val w = Window.partitionBy(part).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(segCol, sum(isMarker.cast("int")).over(w))
      .filter(col(segCol) > 0)
  }

  /** R3 ECJ `group-gen`: a row where `isContinuation` is appended
    * (`sep`-joined, in `ord` order) onto the nearest preceding
    * non-continuation row of `valueCol`. Returns one row per anchor with the
    * merged value. Mirrors reference src/parse_logs_ecj.clj:107-116.
    */
  def mergeContinuations(df: DataFrame, part: Column, ord: Column,
      isContinuation: Column, valueCol: Column, sep: String = " "): DataFrame = {
    val w = Window.partitionBy(part).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = df
      .withColumn("_anchor", sum((!isContinuation).cast("int")).over(w))
      .filter(col("_anchor") > 0) // leading continuations have no anchor
    grouped
      .groupBy(part.as("_part"), col("_anchor"))
      // collect_list order is not guaranteed post-shuffle: collect (ord, v)
      // structs and sort_array before joining.
      .agg(min(ord).as("_ord"),
        array_join(
          transform(
            sort_array(collect_list(struct(ord.as("o"), trim(valueCol).as("v")))),
            x => x.getField("v")),
          sep).as("merged"))
      .withColumnRenamed("_part", "part")
      .withColumnRenamed("_ord", "ord")
      .drop("_anchor")
  }
}
