package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the most recent right row with
  * `rightTime <= leftTime`, matched on equal `on` keys (SURVEY.md §2.6 J7
  * "as-of ≈ union+window").
  *
  * Implementation is the union + carry-forward-window form, NOT a range
  * cross join: both sides union into one keyed stream sorted by
  * (time, side), and `last(_, ignoreNulls)` carries the right side's values
  * forward onto left rows. Cost = one shuffle on the keys + one sort —
  * O(n log n) per key group, skew-safe under AQE, works at any scale where
  * a range nested-loop join would explode.
  *
  * Ties: a right row at exactly leftTime IS matched (right sorts before left
  * at equal time); among right rows with identical time the last in
  * (time, tiebreak-free) order wins — pass distinct times for full
  * determinism.
  */
object AsOfJoin {

  /** @param on        equi-join key columns (both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightVals right columns to carry onto left rows (renamed as-is)
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The carry-forward last(_, ignoreNulls) must only ever see right-side
    // values in the carried columns; a rightVals name that also exists on the
    // left would make left rows "match" themselves.
    require(rightVals.forall(c => !leftCols.contains(c)),
      s"rightVals ${rightVals.filter(leftCols.contains).mkString(", ")} collide " +
        "with left columns; rename the right value columns before joining")
    // the union carries two internal working columns; an input column with
    // either name would be silently overwritten by withColumn
    Seq("_t", "_side").foreach { c =>
      require(!leftCols.contains(c) && !right.columns.contains(c),
        s"column name '$c' is reserved by AsOfJoin; rename it before joining")
    }
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val r0 = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
    // align schemas: left keeps its columns + null right-vals; right keeps
    // keys + right-vals + null left-only columns
    val rightOnly = rightVals
    val lAligned = rightOnly.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val rAligned = leftCols.filterNot(c => on.contains(c))
      .foldLeft(r0.select((on ++ rightVals ++ Seq("_t", "_side")).map(col): _*))(
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.select((leftCols ++ rightOnly ++ Seq("_t", "_side")).map(col): _*)
      .unionByName(rAligned.select((leftCols ++ rightOnly ++ Seq("_t", "_side")).map(col): _*))

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned)((df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w)))

    carried.filter(col("_side") === 1)
      .select((leftCols.map(col) ++ rightVals.map(c => col(s"asof_$c"))): _*)
  }
}
