package graft.ids

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed id minting + dictionary encoding
  * (SURVEY.md §2.9 I1–I3) — replaces the reference's serial atom counter /
  * DB sequences / file-lock machinery (src/db_loader.clj:32,67-84,359-368),
  * which it explicitly could not make work on a cluster.
  *
  * Ids are `base + row_number` over a total order on a *low-cardinality* key
  * (file path — files per batch, not rows), so the single-partition window is
  * bounded and the result is unique, dense and stable under repartitioning.
  * Where only uniqueness matters, callers can use
  * `monotonically_increasing_id()` instead (documented trade-off: sparse).
  */
object IdMinter {

  /** Mint dense ids ordered by `orderCols` starting at `base + 1`.
    * Deterministic: same input rows → same ids, regardless of partitioning.
    */
  def mintIds(df: DataFrame, base: Long, idCol: String, orderCols: Column*): DataFrame =
    df.withColumn(idCol,
      lit(base) + row_number().over(Window.orderBy(orderCols: _*)))

  /** Dictionary-encode a name column (reference problem_data map, I2):
    * returns a (name, id) dimension where previously-seen names keep their
    * ids (from `existing`) and new names extend densely past the max.
    */
  def dictionaryEncode(
      names: DataFrame,
      nameCol: String,
      idCol: String,
      existing: Option[DataFrame] = None): DataFrame = {
    val distinctNames = names.select(col(nameCol)).distinct()
    existing match {
      case None =>
        mintIds(distinctNames, 0L, idCol, col(nameCol))
      case Some(dim) =>
        val maxId = dim.agg(max(col(idCol))).head() match {
          case r if r.isNullAt(0) => 0L
          case r                  => r.getLong(0)
        }
        val newNames = distinctNames.join(dim.select(col(nameCol)), Seq(nameCol), "left_anti")
        dim.select(col(nameCol), col(idCol))
          .unionByName(mintIds(newNames, maxId, idCol, col(nameCol)))
    }
  }
}
