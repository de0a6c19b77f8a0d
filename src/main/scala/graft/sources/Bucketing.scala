package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for co-located fact-fact joins (SURVEY.md §2
  * scale design): writing both sides bucketed AND sorted by the join key
  * lets Spark plan the join with ZERO exchanges — each task reads matching
  * buckets from both tables where they sit. At 100 TB this turns the one
  * unavoidable fact-fact shuffle (orders ⋈ lineitem) into a shuffle-free
  * merge per bucket pair, paid once at write time and amortized over every
  * subsequent join.
  *
  * Bucket-count choice: enough that one bucket fits an executor's memory
  * for the sort-merge (corpus_bytes / buckets ≲ a few hundred MB), and the
  * SAME count on both sides — mismatched counts fall back to a shuffle on
  * one side.
  */
object Bucketing {

  /** Persist `df` as a parquet catalog table bucketed + sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketedSorted(df, table, key, Seq(key), buckets)

  /** As [[writeBucketed]] with an explicit sort order (e.g. events
    * bucketed by user_id, sorted by (user_id, ts): window/session scans
    * over (user_id, ts) then read rows already in event order per user —
    * with one file per bucket Spark also claims the ordering and drops
    * the in-memory sort). */
  def writeBucketedSorted(df: DataFrame, table: String, key: String,
      sortCols: Seq[String], buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
