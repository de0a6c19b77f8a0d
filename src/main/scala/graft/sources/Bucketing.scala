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
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
