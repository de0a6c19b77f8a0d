package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC table reads (SURVEY.md §2.1 S6): the reference's live-DB SELECT
  * lookups (users/problems/locations dims, existence checks, max id —
  * src/parse_logs_ecj.clj:41-55, scripts/load_csv_to_cloud.sh:90-93).
  *
  * Catalyst pushes filters/column pruning into the generated SQL
  * (`pushDownPredicate` defaults on); `partitionColumn` bounds enable
  * parallel range reads for large tables — at scale, dimension reads stay
  * single-partition (they're small) and fact reads split across executors.
  */
object JdbcSource {

  def table(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** Pushdown-friendly query read: the WHERE evaluates in the database. */
  def query(spark: SparkSession, url: String, sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .load()

  /** Parallel range-partitioned read for large tables. */
  def partitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
