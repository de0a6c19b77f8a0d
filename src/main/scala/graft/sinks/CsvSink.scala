package graft.sinks

import org.apache.spark.sql.DataFrame

/** CSV sink (SURVEY.md §2.2 K1/K5): header + append semantics of the
  * reference's per-table CSV buffers (src/db_loader.clj:87-93,260-267).
  *
  * The reference hand-bootstraps a header row on first write; Spark's CSV
  * source writes a header per part-file and reads it back with
  * `option("header")`, so the bootstrap disappears. `overwrite` replaces the
  * buffer — the `:clean` semantics (src/db_loader.clj:245-253).
  */
object CsvSink {

  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").option("header", "true").csv(dir)

  def overwrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)

  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(dir)
}
