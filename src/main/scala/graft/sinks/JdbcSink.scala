package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import java.sql.{Connection, DriverManager, PreparedStatement}

/** JDBC sink (SURVEY.md §2.2 K2–K4): transactional append, dead-letter split,
  * and idempotent upsert.
  *
  *  - K2 append: `df.write.jdbc` (one transaction batch per partition —
  *    the distributed analog of the reference's txn-per-file,
  *    src/db_loader.clj:255-258).
  *  - K3 dead-letter: the reference appends failing rows to `db.err` and
  *    continues (src/db_loader.clj:161-163,196-198). Distributed form:
  *    validate *before* the write and split into (valid, rejected+reason) —
  *    the rejects-DataFrame pattern — so the write path never throws per-row.
  *  - K4 upsert: the reference shells `mysqlimport --replace`
  *    (scripts/load_csv_to_cloud.sh:130). Spark's JDBC writer has no MERGE,
  *    so upsert is `foreachPartition` issuing dialect-specific
  *    INSERT … ON CONFLICT / MERGE statements, batched.
  */
object JdbcSink {

  /** Validation rule: name + predicate (true = valid). */
  final case class Rule(name: String, predicate: Column)

  /** Split `df` into (valid, rejected) by the conjunction of rules; rejected
    * rows carry a `reject_reason` column naming the first failed rule.
    */
  def deadLetterSplit(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val allValid = rules.map(_.predicate).reduce(_ && _)
    val reason = rules.foldRight(lit(null: String)) { (r, acc) =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name)).otherwise(acc)
    }
    val valid = df.filter(coalesce(allValid, lit(false)))
    val rejected = df.filter(!coalesce(allValid, lit(false)))
      .withColumn("reject_reason", reason)
    (valid, rejected)
  }

  /** Plain transactional append (K2). */
  def append(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)

  /** Idempotent upsert (K4): replace-by-key, the exact semantics of the
    * reference's `mysqlimport --replace`. Generic implementation is batched
    * DELETE-then-INSERT inside one transaction per partition — works on any
    * JDBC backend; pass `mysqlUpsertSql`/`postgresUpsertSql` output to
    * `upsertWithSql` for a single-statement dialect-native path.
    *
    * Input is deduplicated on `keyCols` first (last-wins is arbitrary, as
    * with --replace), so one batch never inserts the same key twice.
    */
  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      batchSize: Int = 500): Unit = {
    val deduped = df.dropDuplicates(keyCols)
    val cols = deduped.columns.toSeq
    val delSql = s"DELETE FROM $table WHERE " +
      keyCols.map(k => s"$k = ?").mkString(" AND ")
    val insSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    deduped.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(delSql)
          val ins = conn.prepareStatement(insSql)
          var n = 0
          rows.foreach { row =>
            bind(del, row, keyCols)
            del.addBatch()
            bind(ins, row, cols)
            ins.addBatch()
            n += 1
            if (n % batchSize == 0) { del.executeBatch(); ins.executeBatch() }
          }
          del.executeBatch(); ins.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  /** Dialect-native single-statement upsert (MySQL/PostgreSQL renderers
    * below), batched per partition in one transaction.
    */
  def upsertWithSql(df: DataFrame, url: String, sql: String,
      batchSize: Int = 500): Unit = {
    val cols = df.columns.toSeq
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { row =>
            bind(ps, row, cols)
            ps.addBatch()
            n += 1
            if (n % batchSize == 0) ps.executeBatch()
          }
          ps.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  /** MySQL dialect (the reference's target): INSERT … ON DUPLICATE KEY UPDATE. */
  def mysqlUpsertSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    val nonKeys = cols.filterNot(keys.contains)
    s"""INSERT INTO $table (${cols.mkString(", ")})
       |VALUES (${cols.map(_ => "?").mkString(", ")})
       |ON DUPLICATE KEY UPDATE ${nonKeys.map(c => s"$c = VALUES($c)").mkString(", ")}"""
      .stripMargin
  }

  /** PostgreSQL dialect: INSERT … ON CONFLICT DO UPDATE. */
  def postgresUpsertSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    val nonKeys = cols.filterNot(keys.contains)
    s"""INSERT INTO $table (${cols.mkString(", ")})
       |VALUES (${cols.map(_ => "?").mkString(", ")})
       |ON CONFLICT (${keys.mkString(", ")})
       |DO UPDATE SET ${nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")}"""
      .stripMargin
  }

  private def bind(ps: PreparedStatement, row: Row, cols: Seq[String]): Unit =
    cols.zipWithIndex.foreach { case (c, i) =>
      val v = row.get(row.fieldIndex(c))
      if (v == null) ps.setObject(i + 1, null) else ps.setObject(i + 1, v)
    }
}
