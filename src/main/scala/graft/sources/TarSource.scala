package graft.sources

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.BufferedInputStream

/** Tar/tgz archive source (SURVEY.md §2.1 S3): the reference's `.tgz` branch
  * intended extract-then-parse but shelled `tar czf` (compress) by mistake
  * (src/db_loader.clj:342-343, SURVEY.md §0) — this implements the intended
  * behavior: each archive member becomes one (archive, member, content) row.
  *
  * Spark-first shape: archives load via the `binaryFile` source (one task per
  * archive — parallelism across archives, like the per-file parse path), and
  * members are unpacked inside the task with commons-compress. No shell-outs,
  * no temp files.
  */
object TarSource {

  /** Read every member of every `.tar` / `.tgz` / `.tar.gz` matching `glob`
    * as (archive_path, member_name, content).
    */
  def readMembers(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val raw = new BufferedInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val in =
          if (path.endsWith(".tgz") || path.endsWith(".tar.gz"))
            new TarArchiveInputStream(new GzipCompressorInputStream(raw))
          else new TarArchiveInputStream(raw)
        Iterator.continually(in.getNextEntry)
          .takeWhile(_ != null)
          .filter(e => !e.isDirectory)
          .map { e =>
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            (path, e.getName, new String(out.toByteArray, "UTF-8"))
          }
          .toVector // materialize before the stream closes
      }
      .toDF("archive_path", "member_name", "content")
  }
}
