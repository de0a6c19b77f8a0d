package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("TarSource: tgz members extracted with names and content (S3)") {
    val dir = Files.createTempDirectory(Paths.get("target"), "tar")
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
    val tgz = dir.resolve("logs.tgz")
    val out = new TarArchiveOutputStream(new GzipCompressorOutputStream(
      Files.newOutputStream(tgz)))
    Seq("a.log" -> "alpha = 1\n;;;;\nSUCCESS at generation 2",
        "sub/b.log" -> "beta = 2").foreach { case (name, content) =>
      val e = new TarArchiveEntry(name)
      val bytes = content.getBytes("UTF-8")
      e.setSize(bytes.length)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
    }
    out.close()

    val members = TarSource.readMembers(spark, tgz.toString)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(members.keySet == Set("a.log", "sub/b.log"))
    assert(members("a.log").contains("SUCCESS at generation 2"))
    assert(members("sub/b.log") == "beta = 2")
  }

  test("ConfigStore: EDN round-trip with id counter and problem dict (S5)") {
    val f = Files.createTempFile(Paths.get("target"), "cfg", ".edn")
    val cfg = ConfigStore.EngineConfig(
      id = 41L, user = "etosch", dataDir = "/data",
      problemData = Map("binomial-3" -> 1L, "ant" -> 2L))
    ConfigStore.save(f, cfg)
    assert(ConfigStore.load(f) == cfg)
  }

  test("ConfigStore: missing file -> defaults") {
    assert(ConfigStore.load(Paths.get("target/definitely_missing.edn")) ==
      ConfigStore.EngineConfig())
  }

  test("JdbcSource: table + query reads with pushdown against Derby (S6)") {
    val url = "jdbc:derby:memory:srcdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE dim_users (userid BIGINT PRIMARY KEY, username VARCHAR(30))")
    conn.createStatement().execute(
      "INSERT INTO dim_users VALUES (1, 'etosch'), (2, 'lspector')")
    conn.close()
    val t = JdbcSource.table(spark, url, "dim_users")
    assert(t.count() == 2)
    // predicate pushdown path: filter travels into the JDBC scan
    assert(t.filter(t("username") === "etosch").count() == 1)
    val q = JdbcSource.query(spark, url,
      "SELECT userid FROM dim_users WHERE username LIKE 'l%'")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
