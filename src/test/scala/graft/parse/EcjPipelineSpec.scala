package graft.parse

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class EcjPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("loadGenerations: groups keyed by Generation number, -1 for End of Run") {
    val dir = Files.createTempDirectory(Paths.get("target"), "ecj")
    Files.writeString(dir.resolve("out.stat"),
      """preamble to ignore
        |Generation: 0
        |Best Individual: Fitness: 0.82
        |Tree: (+ x
        |  (* x x))
        |Generation: 1
        |Best Individual: Fitness: 0.95
        |End of Run: found ideal individual""".stripMargin)
    val gens = EcjPipeline.loadGenerations(spark, dir.toString + "/*.stat")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        Option(r.getString(3))))
    assert(gens.forall(_._1 == 1L))
    assert(gens.exists { case (_, g, k, v) =>
      g == 0 && k == "Tree" && v.exists(_.contains("(+ x (* x x))")) })
    assert(gens.exists { case (_, g, k, _) => g == 1 && k == "BestIndividual" })
    assert(gens.exists { case (_, g, k, _) => g == -1 && k == "EndofRun" })
  }

  test("getOrCreate: existing dims stable, new names extend (J5)") {
    val existing = Seq(("etosch", 1L), ("lspector", 2L)).toDF("username", "userid")
    val incoming = Seq("lspector", "newuser").toDF("username")
    val dim = EcjPipeline.getOrCreate(existing, incoming, "username", "userid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dim("etosch") == 1L && dim("lspector") == 2L && dim("newuser") == 3L)
  }

  test("resolveProblems: LIKE-join on folder leaf (J3)") {
    val problems = Seq((1L, "binomial-3-regression"), (2L, "ant-trail"))
      .toDF("probid", "probname")
    val folders = Seq("binomial", "trail").toDF("folder_leaf")
    val out = EcjPipeline.resolveProblems(problems, folders)
      .select("folder_leaf", "probid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("binomial", 1L), ("trail", 2L)))
  }

  test("paramFileRows: key=value lines to EAV") {
    val f = Files.createTempFile(Paths.get("target"), "params", ".txt")
    Files.writeString(f, "pop.size = 500\nnot a param line\nseed=42\n")
    val rows = EcjPipeline.paramFileRows(spark, f.toString, 9L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((9L, "pop.size", "500"), (9L, "seed", "42")))
  }
}
