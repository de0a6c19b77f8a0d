package graft

import graft.functions.{CosineSim, MinHashSignature, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use, so `spark.sql("SELECT cosine_sim(a, b) …")`
  * works next to the Column API.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<double>, array<double>) - cosine similarity"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(array<string>, k) - k-minima MinHash signature"),
      (args: Seq[Expression]) => args(1) match {
        case Literal(k: Int, _) => MinHashSignature(args(0), k)
        case other => throw new IllegalArgumentException(
          s"minhash_signature: k must be an integer literal, got $other")
      }))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash fingerprint"),
      (args: Seq[Expression]) => SimHash64(args(0))))
  }
}
