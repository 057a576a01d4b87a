package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the library's custom Catalyst
  * expressions, so `spark.sql("SELECT dot_product(a, b) ...")` works
  * alongside the Column API. Two entry points share one builder table
  * (the function surface cannot drift between them):
  *
  *  - [[register]] — runtime registration on an existing session
  *    (what the harness uses; no submit-time wiring needed).
  *  - [[graft.GraftExtensions]] — the deployment-time injector for
  *    `--conf spark.sql.extensions=graft.GraftExtensions`, which makes
  *    every session in the cluster (thriftserver, notebooks, jobs)
  *    see the functions without code changes.
  */
object GraftFunctions {

  /** name → expression builder, one row per SQL function. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "minhash_signature" -> (exprs => {
      // Accept any foldable integral literal (4, 64L, CAST(64 AS
      // INT), ...); anything else is a clear analysis-time error,
      // not a ClassCastException at eval.
      val nSeeds = exprs(1) match {
        case e if e.foldable => e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_signature: nSeeds must be an integral literal, got $other")
        }
        case e => throw new IllegalArgumentException(
          s"minhash_signature: nSeeds must be foldable, got ${e.sql}")
      }
      MinHashSignature(exprs(0), nSeeds)
    }),
    "simhash64" -> (exprs => SimHash64(exprs(0))),
    // sign_lsh_bucket(embedding, table, planes, dims) — the three
    // config args must be integral literals (they define the
    // deterministic hyperplane family, not per-row data)
    "sign_lsh_bucket" -> (exprs => SignLshBucket(exprs(0),
      intLit(exprs(1), "sign_lsh_bucket", "table"),
      intLit(exprs(2), "sign_lsh_bucket", "planes"),
      intLit(exprs(3), "sign_lsh_bucket", "dims")))
  )

  /** Foldable integral argument → Int, with an analysis-time error
    * naming the function and parameter (shared by minhash_signature's
    * inline variant and sign_lsh_bucket).
    */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case x if x.foldable => x.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integral literal, got $other")
    }
    case x => throw new IllegalArgumentException(
      s"$fn: $arg must be foldable, got ${x.sql}")
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
