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
    "dot_product" -> (exprs => {
      arity("dot_product", exprs, 2)
      DotProduct(exprs(0), exprs(1))
    }),
    "minhash_signature" -> (exprs => {
      arity("minhash_signature", exprs, 2)
      MinHashSignature(exprs(0),
        intLit(exprs(1), "minhash_signature", "nSeeds", min = 1))
    }),
    "simhash64" -> (exprs => {
      arity("simhash64", exprs, 1)
      SimHash64(exprs(0))
    }),
    // sign_lsh_bucket(embedding, table, planes, dims) — the three
    // config args must be integral literals (they define the
    // deterministic hyperplane family, not per-row data)
    "sign_lsh_bucket" -> (exprs => {
      arity("sign_lsh_bucket", exprs, 4)
      SignLshBucket(exprs(0),
        intLit(exprs(1), "sign_lsh_bucket", "table", min = 0),
        // the bucket is a packed Long: one bit per plane, 64 max
        // (planes > 64 would shift-wrap and alias unrelated planes)
        intLit(exprs(2), "sign_lsh_bucket", "planes", min = 1, max = 64),
        intLit(exprs(3), "sign_lsh_bucket", "dims", min = 1))
    })
  )

  /** Wrong arity must read as the analysis-time message every other
    * SQL function produces, never an IndexOutOfBoundsException from
    * `exprs(n)` during resolution.
    */
  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$fn requires $n arguments, got ${exprs.length}")

  /** Foldable integral argument → Int, with an analysis-time error
    * naming the function and parameter. Bounds are enforced HERE:
    * a Long literal outside Int range must not silently truncate
    * (4294967296L.toInt == 0 would build a degenerate expression),
    * and negative/zero values would otherwise surface as
    * NegativeArraySizeException inside generated code at runtime.
    */
  private def intLit(e: Expression, fn: String, arg: String,
      min: Int, max: Int = Int.MaxValue): Int = {
    val v: Long = e match {
      case x if x.foldable => x.eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be an integral literal, got $other")
      }
      case x => throw new IllegalArgumentException(
        s"$fn: $arg must be foldable, got ${x.sql}")
    }
    if (v < min || v > max)
      throw new IllegalArgumentException(
        s"$fn: $arg must be in [$min, $max], got $v")
    v.toInt
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
