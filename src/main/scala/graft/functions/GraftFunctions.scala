package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the library's custom Catalyst
  * expressions, so `spark.sql("SELECT dot_product(a, b) ...")` works
  * alongside the Column API. Runtime registration on any session —
  * no spark-submit `--conf spark.sql.extensions` wiring needed in
  * the harness (a `SparkSessionExtensions` injector would be the
  * deployment-time equivalent).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => {
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
      }, "built-in")
    registry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
  }
}
