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
      exprs => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
  }
}
