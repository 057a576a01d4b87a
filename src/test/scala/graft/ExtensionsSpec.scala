package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The deploy-time registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve the
  * library's SQL functions with NO runtime `register` call, and agree
  * with the Column API results.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects dot_product/simhash64/minhash_signature") {
    val base = SharedSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf read at SparkContext
      // creation, so it cannot be exercised over the suite's shared
      // context; `withExtensions` feeds the same injector through the
      // same extension-loading path minus the conf-string plumbing.
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate() // fresh session over the existing SparkContext
      assert(s2 ne base, "expected a new session, not the shared one")
      val d = s2.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      val sig = s2.sql(
        "SELECT minhash_signature(array(7L, 8L, 9L), 4) AS s")
        .head().getSeq[Long](0)
      assert(sig.size === 4)
      // same expression, same answer as the runtime-registered path
      val viaRegister = {
        graft.functions.GraftFunctions.register(base)
        base.sql("SELECT simhash64(array(7L, 8L, 9L)) AS h").head().getLong(0)
      }
      val viaExtensions =
        s2.sql("SELECT simhash64(array(7L, 8L, 9L)) AS h").head().getLong(0)
      assert(viaExtensions === viaRegister)
      // sign_lsh_bucket: SQL surface agrees with the Column API
      val sqlBucket = s2.sql(
        "SELECT sign_lsh_bucket(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 0, 4, 2) AS b")
        .head().getLong(0)
      import org.apache.spark.sql.functions.{col, lit}
      val apiBucket = s2.range(1)
        .select(graft.functions.SignLshBucket.bucketOf(
          org.apache.spark.sql.functions.array(
            lit(0.5f), lit(-1.5f)), 0, 4, 2).as("b"))
        .head().getLong(0)
      assert(sqlBucket === apiBucket)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
