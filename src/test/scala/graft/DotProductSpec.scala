package graft

import graft.ops.LlmOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd DotProduct expression must be BITWISE identical to
  * the higher-order-function fold it replaces (same products, same
  * summation order) — that identity is what keeps the DuckDB oracle
  * valid for the cosine family.
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sfTiny

  test("codegen == HOF bitwise on the real embeddings (incl. norms)") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("eb")))
      .filter(col("a_id") < col("b_id")).limit(5000)
    val cmp = pairs.select(
      LlmOps.dotProduct(col("ea"), col("eb")).as("cg"),
      LlmOps.dotProductHof(col("ea"), col("eb")).as("hof"))
    // exact comparison — no tolerance
    assert(cmp.filter(col("cg") =!= col("hof")).count() === 0)
    assert(cmp.filter(col("cg").isNull).count() === 0)
  }

  test("null and length-mismatch semantics match zip_with+aggregate") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)), // 11.0
      (2, Seq(1.0f), Seq(1.0f, 2.0f)) // length mismatch -> null
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      LlmOps.dotProduct(col("a"), col("b")).as("cg"),
      LlmOps.dotProductHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { row =>
      assert(row.isNullAt(1) === row.isNullAt(2), s"row $row")
      if (!row.isNullAt(1)) assert(row.getDouble(1) === row.getDouble(2))
    }
    assert(rows.find(_.getInt(0) == 1).get.getDouble(1) === 11.0)
    assert(rows.find(_.getInt(0) == 2).get.isNullAt(1))
  }

  test("double arrays work too") {
    val df = Seq((Seq(1.5, 2.5), Seq(2.0, 4.0))).toDF("a", "b")
    assert(df.select(LlmOps.dotProduct(col("a"), col("b"))).collect()(0).getDouble(0) === 13.0)
  }

  test("SQL surface: dot_product and minhash_signature registered") {
    graft.functions.GraftFunctions.register(spark)
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("t_dp")
    assert(spark.sql("SELECT dot_product(a, b) AS d FROM t_dp").collect()(0).getDouble(0) === 11.0)
    val sig = spark.sql("SELECT minhash_signature(array(1L, 2L, 3L), 8) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length === 8)
    // signature of a superset is elementwise <= (min over more values)
    val sig2 = spark.sql("SELECT minhash_signature(array(1L, 2L, 3L, 4L), 8) AS s")
      .collect()(0).getSeq[Long](0)
    sig.zip(sig2).foreach { case (a, b) => assert(b <= a) }
    // simhash64: SQL form equals the Column API, lenient literal too
    val viaSql = spark.sql("SELECT simhash64(array(1L, 2L, 3L)) AS f").collect()(0).getLong(0)
    val viaCol = Seq(Seq(1L, 2L, 3L)).toDF("hs")
      .select(graft.functions.SimHash64.simhash(col("hs"))).collect()(0).getLong(0)
    assert(viaSql === viaCol)
    // minhash_signature accepts a BIGINT literal (foldable integral)
    assert(spark.sql("SELECT minhash_signature(array(1L), 8L) AS s")
      .collect()(0).getSeq[Long](0).length === 8)
  }

  test("SQL surface hardening: null elements skipped; bad config args fail at analysis") {
    graft.functions.GraftFunctions.register(spark)
    // null slots are ABSENT tokens: signature/fingerprint equal the
    // null-free input, never a silent vote for hash 0
    val a = spark.sql("SELECT minhash_signature(array(1L, CAST(NULL AS BIGINT), 3L), 8) AS s")
      .collect()(0).getSeq[Long](0)
    val b = spark.sql("SELECT minhash_signature(array(1L, 3L), 8) AS s")
      .collect()(0).getSeq[Long](0)
    assert(a === b)
    val f1 = spark.sql("SELECT simhash64(array(5L, CAST(NULL AS BIGINT))) AS f")
      .collect()(0).getLong(0)
    val f2 = spark.sql("SELECT simhash64(array(5L)) AS f").collect()(0).getLong(0)
    assert(f1 === f2)
    // config-literal bounds are clear construction-time errors, not
    // silent truncation (4294967296L.toInt == 0) or a runtime
    // NegativeArraySizeException from generated code
    def fails(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage != null)
    }
    fails("SELECT minhash_signature(array(1L), 4294967296)")
    fails("SELECT minhash_signature(array(1L), -1)")
    fails("SELECT minhash_signature(array(1L), 0)")
    fails("SELECT sign_lsh_bucket(array(CAST(1.0 AS FLOAT)), 0, 70, 1)")
    fails("SELECT dot_product(array(CAST(1.0 AS FLOAT)))")
    // the Column API enforces the same plane cap
    intercept[IllegalArgumentException] {
      graft.functions.SignLshBucket(
        org.apache.spark.sql.catalyst.expressions.Literal(null), 0, 70, 8)
    }
  }
}
