package graft

import graft.ops.Sketches
import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy hitters: the retention guarantee under real
  * pruning (capacity ≪ distinct tokens, forced merges across
  * partitions) and the exact-recount contract of q64.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sfTiny

  /** Zipf-ish corpus: token i appears ~N/i times, 400 distinct tokens
    * — far over the sketch capacity, so prune/merge paths really run.
    */
  private lazy val corpus: Seq[String] =
    (1 to 400).flatMap(i => Seq.fill(4000 / i)(f"tok$i%03d"))

  test("capacity-k summary retains every token with count > n/(k+1)") {
    val k = 10
    val n = corpus.size.toLong
    val exact = corpus.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val mustKeep = exact.collect { case (t, c) if c > n / (k + 1) => t }.toSet
    val mg = F.udaf(new Sketches.MisraGries(k), Encoders.STRING)
    // 8 partitions forces distributed partial summaries + merges
    val cand = corpus.toDF("token").repartition(8)
      .agg(mg(F.col("token"))).head().getSeq[String](0).toSet
    assert(cand.size <= k)
    assert(mustKeep.subsetOf(cand), s"dropped ${mustKeep -- cand}")
  }

  test("candidates + exact recount equals the true heavy-hitter set") {
    // capacity must put the guarantee line n/(k+1) BELOW the query
    // threshold: 5% needs k+1 > 20 — k=25 keeps everything ≥ n/20
    // while still pruning hard (400 distinct tokens)
    val k = 25
    val n = corpus.size.toLong
    val exact = corpus.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val want = exact.collect { case (t, c) if c * 20 >= n => (t, c) }.toMap
    val mg = F.udaf(new Sketches.MisraGries(k), Encoders.STRING)
    val toks = corpus.toDF("token").repartition(8)
    val cand = toks.agg(mg(F.col("token"))).head().getSeq[String](0)
    val got = toks.filter(F.col("token").isin(cand: _*))
      .groupBy("token").agg(F.count(F.lit(1)).as("cnt"))
      .filter(F.col("cnt") * 20 >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("q64 on the corpus equals a plain exact groupBy at the 0.5% bar") {
    val toks = Tables.documents(spark, sf)
      .select(F.explode(F.split(F.col("text"), " ")).as("token"))
    val n = toks.count()
    val want = toks.groupBy("token").agg(F.count(F.lit(1)).as("cnt"))
      .filter(F.col("cnt") * 200 >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sketches.q64HeavyHitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
