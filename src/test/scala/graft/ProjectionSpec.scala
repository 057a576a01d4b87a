package graft

import graft.ops.Projection
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProjectionSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def bruteProject(vec: Array[Float], dPrime: Int): Array[Long] = {
    val scale = math.sqrt(dPrime.toDouble)
    Array.tabulate(dPrime) { j =>
      vec.indices.map { i =>
        BigDecimal(vec(i).toDouble * Projection.signOf(i, j) / scale * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
    }
  }

  test("q107 == per-element brute recomputation with the md5 sign matrix") {
    val vecs = Tables.embeddings(spark, SharedSpark.sfTiny)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val got = Projection.q107DimReduction(spark, SharedSpark.sfTiny)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    assert(got.keySet === vecs.keySet)
    for ((id, vec) <- vecs)
      assert(got(id).toSeq === bruteProject(vec, 16).toSeq, s"vec $id")
  }

  test("JL distance preservation: projected norms track original norms") {
    val vecs = Tables.embeddings(spark, SharedSpark.sfTiny)
      .select("embedding").as[Array[Float]].collect()
    val ratios = vecs.map { v =>
      val p = bruteProject(v, 16).map(_ / 1e6)
      val pn = p.map(x => x * x).sum
      val on = v.map(x => x.toDouble * x).sum
      pn / on
    }
    // Rademacher JL: E[ratio] = 1, per-vector std ≈ √(2/d′) ≈ 0.35.
    // Deterministic matrix + corpus → these observed bounds are stable.
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"outlier ratio: ${ratios.min} .. ${ratios.max}")
  }

  test("projected vectors serve cosine top-k with useful recall") {
    val emb = Tables.embeddings(spark, SharedSpark.sfTiny)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cosTop(k: Int, space: Map[Long, Array[Double]], q: Long): Seq[Long] = {
      val qv = space(q)
      val qn = math.sqrt(qv.map(x => x * x).sum)
      emb.map(_._1).filter(_ != q).map { id =>
        val v = space(id)
        val dot = qv.zip(v).map { case (a, b) => a * b }.sum
        id -> dot / (qn * math.sqrt(v.map(x => x * x).sum))
      }.sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSeq
    }
    val full = emb.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val queries = emb.map(_._1).sorted.take(10)
    def meanRecall(dPrime: Int): Double = {
      val proj = emb.map { case (id, v) =>
        id -> bruteProject(v, dPrime).map(_ / 1e6)
      }.toMap
      queries.map { q =>
        cosTop(10, full, q).toSet.intersect(cosTop(10, proj, q).toSet).size / 10.0
      }.sum / queries.length
    }
    // the synthetic embeddings are near-isotropic noise (pairwise
    // cosines ≈ 0) — the WORST case for rank preservation, so the
    // bar is "well above chance", not "high": chance recall@10 is
    // 10/499 ≈ 0.02; observed (deterministic) 0.11 at d′=16. And
    // fidelity must grow with d′ (observed 0.27 at 32).
    val r16 = meanRecall(16)
    val r32 = meanRecall(32)
    assert(r16 >= 0.08, s"recall@10 at d'=16: $r16 (chance ≈ 0.02)")
    assert(r32 > r16, s"recall did not improve with d': $r16 -> $r32")
  }
}
