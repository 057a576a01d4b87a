package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Reference semantics: the nested-loop theta join the bucketed
    * rewrite replaces.
    */
  private def naive(iv: org.apache.spark.sql.DataFrame,
      pt: org.apache.spark.sql.DataFrame) =
    iv.crossJoin(pt)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet

  test("bucketed rewrite == nested-loop theta join, incl. negative axis and bucket-spanning intervals") {
    // intervals deliberately straddle bucket boundaries (w=10) and the
    // zero line; inverted/empty intervals must match nothing
    val iv = Seq(
      (1L, -25L, 5L),   // spans buckets -3..0
      (2L, 0L, 10L),    // exactly one bucket
      (3L, 7L, 8L),     // sub-bucket
      (4L, 42L, 42L),   // empty (e == s)
      (5L, 50L, 40L),   // inverted
      (6L, 95L, 130L)   // spans 4 buckets
    ).toDF("iid", "s", "e")
    val pt = Seq((10L, -25L), (11L, -1L), (12L, 0L), (13L, 5L), (14L, 7L),
      (15L, 9L), (16L, 10L), (17L, 41L), (18L, 42L), (19L, 100L), (20L, 129L),
      (21L, 130L)).toDF("pid", "p")
    val got = RangeJoin.pointInInterval(iv, pt, col("s"), col("e"), col("p"), bucket = 10)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got === naive(iv, pt))
    // boundary spot checks: start inclusive, end exclusive
    assert(got.contains((1L, 10L)) && !got.contains((1L, 13L)))
    assert(got.contains((6L, 19L)) && !got.contains((6L, 21L)))
    // empty/inverted intervals produced nothing
    assert(!got.exists(x => x._1 == 4L || x._1 == 5L))
  }

  test("bucket width does not change the answer") {
    val iv = (0L until 40L).map(i => (i, i * 3 - 17, i * 3 + (i % 7))).toDF("iid", "s", "e")
    val pt = (0L until 200L).map(i => (i + 1000L, i - 30L)).toDF("pid", "p")
    val expected = naive(iv, pt)
    for (w <- Seq(1L, 2L, 5L, 64L))
      assert(RangeJoin.pointInInterval(iv, pt, col("s"), col("e"), col("p"), w)
        .select("iid", "pid").as[(Long, Long)].collect().toSet === expected, s"w=$w")
  }

  test("axis values beyond 2^53 bucket exactly (decimal floor-div, not double)") {
    // near Long.MaxValue a double mantissa is ~1024 off — the old
    // double-division floorDiv could put a point and its covering
    // interval in different buckets and silently drop the match
    val base = Long.MaxValue - 1000L
    val iv = Seq((1L, base, base + 50L), (2L, base + 100L, base + 107L))
      .toDF("iid", "s", "e")
    val pt = Seq((10L, base), (11L, base + 49L), (12L, base + 50L),
      (13L, base + 103L), (14L, base + 700L)).toDF("pid", "p")
    val got = RangeJoin.pointInInterval(iv, pt, col("s"), col("e"), col("p"), bucket = 7)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got === naive(iv, pt))
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 13L)))
  }

  test("interval spanning more than maxBucketsPerInterval fails fast, not OOM") {
    val iv = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    val pt = Seq((10L, 5L)).toDF("pid", "p")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(iv, pt, col("s"), col("e"), col("p"),
        bucket = 1, maxBucketsPerInterval = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("pointInInterval")), e.toString)
    // same interval passes once the cap covers it
    assert(RangeJoin.pointInInterval(iv, pt, col("s"), col("e"), col("p"),
      bucket = 100000, maxBucketsPerInterval = 100).count() === 1L)
  }

  test("pre-existing __bucket column is rejected, not silently overwritten") {
    val iv = Seq((1L, 0L, 10L, 99L)).toDF("iid", "s", "e", "__bucket")
    val pt = Seq((10L, 5L)).toDF("pid", "p")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(iv, pt, col("s"), col("e"), col("p"), bucket = 10)
    }
    assert(e.getMessage.contains("__bucket"))
  }

  test("q84 plans a hash/merge join — no cartesian, no nested loop") {
    val p = RangeJoin.q84RangeJoin(spark, SharedSpark.sfTiny)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
