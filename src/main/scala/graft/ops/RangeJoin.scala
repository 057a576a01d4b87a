package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi-key — the classic operator
  * Spark's built-in join strategies don't cover: `point BETWEEN start
  * AND end` with no equality column degrades to
  * BroadcastNestedLoopJoin (O(n·m) comparisons, and only if one side
  * fits in memory) or an outright CartesianProduct.
  *
  * Strategy here: overlap bucketing. Pick a bucket width W on the
  * range dimension; each interval is exploded to the buckets it
  * covers (ceil(len/W) rows, ~1-2 for W near the median interval
  * length) and each point computes its single containing bucket. The
  * join becomes a plain hash equi-join on the bucket id, followed by
  * the residual range predicate. A point lies in exactly one bucket,
  * so no post-join dedup is needed.
  *
  * 100 TB shape: one shuffle on the bucket key instead of a nested
  * loop; replication factor is bounded by interval length / W (pick W
  * ≈ median length, cap pathological intervals upstream); temporal
  * hot spots (many points in one bucket) are ordinary shuffle-join
  * skew, which AQE's skew-split handles because this IS a plain
  * sort-merge/hash join after the rewrite. The same rewrite is what
  * Databricks' range-join hints and the interval-join in Flink do
  * under the hood (public technique; see also q56's watermarked
  * stream-stream interval join for the streaming twin with an
  * equi-key).
  */
object RangeJoin {

  /** Joins `points` to every interval of `intervals` containing them:
    * keeps rows where `start <= point < end` (end-exclusive).
    *
    * `start`/`end`/`point` are LONG columns on one shared axis (epoch
    * ms, epoch days — any integer domain, full long range); `bucket`
    * is the bucket width W in the same unit. Empty/inverted intervals
    * (end <= start) match nothing and are dropped up front — also
    * guards `sequence()`, which would otherwise happily generate a
    * DESCENDING bucket range for an inverted interval. An interval
    * covering more than `maxBucketsPerInterval` buckets raises a
    * runtime error naming the limit (fail-fast beats an executor OOM
    * from one bad row, and beats silently dropping its matches).
    * Inputs must not already carry a `__bucket` column. One domain
    * bound: axis values within `bucket` of Long.MinValue would
    * overflow the floor computation — keep the axis above
    * Long.MinValue + bucket (every real epoch unit is).
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      start: Column, end: Column, point: Column, bucket: Long,
      maxBucketsPerInterval: Long = 1 << 20): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    // the bucket id is wired through a temp column; a caller column of
    // the same name would be silently overwritten by withColumn and
    // corrupt the join — fail at plan time instead
    for (df <- Seq(intervals, points) if df.columns.contains("__bucket"))
      throw new IllegalArgumentException(
        "pointInInterval: input already has a __bucket column; rename it first")
    val w = lit(bucket)
    // floorDiv semantics for potentially-negative axis values: SQL
    // `div` truncates toward zero, which would glue buckets -1 and 0
    // together; shift-free floor division keeps buckets uniform.
    // (c - pmod(c, w)) is an EXACT multiple of w, so the division's
    // true quotient is an integer; doing it in decimal keeps it exact
    // over the full long range (double `/` silently loses bits past
    // 2^53 — ns-epoch axes would bucket wrong).
    def floorDiv(c: Column): Column =
      ((c - pmod(c, w)).cast("decimal(38,0)") / w).cast("long")
    // one pathological interval (length >> W) would explode() into a
    // huge per-row array — sequence() throws near Int.MaxValue elements
    // and OOMs well before that. Fail fast with the offending span
    // instead of silently truncating matches (a correctness bug) or
    // letting the executor die. assert_true rides inside the sequence
    // bound so column pruning can never drop it.
    def guarded(fdEnd: Column, fdStart: Column): Column =
      fdEnd + coalesce(
        assert_true(fdEnd - fdStart < lit(maxBucketsPerInterval),
          concat(lit("pointInInterval: interval spans more than "),
            lit(maxBucketsPerInterval),
            lit(" buckets; raise the bucket width or maxBucketsPerInterval"))
        ).cast("long"),
        lit(0L))
    val iv = intervals
      .filter(end > start)
      .withColumn("__bucket",
        explode(sequence(floorDiv(start), guarded(floorDiv(end - lit(1L)), floorDiv(start)))))
    val pt = points.withColumn("__bucket", floorDiv(point))
    iv.join(pt, "__bucket")
      .filter(point >= start && point < end)
      .drop("__bucket")
  }

  /** Declared q84: the bucketed range join as a driver-verified query.
    * Intervals are high-quantity lineitems (`l_quantity = 50`) open
    * for a content-derived 1-20 day window after ship date; points are
    * pending orders (`o_orderstatus = 'P'`) on their order date. No
    * shared key exists between the two sides — the naive plan is a
    * nested loop — yet the bucketed rewrite answers with one hash
    * join. The oracle is the plain theta join, so the hash-green row
    * proves the rewrite is exactly the nested-loop semantics.
    *
    * W = 16 days ≈ the 10.5-day mean interval: ~1.7 bucket rows per
    * interval.
    */
  def q84RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val dayMs = 86400000L
    // parquet NTZ timestamps + a UTC session: the cast to TIMESTAMP is
    // a pure relabel, and unix_millis then matches DuckDB's epoch_ms
    // over the same naive values
    def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))
    val iv = graft.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") === 50)
      .select(col("l_orderkey"), col("l_linenumber"),
        epochMs(col("l_shipdate")).as("s_ms"),
        (epochMs(col("l_shipdate"))
          + (pmod(col("l_suppkey"), lit(20L)) + lit(1L)) * lit(dayMs)).as("e_ms"))
    val pt = graft.Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey"), epochMs(col("o_orderdate")).as("p_ms"))
    pointInInterval(iv, pt, col("s_ms"), col("e_ms"), col("p_ms"),
        bucket = 16 * dayMs)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"),
        col("p_ms"))
      .orderBy("l_orderkey", "l_linenumber", "o_orderkey")
  }
}
