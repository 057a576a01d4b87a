package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * A single-column range sort makes parquet files narrow in ONE
  * dimension — min/max footer stats then prune scans for predicates
  * on that column only; a predicate on any other column still touches
  * every file. Interleaving the bits of two rank-comparable keys and
  * range-partitioning on the interleaved value yields files that are
  * simultaneously narrow in BOTH dimensions (each file ≈ a square
  * cell of the key plane instead of a full-width stripe), so either
  * predicate skips most files. This is the standard lakehouse answer
  * to two-predicate workloads at 100 TB — pay one layout write, prune
  * every subsequent scan.
  *
  * Everything here is pure Column bit arithmetic (shift/and/or) —
  * whole-stage-codegen'd, no UDF, ANSI-safe (shifts cannot overflow).
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two
    * non-negative long columns (x gets even positions, y odd).
    * Callers must pre-scale inputs into [0, 2^bits) — see
    * [[scaleTo]]; higher bits are ignored by construction.
    */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Min-max scale a long column into [0, 2^bits) using bounds the
    * caller obtained (one bounded 2-value aggregate per column — same
    * eager-but-bounded pattern as the IVF centroids). Spark's `/` is
    * true division (double), so the quotient is floored back to long;
    * exact while (max-min+1)·2^bits stays under 2^53, far beyond any
    * real key domain at bits ≤ 16. At c == max the result is
    * (span-1)·2^bits/span < 2^bits, so the range bound holds without
    * clamping.
    */
  def scaleTo(c: Column, min: Long, max: Long, bits: Int): Column = {
    val span = math.max(1L, max - min + 1)
    floor(((c - lit(min)) * lit(1L << bits)) / lit(span)).cast("long")
  }

  /** Declared curve computation (q66): the z-value is pure,
    * engine-independent bit arithmetic, hash-matched against an
    * oracle built from the identical bit terms (SparkEntry generates
    * the SQL from the same (i, position) sequence). The layout
    * EFFECT — per-file min/max ranges and file skipping — is asserted
    * in LayoutSpec; it lives in filesystem metadata and is not
    * oracle-able.
    */
  def q66ZorderCurve(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        zValue(col("o_custkey"), col("o_orderkey"), 10).as("z"))
      .orderBy("z", "o_orderkey")

  /** Write `df` z-ordered on (xCol, yCol) into `nFiles` parquet files:
    * scale both keys by their observed bounds, range-partition on the
    * z-value (one shuffle, sampled bounds — distributed exactly like
    * a global sort), sort within partitions so row groups are tight,
    * drop the helper column at the writer. Returns the (min,max)
    * bounds used, so readers can recompute z for predicate rewriting.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
      path: String, nFiles: Int, bits: Int = 10): ((Long, Long), (Long, Long)) = {
    val bounds = df.agg(min(xCol), max(xCol), min(yCol), max(yCol)).head()
    require((0 until 4).forall(!bounds.isNullAt(_)),
      s"zorderWrite: empty input or all-NULL key column ($xCol/$yCol), " +
        s"no layout to write for $path")
    val Array(xMin, xMax, yMin, yMax) =
      bounds.toSeq.map(v => v.asInstanceOf[Number].longValue()).toArray
    val z = zValue(
      scaleTo(col(xCol), xMin, xMax, bits),
      scaleTo(col(yCol), yMin, yMax, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    ((xMin, xMax), (yMin, yMax))
  }

  /** #102 Deterministic training-shard assignment — the final
    * resharding step before an epoch run: every document gets a
    * shard in [0, nShards) and a stable 0-based position within its
    * shard, both pure functions of doc_id (md5-gate order — the
    * q63/q96 sampling convention), so any engine reproduces the exact
    * epoch order and a retried/reran job shuffles identically.
    * Training wants this global shuffle because raw corpora arrive
    * clustered (by crawl, domain, time); hash order decorrelates
    * adjacent examples without a seed to lose.
    *
    * Scale shape — NO per-shard global sort: the gate's first two hex
    * chars split each shard into 256 lexicographic ranges. One
    * map-side-partial count per (shard, bucket) (≤ nShards×256 rows,
    * the only driver traffic) turns into broadcast prefix offsets;
    * each doc then needs only a rank WITHIN its (shard, bucket) —
    * a window over ~1/256 of a shard — plus its bucket's offset.
    * Equivalent to `row_number() OVER (PARTITION BY shard ORDER BY
    * gate, doc_id)` (bucket order is a prefix of gate order), at a
    * bounded-window cost that survives shards of any size. The same
    * two-phase trick as q96's budget walk and q29/q30's
    * globalRowNumber.
    */
  def q102TrainingShards(spark: org.apache.spark.sql.SparkSession,
      dir: String, nShards: Int = 8): DataFrame =
    shardPositionsOf(
        graft.Tables.documents(spark, dir).select("doc_id"), nShards)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")

  /** Core of [[q102TrainingShards]] over ANY (doc_id, ...) relation —
    * exposed so the q125 corpus-pipeline composition assigns its
    * mixture-kept train docs through the ONE shard/rank definition
    * (same gate arithmetic, same bucketed two-phase rank — see the
    * q102 scaladoc for the scale argument). Extra input columns ride
    * through; output adds (gate, shard, pos).
    */
  private[graft] def shardPositionsOf(docs: DataFrame,
      nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val d = docs
      .withColumn("gate", substring(md5(col("doc_id").cast("string")), 1, 4))
      .withColumn("bucket", substring(col("gate"), 1, 2))
      // conv(hex,16,10) == the oracle's strpos arithmetic: both read
      // the two hex digits as one base-16 value in [0, 255]
      .withColumn("shard",
        pmod(conv(col("bucket"), 16, 10).cast("int"), lit(nShards)))
    val counts = d.groupBy("shard", "bucket").count()
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    val offsets = counts.groupBy(_._1._1).toSeq.flatMap { case (shard, xs) =>
      var acc = 0L
      xs.sortBy(_._1._2).map { case ((_, b), n) =>
        val o = (shard, b, acc); acc += n; o
      }
    }
    val offDf = broadcast(
      spark.createDataFrame(offsets).toDF("shard", "bucket", "offset"))
    d.join(offDf, Seq("shard", "bucket"))
      .withColumn("pos",
        col("offset") - 1 + row_number().over(
          Window.partitionBy("shard", "bucket").orderBy("gate", "doc_id")))
      .withColumn("pos", col("pos").cast("long"))
      .drop("bucket", "offset")
  }
}
