package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production sink patterns for the 100 TB append-only log — the
  * operational half of the reference's load step (upload_to_snowflake
  * .py staged PUT + COPY INTO swap), re-expressed as Spark-native
  * idempotent writes. These are library surface (sinks are smoke-
  * verified like q02/q03; there is no row-level oracle for IO).
  */
object Sinks {

  /** Idempotent partition overwrite: re-running a batch replaces ONLY
    * the partitions the batch touches (dynamic partitionOverwriteMode),
    * leaving every other date directory intact. This is the Spark
    * analogue of the reference's replace-batch semantics — the
    * latest-ETL swap — and the property that makes retries safe at
    * scale: a failed/replayed day never duplicates rows and never
    * clobbers other days.
    *
    * The pre-write `repartition(partCol)` co-locates each partition
    * value so a day writes one file, not #tasks files; at 100 TB use
    * `repartition(n, partCol)` to bound file size per day instead.
    */
  def overwritePartitions(df: DataFrame, path: String, partCol: String): Unit =
    df.repartition(col(partCol))
      .write.mode("overwrite")
      // per-write option, not session conf: concurrent writers on the
      // same session keep their own overwrite semantics
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(path)

  /** Training-shard export: write exactly `nShards` files, rows
    * assigned to shards by a DETERMINISTIC key hash (stable across
    * runs, partitionings and task retries — the same rule as every
    * shuffle key in this library) and sorted within each shard by
    * `orderCols`. This is the hand-off a sequential training consumer
    * wants: reproducible shard membership for resumable epochs, local
    * ordering for curriculum/session contiguity, bounded shard count
    * for the data-loader fan-in. One range-free shuffle + in-partition
    * sort — no global ordering is paid for.
    */
  def exportShards(df: DataFrame, shardKey: String,
      orderCols: Seq[String], nShards: Int, path: String): Unit =
    // shard id is an EXPLICIT partition value (shard=K directories),
    // not a task index: a plain repartition(n, expr) re-hashes the
    // expression so shard→task is opaque and empty tasks silently
    // drop shards. The directory layout also gives readers shard
    // pruning. Sort keys start with the shard so a task holding
    // several shards still writes each directory's file in order.
    df.withColumn("__shard", pmod(xxhash64(col(shardKey)), lit(nShards.toLong)))
      .repartition(col("__shard"))
      .sortWithinPartitions(("__shard" +: orderCols).map(col): _*)
      .write.mode("overwrite").partitionBy("__shard").parquet(path)

  /** Small-file compaction: rewrite a partitioned dataset so each
    * partition directory holds ~`targetRowsPerFile` rows per file
    * (computed per partition from actual counts — a skewed hot date
    * gets more files, a sparse date gets one). The operational fix
    * for the #tasks×#partitions small-file explosion that kills
    * NameNode/listing performance at scale. Reads and rewrites once;
    * per-partition file counts derive from a counts aggregate that is
    * bounded by #distinct partition values.
    */
  def compact(spark: SparkSession, path: String, partCol: String,
      targetRowsPerFile: Long = 1000000L): Unit = {
    val df = spark.read.parquet(path)
    // localCheckpoint: the counts feed the broadcast join side AND the
    // pre-swap validation — pin them so the source is scanned once for
    // counts, not once per consumer (a whole extra pass at lake scale)
    val counts = df.groupBy(partCol).agg(count(lit(1)).as("cnt")).localCheckpoint()
    // files-per-partition as a column: ceil(cnt / target); the
    // repartition key (partValue, bucket) spreads each partition over
    // exactly its file budget. The bucket MUST be a deterministic
    // function of row content (never monotonically_increasing_id):
    // a partial map-stage retry re-evaluates it, and a value that
    // changes across attempts duplicates/drops rows in the rewrite.
    // Hash only hash-supported columns (maps are unhashable since
    // Spark 3 — same guard as Skew.rowSalt).
    val hashCols = df.schema.fields
      .filter(f => Skew.hashSupported(f.dataType)).map(f => col(f.name))
    // refuse rather than degrade: a constant bucket would collapse
    // every partition to ONE file — the size contract compact exists
    // to enforce. (Contrast Skew.rowSalt, where a degenerate constant
    // salt is still CORRECT; here the file layout IS the output.)
    require(hashCols.nonEmpty,
      "compact: no hash-supported columns to bucket rows by " +
        "(all-map schema?) — project a hashable key column first")
    val rowHash = xxhash64(hashCols.toIndexedSeq: _*)
    val withBudget = df.join(broadcast(counts), partCol)
      .withColumn("__files", ceil(col("cnt").cast("double") / lit(targetRowsPerFile.toDouble)).cast("int"))
      .withColumn("__bucket", pmod(rowHash, col("__files").cast("long")))
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    withBudget
      .repartition(col(partCol), col("__bucket"))
      .drop("cnt", "__files", "__bucket")
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    // Validate BEFORE the swap: the rewrite must carry every row (the
    // counts aggregate is the independent expectation). A bad rewrite
    // aborts here with the live directory untouched — the swap below
    // only ever installs a verified dataset.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    // coalesce: sum over zero partitions is NULL (empty dataset)
    val expected = counts.agg(coalesce(sum(col("cnt")), lit(0L))).first().getLong(0)
    val actual = spark.read.parquet(tmp).count()
    if (actual != expected) {
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      throw new java.io.IOException(
        s"compact: rewrite has $actual rows, expected $expected; aborted with $path untouched")
    }
    // two-step swap, old data parked until the verified rename lands —
    // never delete-then-hope; on object stores prefer writing a new
    // versioned prefix and flipping a pointer (manifest commit), since
    // renames there are copies and readers can observe the gap between
    // the two renames below
    val dst = new org.apache.hadoop.fs.Path(path)
    val trash = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_old")
    fs.delete(trash, true)
    if (!fs.rename(dst, trash))
      throw new java.io.IOException(s"compact: could not park $dst")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      fs.rename(trash, dst) // restore
      throw new java.io.IOException(s"compact: rename $tmp -> $dst failed; original restored")
    }
    fs.delete(trash, true)
  }
}
