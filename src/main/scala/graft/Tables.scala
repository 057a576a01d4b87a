package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical table loaders over the harness parquet testdata
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md).
  *
  * Design notes for scale (100 TB target):
  *  - Plain `spark.read.parquet` — vectorized columnar scan; column
  *    pruning and predicate pushdown happen automatically because every
  *    operator in this library stays declarative (no RDDs, no collect).
  *  - No `inferSchema`-style passes: parquet footers carry the schema.
  *  - `events.ts` has shipped in two on-disk shapes across harness
  *    rounds: parquet TIMESTAMP(NANOS) (no native Spark type — read as
  *    a long via `spark.sql.legacy.parquet.nanosAsLong` and truncated
  *    to µs with integer `DIV 1000`, never double division: ns epoch
  *    values exceed 2^53) and plain TIMESTAMP(MICROS) (isAdjustedToUTC
  *    = false, which Spark 4 surfaces as TIMESTAMP_NTZ). `canonicalTs`
  *    dispatches on the decoded dtype so both shapes land on the same
  *    µs-precision TimestampType; the session timezone is pinned to
  *    UTC by every entrypoint, making the NTZ→instant cast the
  *    identity on the underlying µs value. Either way this matches
  *    DuckDB's reading of the same file, so oracle comparisons agree
  *    bit-for-bit.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Canonical µs TimestampType from whichever shape `ts` decoded to
    * (see the header note): raw ns longs, TIMESTAMP_NTZ, or already a
    * timestamp.
    */
  def canonicalTs(dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.LongType =>
      timestamp_micros(expr("ts DIV 1000"))
    case _ =>
      col("ts").cast(org.apache.spark.sql.types.TimestampType)
  }

  /** Events with canonical µs `ts` (TimestampType), plus `ts_ms` for
    * window arithmetic. See note above on the two on-disk ts shapes.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw
      .withColumn("ts", canonicalTs(raw.schema("ts").dataType))
      .withColumn("ts_ms", unix_millis(col("ts")))
  }

  /** All testdata table names, in one place. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a session temp view — the SQL
    * entry surface (SURVEY §1.1: dbt `materialized: view` ↔
    * `createOrReplaceTempView`). After this, `spark.sql` queries run
    * verbatim over the same relations the DataFrame API reads;
    * `events` is registered through [[events]] so the canonical-µs
    * `ts` (not the raw ns long) is what SQL sees — identical to what
    * every DataFrame operator in this library reads. Idempotent;
    * views are unmaterialized (Catalyst inlines them exactly like dbt
    * view expansion). Tables whose parquet directory does not exist
    * under `dir` are skipped rather than thrown on: scale-probe
    * replicas materialize only the fact tables a query reads, and a
    * view registration for a table the query never touches must not
    * abort the whole SQL surface. An absent table's EXISTING temp
    * view (registered earlier for a different dir in this session)
    * is DROPPED, not left standing: a stale view silently serving the
    * other corpus's rows is worse than the loud
    * TABLE_OR_VIEW_NOT_FOUND a query over the missing table now gets.
    */
  def registerTempViews(spark: SparkSession, dir: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    names.foreach { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
      if (p.getFileSystem(hconf).exists(p)) {
        val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
        df.createOrReplaceTempView(n)
      } else {
        spark.catalog.dropTempView(n)
        ()
      }
    }
  }
}
