package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical table loaders over the harness parquet testdata
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md).
  *
  * Design notes for scale (100 TB target):
  *  - Plain `spark.read.parquet` — vectorized columnar scan; column
  *    pruning and predicate pushdown happen automatically because every
  *    operator in this library stays declarative (no RDDs, no collect).
  *  - No `inferSchema`-style passes: parquet footers carry the schema.
  *  - `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark
  *    does not map to a native type; we read it as a long (ns) via
  *    `spark.sql.legacy.parquet.nanosAsLong` and truncate to µs with
  *    integer arithmetic (`DIV 1000`, never double division — ns epoch
  *    values exceed 2^53). This matches DuckDB's ns→µs truncation, so
  *    oracle comparisons agree bit-for-bit.
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

  /** Events with canonical µs `ts` (TimestampType), plus `ts_ms` for
    * window arithmetic. See note above on TIMESTAMP(NANOS).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withColumn("ts_ms", unix_millis(col("ts")))
  }
}
