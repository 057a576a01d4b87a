package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.8, #23–#28): string / json /
  * date / array / math / hash. All built-ins ⇒ whole-stage codegen;
  * no UDFs anywhere on these paths.
  */
object Scalars {

  /** #23 String normalization — the reference's SKU cleanup
    * `REPLACE(LOWER(x),' ','_')` (shopping_events_exploded.sql:22)
    * plus split/join round-trip (my_dbt_flow.py:321-333).
    */
  def q23StringNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      regexp_replace(lower(col("p_name")), " ", "_").as("sku"),
      concat_ws("|", split(col("p_name"), " ")).as("joined"),
      upper(col("p_brand")).as("brand_uc"))
      .orderBy("p_partkey")

  /** #24 JSON path extraction + cast (`VARIANT:path::TYPE`,
    * shopping_events_exploded.sql:20-24): NULL on missing key, NULL-
    * safe cast — matches Snowflake semantics by construction.
    */
  def q24JsonExtractCast(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      // try_cast, not cast: Spark 4 defaults to ANSI mode, where a
      // plain cast THROWS on a non-numeric extracted value — the
      // documented Snowflake ::INT contract is NULL on junk
      get_json_object(col("props"), "$.k").try_cast("int").as("k_val"),
      get_json_object(col("props"), "$.missing").as("missing_val"))
      .orderBy("event_id")

  /** #112 Schema-full VARIANT projection (SURVEY §1.3) — the typed
    * counterpart of q24's per-path extraction: ONE `from_json` in
    * PERMISSIVE mode parses the payload against the reference's full
    * declared event-payload schema (upload_to_snowflake.py:141-148:
    * event_type/hashed_url/product_action/product_sku/
    * server_timestamp_epoch_ms/session_id — here the harness
    * fixture's `k` plus those envelope fields), then struct-field
    * projection fans the fields out. Fields absent from a given
    * payload read as NULL (coalesced into the declared sentinel
    * values — the oracle-parity rule); a payload that is not valid
    * JSON lands verbatim in the corrupt-record column instead of
    * failing the query — the schema-on-read contract that matters at
    * 100 TB, where some fraction of an append-only log is ALWAYS
    * malformed and a throwing parser would kill the whole scan.
    * Parse-once-project-many beats q24's one-call-per-path shape when
    * many fields are read: the JSON text is tokenized once per row.
    */
  def q112JsonSchemaProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k INT, session_id STRING, product_action STRING, " +
              "product_sku STRING, server_timestamp_epoch_ms BIGINT, " +
              "_corrupt STRING"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("p"))
      .select(col("event_id"),
        coalesce(col("p.k"), lit(-1)).as("k_val"),
        coalesce(col("p.session_id"), lit("")).as("session_id"),
        coalesce(col("p.product_action"), lit("")).as("product_action"),
        coalesce(col("p.server_timestamp_epoch_ms"), lit(-1L)).as("payload_ts_ms"),
        coalesce(col("p._corrupt"), lit("")).as("corrupt_rec"))
      .orderBy("event_id")

  /** #25 Epoch-ms ↔ date/timestamp conversions + formatted string +
    * date comparison (upload_to_snowflake.py:168-169,
    * my_dbt_flow.py:116-118).
    */
  def q25DateEpochFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      to_date(col("ts")).as("event_date"),
      date_format(col("ts"), "yyyy-MM-dd").as("date_str"),
      // NTZ literal: tz-free, unlike Timestamp.valueOf (JVM-default-tz)
      (col("ts") > lit(java.time.LocalDateTime.parse("2024-01-15T00:00:00"))).as("is_late"),
      col("ts_ms").as("epoch_ms"))
      .orderBy("event_id")

  /** Left-pad `a` with `padVal` to exactly `n` elements, keeping the
    * LAST n when longer — Keras `pad_sequences(maxlen=n)` semantics
    * (my_dbt_flow.py:337). Pure built-ins ⇒ codegen-friendly.
    */
  def padTo(a: org.apache.spark.sql.Column, n: Int,
      padVal: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      array_repeat(padVal, greatest(lit(0), lit(n) - size(a))),
      slice(a, greatest(lit(1), size(a) - lit(n) + lit(1)), lit(n)))

  /** Ordered collect — the values of `value` per group, sorted by
    * (sort, value): THE determinism-critical idiom behind every
    * ordered ARRAY_AGG in this library (struct array_sort is
    * field-order lexicographic, so the pair sort pins the
    * cross-engine tie order). ONE definition; a copy that drifted its
    * tie-break would silently break oracle ordering parity for just
    * its query.
    */
  def orderedCollect(sort: Column, value: Column, valueName: String): Column =
    transform(array_sort(collect_list(struct(sort, value))),
      x => x.getField(valueName))

  /** #26 Array functions over per-group ordered collections: size,
    * all-but-last slice, last element, fixed-length left pad
    * (my_dbt_flow.py:243,272-275,335-340).
    */
  def q26ArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
      .groupBy("user_id", "event_date")
      .agg(orderedCollect(col("ts"), col("event_id"), "event_id").as("a"))
      .select(
        col("user_id"), col("event_date"),
        size(col("a")).as("n"),
        concat_ws("|", transform(
          slice(col("a"), lit(1), size(col("a")) - lit(1)),
          x => x.cast("string"))).as("all_but_last"),
        element_at(col("a"), -1).as("last_el"),
        concat_ws("|", transform(
          padTo(col("a"), 20, lit(0L)),
          x => x.cast("string"))).as("padded"))
      .orderBy("user_id", "event_date")

  /** #27 Summary stats (RecList basic_stats, my_reclist.py:6-16).
    * avg/std are derived from EXACT scaled-integer sums with a fixed
    * double expression tree, so both engines produce bit-identical
    * doubles (no streaming-variance order dependence).
    */
  def q27MathStats(spark: SparkSession, dir: String): DataFrame = {
    val c = Relational.cents(col("l_quantity"))
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("cnt"),
        sum(c).as("qs"),
        sum(c * c).as("qsq"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .select(
        col("l_returnflag"), col("cnt"),
        (col("qs").cast("double") / lit(100.0)).as("sum_qty"),
        (col("qs").cast("double") / lit(100.0) / col("cnt")).as("avg_qty"),
        sqrt((col("qsq").cast("double") / lit(10000.0) -
          (col("qs").cast("double") / lit(100.0)) * (col("qs").cast("double") / lit(100.0)) / col("cnt"))
          / (col("cnt") - lit(1))).as("std_qty"),
        col("min_qty"), col("max_qty"))
      .orderBy("l_returnflag")
  }

  /** Declared q72: per-user 3σ anomaly flags over the event value —
    * the statistical data-quality gate a pipeline runs before
    * training (spike/corruption detection per entity). Two passes,
    * both partial-agg: per-user (count, Σc, Σc²) in exact cents longs
    * (q27's determinism rule — no float summation order anywhere),
    * then a join back flags events with |c − mean| > 3·std. At
    * harness scale AQE broadcasts the per-user stats; at 100 TB both
    * sides share the user_id hash partitioning. Σc² of cents fits a
    * long to ~10⁹ same-user events of 10⁵ cents (ANSI would throw,
    * not wrap, beyond).
    */
  def q72AnomalyFlags(spark: SparkSession, dir: String, sigmas: Double = 3.0,
      minEvents: Long = 5L): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        Relational.cents(col("value")).as("c"))
    val st = e.groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), sum("c").as("s"), sum(col("c") * col("c")).as("sq"))
      .filter(col("cnt") >= minEvents)
    val mean = col("s").cast("double") / col("cnt")
    val std = sqrt((col("sq").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("cnt")) /
      (col("cnt") - lit(1)))
    e.join(st, "user_id")
      .withColumn("mean", mean).withColumn("std", std)
      .filter(col("std") > 0 &&
        abs(col("c").cast("double") - col("mean")) > lit(sigmas) * col("std"))
      .select(col("user_id"), col("event_id"), col("c").as("value_cents"),
        round((col("c").cast("double") - col("mean")) / col("std"), 6).as("z"))
      .orderBy("user_id", "event_id")
  }

  /** Exact interpolated quantiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`: sort + linear interpolation). The exact
    * form is the oracle-able twin; at 100 TB use
    * `approx_percentile` (GK sketch, fixed memory) — the spec asserts
    * the sketch lands within tolerance of these exact values.
    */
  def q53Quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"))
      .orderBy("l_returnflag")

  /** Correlation / covariance derived from EXACT scaled-integer sums
    * (same trick as q27): both engines evaluate one identical double
    * expression over identical integers — bit-deterministic, unlike
    * the engines' own streaming corr/covar implementations.
    */
  def q54CorrCovar(spark: SparkSession, dir: String): DataFrame = {
    val x = Relational.cents(col("l_quantity"))
    val y = Relational.cents(col("l_extendedprice"))
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x.cast("decimal(38,0)") * y.cast("decimal(38,0)")).as("sxy_d"),
        sum(y.cast("decimal(38,0)") * y.cast("decimal(38,0)")).as("syy_d"))
      .select(
        col("l_returnflag"),
        col("n"),
        // x and y are each cents-scaled (×100), so the covariance of
        // the scaled pair is 100*100 = 1e4 times the true covariance:
        // divide by 1e4 exactly ONCE.
        round((col("n") * col("sxy_d").cast("double") - col("sx").cast("double") * col("sy").cast("double"))
          / col("n") / (col("n") - lit(1.0)) / lit(10000.0), 4).as("covar_samp"),
        round((col("n") * col("sxy_d").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")) *
            (col("n") * col("syy_d").cast("double") - col("sy").cast("double") * col("sy").cast("double"))), 6).as("corr"))
      .orderBy("l_returnflag")
  }

  /** #28 Deterministic ids & content hashes (dataset ids are already
    * SHA-256, upload_to_snowflake.py:141-148). uuid()/now() exist but
    * are nondeterministic — the declared query uses sha2 + concat
    * stamps only.
    */
  def q28UuidHashGen(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      sha2(col("text"), 256).as("content_sha"),
      concat(col("source"), lit("-"), col("doc_id")).as("stamp"))
      .orderBy("doc_id")
}
