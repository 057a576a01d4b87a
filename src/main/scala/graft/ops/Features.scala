package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Sessionization + ML-adjacent feature operators (SURVEY.md §7
  * flagship and §2.9, #29–#31): the reference's feature pipeline
  * (my_dbt_flow.py get_dataset/train prep) kept fully distributed —
  * no fetch-all-to-driver, no python-side list slicing.
  */
object Features {

  /** Flagship (q00): gap-based sessionization of the append-only event
    * log — `nep_session_events` semantics (nep_session_events.sql:7-19)
    * recast onto `events` (no given session_id ⇒ user_id + 30-min gap,
    * FIXTURES.md). Spine: filter → lag gap-flag → running-sum session
    * index → ordered collect → size filter → total order.
    *
    * Scale: exactly one shuffle on user_id serves BOTH window passes
    * and the groupBy (same partitioning key); the collect is bounded by
    * session length, not table size. Skewed users would be the hazard
    * at 100 TB — AQE skew handling applies to the window shuffle; a
    * salting variant is not needed while sessions are per-user local.
    *
    * @param minSize   keep sessions with MORE than this many events
    *                  (ARRAY_SIZE > 2, my_dbt_flow.py:243)
    * @param gapMs     session gap (30 min)
    */
  def sessionize(events: DataFrame, minSize: Int = 2,
      gapMs: Long = 30L * 60 * 1000,
      eventTypes: Seq[String] = Seq("click", "view", "purchase")): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin(eventTypes: _*))
      .select("user_id", "event_id", "ts", "ts_ms")
      .withColumn("prev_ms", lag("ts_ms", 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_idx", sum("is_new").over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(
        min(col("ts")).as("session_start"),
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id")))),
          x => x.getField("event_id")).as("interactions"))
      .filter(size(col("interactions")) > minSize)
      .orderBy("user_id", "session_idx")
  }

  /** Declared q00: the sessionize operator with `interactions`
    * projected to a pipe-joined string. The driver's comparator sorts
    * rows by every column before hashing, and array-typed cells are
    * unsortable there — so declared outputs are scalar-only; the
    * array-returning operator stays the library surface.
    */
  def q00FlagshipSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir))
      .withColumn("interactions",
        concat_ws("|", transform(col("interactions"), x => x.cast("string"))))

  /** #29 Ordered 90/10 time split (my_dbt_flow.py:256-264) without the
    * reference's driver-side `len()`/list-slice: percent_rank over a
    * fully tie-broken time order. NOTE the global window is a single
    * partition — fine for the split decision itself; at 100 TB use the
    * two-phase variant: aggregate per-date counts (tiny), pick the
    * cutoff date + intra-date offset, broadcast it back as a filter.
    */
  def q29TimeSplit(spark: SparkSession, dir: String, frac: Double = 0.9): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("pr", percent_rank().over(
        Window.orderBy("o_orderdate", "o_orderkey")))
      .withColumn("split", when(col("pr") < frac, "train").otherwise("test"))
      .select("o_orderkey", "split")
      .orderBy("o_orderkey")

  /** #30 Vocabulary build + sequence encode (Keras Tokenizer
    * fit_on_texts/texts_to_sequences, my_dbt_flow.py:323-333). Keras
    * breaks frequency ties by insertion order, which is not
    * relational; we declare frequency-desc then token-asc (SURVEY §2
    * #30) and mirror that in the oracle. The vocab is tiny relative to
    * the corpus ⇒ broadcast join for the encode side; the id
    * assignment window runs on the already-aggregated vocab, not the
    * corpus.
    */
  def q30VocabIndex(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "token")
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("id", row_number().over(
        Window.orderBy(desc("freq"), asc("token"))))
      .select("token", "id")
    toks.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(concat_ws("|", transform(
        array_sort(collect_list(struct(col("pos"), col("id")))),
        x => x.getField("id").cast("string"))).as("ids"))
      .orderBy("doc_id")
  }

  /** #31 HR@k (my_reclist.py:18-26): share of rows whose label appears
    * in the top-k prediction list. The declared query builds a
    * deterministic synthetic prediction list (uuid-free) and reduces
    * to a single exact ratio.
    */
  def q31HitRateAtK(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        array((col("vec_id") % 10).cast("int"),
          ((col("vec_id") + 3) % 10).cast("int"),
          ((col("vec_id") + 7) % 10).cast("int")).as("preds"))
      .agg(
        count(lit(1)).as("n"),
        (sum(when(array_contains(col("preds"), col("label")), 1L).otherwise(0L)).cast("double")
          / count(lit(1))).as("hr_at_k"))

  /** UDAF exemplar (SURVEY §2.12 policy step 2): HR@k as a typed
    * `Aggregator` — proves the custom-aggregate path without putting a
    * non-codegen expression on any declared hot path.
    */
  class HitRateAtK(k: Int) extends Aggregator[(Seq[Int], Int), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Seq[Int], Int)): (Long, Long) =
      (b._1 + (if (a._1.take(k).contains(a._2)) 1L else 0L), b._2 + 1L)
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(b: (Long, Long)): Double = if (b._2 == 0) 0.0 else b._1.toDouble / b._2
    def bufferEncoder = Encoders.product[(Long, Long)]
    def outputEncoder = Encoders.scalaDouble
  }
}
