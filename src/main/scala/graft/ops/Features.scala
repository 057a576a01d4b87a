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
        Scalars.orderedCollect(col("ts"), col("event_id"), "event_id")
          .as("interactions"))
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

  /** Ordered train/test split at scale (#29 and Pipeline stage 4→5,
    * my_dbt_flow.py:256-264).
    *
    * `percent_rank` over an unpartitioned window funnels every row
    * through ONE task — a scale-killer at 100 TB. Two-phase instead:
    *  1. per-time-key counts: one partial-agg pass whose output is
    *     bounded by #distinct keys (dates — thousands, not billions);
    *  2. prefix-sum offsets over those counts at the driver (a
    *     bounded-by-construction collect, like the IVF centroid
    *     fetch) broadcast back as a tiny join side;
    *  3. intra-key row_number over a PARTITIONED window + offset =
    *     exact global rank; pr = (rank-1)/(N-1) using percent_rank's
    *     own double expression, so the split is bit-identical to the
    *     single-window form.
    *
    * Precondition: (timeCol, tieCol) is unique and non-null, so
    * rank == row_number and the comparable sort is total.
    */
  /** Driver-side ordering that matches Spark's column sort order:
    * strings compare as UTF-8 binary (unsigned bytes — Java's
    * UTF-16 compareTo disagrees for supplementary characters vs
    * U+E000..U+FFFF), everything else by its natural Comparable.
    */
  private val sparkKeyOrdering: Ordering[Any] = {
    case (x: String, y: String) =>
      val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      var c = 0
      val n = math.min(xb.length, yb.length)
      while (i < n && c == 0) { c = (xb(i) & 0xFF) - (yb(i) & 0xFF); i += 1 }
      if (c != 0) c else xb.length - yb.length
    case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
  }

  /** Shared two-phase-rank machinery: prefix-sum offsets over bounded
    * per-key counts, as a broadcastable (key, gr_offset) frame. Keys
    * must be unique and non-null.
    */
  private def prefixOffsets(spark: SparkSession,
      keyField: org.apache.spark.sql.types.StructField,
      counts: Array[(Any, Long)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = counts.sortBy(_._1)(sparkKeyOrdering)
    var acc = 0L
    val rows: Seq[Row] = sorted.toIndexedSeq.map { case (k, c) =>
      val r = Row(k, acc); acc += c; r
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(keyField, StructField("gr_offset", LongType, nullable = false))))
  }

  /** Global fractional-rank split ordered by (timeCol, tieCol). Two
    * plans, same output:
    *
    *   - per-key path (≤ `maxDistinctKeys` distinct time values —
    *     the per-DATE use case): collect bounded per-key counts,
    *     broadcast prefix offsets, rank within key. The collect is
    *     GUARDED: `limit(maxDistinctKeys + 1)` bounds the driver
    *     transfer by construction, so a surprise high-cardinality
    *     time column (a raw timestamp instead of a date) can no
    *     longer OOM the driver — it falls through instead.
    *   - range-bucket path (everything else): [[globalRowNumber]]'s
    *     repartitionByRange form — per-PARTITION counts (bounded by
    *     #buckets however many distinct keys exist) + the same
    *     prefix-offset arithmetic. Identical output because both
    *     compute the same total order (timeCol, tieCol).
    *
    * Null `timeCol` rows are DROPPED on both paths (a null time has
    * no place in a time-ordered split — filter or impute upstream if
    * they must be kept), and both paths emit the input's column order
    * plus `split` — the two plans are output-identical by
    * construction, not merely on null-free inputs.
    */
  def twoPhaseTimeSplit(df: DataFrame, timeCol: String, tieCol: String,
      frac: Double = 0.9, maxDistinctKeys: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    // one explicit rule for both plans: the per-key path would drop
    // nulls anyway (inner join on timeCol), while repartitionByRange
    // would sort them FIRST and label them train — filter up front so
    // path choice can never change the result
    val src = df.filter(col(timeCol).isNotNull)
    // an input that already carries a split column is REPLACED by
    // withColumn below — exclude it here or the select would name the
    // column twice (ambiguous downstream, unwritable to parquet)
    val outCols = (df.columns.filterNot(_ == "split") :+ "split")
      .map(col).toIndexedSeq
    val perKey = src.groupBy(timeCol).agg(count(lit(1)).as("cnt"))
      .limit(maxDistinctKeys + 1).collect()
      .map(r => (r.get(0), r.getLong(1)))
    if (perKey.length > maxDistinctKeys) {
      val (ranked, n) = globalRowNumberWithTotal(src, "__gr_rn", 32,
        col(timeCol).asc, col(tieCol).asc)
      val pr =
        if (n > 1) (col("__gr_rn") - lit(1)).cast("double") / lit((n - 1).toDouble)
        else lit(0.0)
      return ranked
        .withColumn("split", when(pr < frac, "train").otherwise("test"))
        .select(outCols: _*)
    }
    val n = perKey.map(_._2).sum
    val offsetsDf = prefixOffsets(spark, df.schema(timeCol), perKey)
    val rn = col("gr_offset") +
      row_number().over(Window.partitionBy(timeCol).orderBy(tieCol))
    val pr = if (n > 1) (rn - lit(1)).cast("double") / lit((n - 1).toDouble)
             else lit(0.0)
    src.join(broadcast(offsetsDf), timeCol)
      .withColumn("split", when(pr < frac, "train").otherwise("test"))
      .select(outCols: _*)
  }

  /** #29 Ordered 90/10 time split without the reference's driver-side
    * `len()`/list-slice AND without a global single-partition window —
    * the two-phase per-date-counts + broadcast-offset form.
    */
  def q29TimeSplit(spark: SparkSession, dir: String, frac: Double = 0.9): DataFrame =
    twoPhaseTimeSplit(Tables.orders(spark, dir), "o_orderdate", "o_orderkey", frac)
      .select("o_orderkey", "split")
      .orderBy("o_orderkey")

  /** Global row_number over an arbitrary sort order WITHOUT a single
    * global window (the scale form of `row_number().over(Window
    * .orderBy(...))`, whose one-task sort dies at billions of rows):
    *  1. range-repartition by the sort key (contiguous, ordered,
    *     non-overlapping buckets) and pin the assignment with a
    *     localCheckpoint so the two downstream passes see identical
    *     partitions;
    *  2. per-bucket row counts → prefix-sum offsets at the driver
    *     (bounded: one row per bucket);
    *  3. per-bucket row_number over a PARTITIONED window + broadcast
    *     offset = the exact global rank.
    * Precondition: the sort key is unique (rank == row_number) and
    * non-null. At cluster scale replace localCheckpoint with a
    * reliable checkpoint so bucket contents survive executor loss.
    */
  def globalRowNumber(df: DataFrame, idCol: String, nBuckets: Int,
      sortExprs: Column*): DataFrame =
    globalRowNumberWithTotal(df, idCol, nBuckets, sortExprs: _*)._1

  /** [[globalRowNumber]] plus the TOTAL row count, which the
    * per-bucket counts already hold — callers that need both (the
    * [[twoPhaseTimeSplit]] fallback's fractional rank) read it here
    * instead of paying one more full scan for a number this pass
    * computed anyway.
    */
  def globalRowNumberWithTotal(df: DataFrame, idCol: String, nBuckets: Int,
      sortExprs: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(nBuckets, sortExprs: _*)
      .withColumn("gr_pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy("gr_pid").agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.get(0), r.getLong(1)))
    val offDf = prefixOffsets(spark,
      org.apache.spark.sql.types.StructField("gr_pid",
        org.apache.spark.sql.types.IntegerType, nullable = false), counts)
    val ranked = ranged.join(broadcast(offDf), "gr_pid")
      .withColumn(idCol, col("gr_offset") +
        row_number().over(Window.partitionBy("gr_pid").orderBy(sortExprs: _*)))
      .drop("gr_pid", "gr_offset")
    (ranked, counts.map(_._2).sum)
  }

  /** Row bound under which a fitted vocabulary is broadcast for its
    * encode/decode joins; above it the join is left un-hinted (plain
    * shuffle join unless Catalyst's own sizing still picks
    * broadcast). On the reference's SKU universe the vocab is bounded
    * by catalog size, but on an LLM corpus distinct-token count is
    * DATA-bound — an unconditional `broadcast()` hint is a hard
    * OOM/8 GB-limit failure past a few hundred million tokens, and
    * the hint overrides Catalyst's sizing, so the gate must be ours.
    * The default (16 M rows ≈ 1-2 GB hashed) is conservative for
    * typical executor memory; tune per cluster via the
    * `graft.vocab.broadcastMaxRows` session conf.
    */
  private[graft] def vocabBroadcastMaxRows(spark: SparkSession): Long =
    spark.conf.get("graft.vocab.broadcastMaxRows", (16L << 20).toString).toLong

  /** `vocab` hinted for its join: broadcast iff its COUNTED row count
    * is within [[vocabBroadcastMaxRows]]. The count is free at every
    * call site — [[globalRowNumberWithTotal]] already folded it from
    * the per-bucket counts the id assignment needs anyway.
    */
  private[graft] def sizeGatedBroadcast(vocab: DataFrame,
      nRows: Long): DataFrame =
    if (nRows <= vocabBroadcastMaxRows(vocab.sparkSession)) broadcast(vocab)
    else vocab

  /** #30 Vocabulary build + sequence encode (Keras Tokenizer
    * fit_on_texts/texts_to_sequences, my_dbt_flow.py:323-333). Keras
    * breaks frequency ties by insertion order, which is not
    * relational; we declare frequency-desc then token-asc (SURVEY §2
    * #30) and mirror that in the oracle. Id assignment is the
    * two-phase globalRowNumber — no single-partition window even when
    * the distinct-token set is web-corpus-sized. The encode join is
    * broadcast under the counted [[vocabBroadcastMaxRows]] gate, a
    * plain shuffle join above it.
    */
  def q30VocabIndex(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "token")
    val (vocabRanked, nVocab) = globalRowNumberWithTotal(
        toks.groupBy("token").agg(count(lit(1)).as("freq")),
        "id", 32, desc("freq"), asc("token"))
    val vocab = vocabRanked
      .select(col("token"), col("id").cast("int").as("id"))
    toks.join(sizeGatedBroadcast(vocab, nVocab), "token")
      .groupBy("doc_id")
      .agg(concat_ws("|", transform(
        Scalars.orderedCollect(col("pos"), col("id"), "id"),
        v => v.cast("string"))).as("ids"))
      .orderBy("doc_id")
  }

  /** #74 Train-split-only vocabulary + OOV token — the reference's
    * actual tokenizer workflow (my_dbt_flow.py:326-340): fit
    * `Tokenizer(oov_token='<UNK>')` on the TRAIN split only, then
    * encode EVERY document through that vocab, with tokens unseen at
    * fit time mapping to `<UNK>` = id 1 (known ids start at 2, 0
    * stays reserved for pad). The train membership gate is the q63
    * deterministic md5 rule (~90%), so the split is reproducible
    * across runs and engines. Encoding is a LEFT join + coalesce —
    * an inner join here would silently DROP unseen-token rows, the
    * one reference-semantics divergence round 3 left open.
    * Scale shape: vocab is fit via two-phase globalRowNumber (no
    * single-partition window) and broadcast for the encode.
    */
  def q74VocabOov(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .withColumn("is_train",
        substring(md5(col("doc_id").cast("string")), 1, 2) < lit("e6"))
      .select(col("doc_id"), col("is_train"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "token")
    val (vocab, nVocab) =
      graft.Pipeline.fitVocabSized(toks.filter(col("is_train")).select("token"))
    graft.Pipeline.encode(toks, vocab, vocabRows = Some(nVocab))
      .groupBy("doc_id", "is_train")
      .agg(concat_ws("|", transform(
        Scalars.orderedCollect(col("pos"), col("id"), "id"),
        v => v.cast("string"))).as("ids"))
      .select("doc_id", "is_train", "ids")
      .orderBy("doc_id")
  }

  /** #124 Vocab DECODE — the inverse of q30's index: the reference
    * serves predictions as token IDS and maps them back to SKUs
    * through the inverted vocabulary (`prediction_to_word = {v: k ...}`,
    * lstm_model.py:40); this declared query is that readout as a
    * relational op, closing the q30/q74 encode family's round trip.
    * Fit the q30 vocabulary, encode every document, then DECODE the
    * id stream back through the id→token inverse join and reassemble
    * the document — the oracle hash thereby gates encode ∘ decode =
    * identity over the whole corpus (the decoded text must equal the
    * tokenized original, token for token).
    *
    * Scale shape: both vocab hops ride the counted
    * [[vocabBroadcastMaxRows]] gate (the id→token side is the same
    * relation re-keyed — no new fit, no extra shuffle when broadcast;
    * above the bound each hop is a plain shuffle join); the
    * reassembly is the one doc_id-keyed ordered-collect exchange q30
    * already pays.
    */
  def q124VocabDecode(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "token")
    val (vocabRanked, nVocab) = globalRowNumberWithTotal(
        toks.groupBy("token").agg(count(lit(1)).as("freq")),
        "id", 32, desc("freq"), asc("token"))
    val vocab = vocabRanked
      .select(col("token"), col("id").cast("int").as("id"))
    val enc = toks.join(sizeGatedBroadcast(vocab, nVocab), "token")
      .select(col("doc_id"), col("pos"), col("id"))
    // the inverse join — lstm_model.py:40's id→word dictionary as a
    // size-gated relation (same bounded vocab, keyed the other way)
    enc
      .join(sizeGatedBroadcast(vocab.select(col("id"),
        col("token").as("decoded_token")), nVocab), "id")
      .groupBy("doc_id")
      .agg(concat_ws(" ", Scalars.orderedCollect(
        col("pos"), col("decoded_token"), "decoded_token")).as("decoded"))
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

  /** Declared q60: the reference's full tensor boundary, driver-
    * verified end to end — sessions built from the event log (q55's
    * synthetic session/sku mapping), then Pipeline.features: vocab
    * (frequency-desc, token-asc; two-phase rank), encode, x = the
    * all-but-last ids left-padded to 20 with 0 = pad, y = last id − 1
    * (the reference's label shift, my_dbt_flow.py:339-340). Exactly
    * the x/y tensors the LSTM consumes (my_dbt_flow.py:319-340),
    * with x stringified for the scalar-only driver compare.
    */
  def q60PipelineTensors(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Tables.events(spark, dir)
      .select(
        concat(col("user_id"), lit("-"), date_format(col("ts"), "yyyy-MM-dd")).as("session_id"),
        col("ts_ms"),
        concat(lit("sku_"), (col("event_id") % 100).cast("string")).as("sku"))
      .groupBy("session_id")
      .agg(Scalars.orderedCollect(col("ts_ms"), col("sku"), "sku")
        .as("interactions"))
      .filter(size(col("interactions")) > 2)
    graft.Pipeline.features(sessions, maxLen = 20)
      .select(col("session_id"),
        concat_ws("|", transform(col("x"), x => x.cast("string"))).as("x"),
        col("y"))
      .orderBy("session_id")
  }

  /** Declared q68: funnel conversion — per day, how many users VIEWED
    * and how many of those later PURCHASED (first purchase strictly
    * after first view, same day). The behavioral question the
    * reference's event log exists to answer, as two partial-agg
    * shuffles: conditional min per (day, user), then counts per day —
    * no join, no window, integer-only outputs. At 100 TB the
    * (day, user) aggregate is the only large shuffle and it combines
    * map-side.
    */
  def q68FunnelConversion(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_ms"))).as("v"),
        min(when(col("event_type") === "purchase", col("ts_ms"))).as("p"))
      .groupBy("day")
      .agg(
        count(col("v")).as("n_viewers"),
        sum(when(col("v").isNotNull && col("p").isNotNull && col("p") > col("v"), 1L)
          .otherwise(0L)).as("n_converted"))
      .orderBy("day")

  /** Declared q69: cohort retention — users grouped by their FIRST
    * active day (the cohort), counted distinct on each later offset
    * day. The (cohort × offset) matrix behind every retention curve.
    * Plan shape: one shuffle builds the per-user min-day aggregate;
    * at harness scale AQE broadcasts that (small) side back onto the
    * events scan, at corpus scale it exceeds the broadcast threshold
    * and the join runs sort-merge on the user_id partitioning both
    * sides already share. Then one partial-agg shuffle on (cohort,
    * offset). countDistinct is exact here; at 100 TB swap in
    * approx_count_distinct per q14 when ±2% is acceptable.
    */
  def q69RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = d.groupBy("user_id").agg(min("day").as("cohort_day"))
    d.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Declared q71: empirical next-event transition matrix — the
    * Markov baseline the reference's next-event LSTM must beat
    * (lstm_model.py predicts next SKU; this is the same conditional
    * distribution at the event_type level, computed relationally).
    * One user_id-partitioned window for `lead`, one partial-agg
    * shuffle on the tiny (type, next) key space, probabilities as a
    * type-partitioned window over ~|types|² rows. Counts stay integer;
    * the probability division is the only double op (identical
    * expression in the oracle).
    */
  def q71TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("event_type")), 6))
      .orderBy("event_type", "next_type")
  }

  /** #110 Deterministic negative sampling — the contrastive /
    * sampled-softmax training-pair prep every recsys (and retrieval
    * two-tower) trainer needs over exactly this kind of event log
    * (the reference trains an LSTM recommender on session item
    * sequences; its positives are the interactions, negatives are
    * drawn at training time — here the draw is made reproducible and
    * engine-exact instead of RNG-seeded): for every purchase event,
    * emit the positive item plus `k` negatives drawn uniformly from
    * the item universe by hashing (event_id, draw_index) — the q63/
    * q102 md5-gate rule, so the sample is a pure function of the data
    * (stable across runs, engines, partitionings and retries; no seed
    * to lose, no RNG state to checkpoint). A draw that collides with
    * the positive steps to the next item id (deterministic rejection,
    * one step suffices for a uniform universe).
    *
    * Scale shape: everything is map-side in-row arithmetic (JSON
    * extract, md5, base-16 fold, modulo) after one bounded 1-row agg
    * for the item universe; the k-way expansion is an in-row
    * posexplode; the only exchange is the declared output sort.
    * `conv(hex,16,10) == the oracle's strpos arithmetic` (the q102
    * pairing).
    */
  def q110NegativeSampling(spark: SparkSession, dir: String,
      k: Int = 4): DataFrame = {
    val ev = Tables.events(spark, dir)
    // try_cast, not cast: under ANSI mode a non-numeric $.k would
    // abort the whole query; junk JSON must read as NULL (the q24
    // rule; oracle mirrors with TRY_CAST)
    val itemOf = get_json_object(col("props"), "$.k").try_cast("int")
    val maxRow = ev.agg(max(itemOf)).head()
    val pos = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), itemOf.as("pos_item"))
    if (maxRow.isNullAt(0)) // empty corpus: no items to draw from
      return pos.withColumn("neg_idx", lit(0))
        .withColumn("neg_item", lit(0)).limit(0)
        .select("event_id", "user_id", "pos_item", "neg_idx", "neg_item")
    val n = maxRow.getInt(0).toLong + 1L
    val draw = pmod(conv(substring(md5(concat(
        col("event_id").cast("string"), lit("_"),
        col("neg_idx").cast("string"))), 1, 4), 16, 10).cast("long"), lit(n))
    pos
      .select(col("event_id"), col("user_id"), col("pos_item"),
        explode(sequence(lit(0), lit(k - 1))).as("neg_idx"))
      .withColumn("draw", draw)
      .withColumn("neg_item",
        when(col("draw") === col("pos_item"),
          pmod(col("draw") + 1, lit(n))).otherwise(col("draw")).cast("int"))
      .select("event_id", "user_id", "pos_item", "neg_idx", "neg_item")
      .orderBy("event_id", "neg_idx")
  }

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
