package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sparse lexical retrieval over the corpus — the BM25 ranking
  * function (Robertson & Spärck Jones probabilistic relevance
  * framework; the Okapi BM25 form with the standard k1/b length
  * normalization) plus the per-domain quota curation step (the C4 /
  * RefinedWeb practice of capping how many documents any one host may
  * contribute to a training corpus).
  *
  * Retrieval earns its place in a training-data engine twice over:
  * dedup-by-retrieval (drop documents whose top-scoring neighbor is
  * above a threshold), and decontamination / attribution audits
  * ("which training documents would this benchmark question retrieve?")
  * are both BM25 queries over the corpus.
  */
object Retrieval {

  /** #104 BM25 top-k retrieval — score a bounded query set against
    * every document and keep the k best matches per query.
    *
    * The query set is carved deterministically from the corpus itself
    * (documents with `doc_id % 97 == 0`, lowest `nQueries` ids; each
    * query = the distinct first `qLen` whitespace tokens of that
    * document), so the operator is self-contained and oracle-able with
    * no side files. Scoring is textbook BM25:
    *
    *   score(q,d) = Σ_t ln((N − df + ½)/(df + ½) + 1) ·
    *                tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with every per-(query, term, doc) contribution micro-rounded
    * (1e-6 fixed point) and integer-summed — the q70/q100
    * order-independence rule, which also makes top-k ties exact:
    * ranking is (score_micro desc, doc_id asc), never a float compare.
    *
    * Scale shape (the inverted-index plan, with no index structure to
    * maintain): ONE exchange keyed by (doc_id, tok) builds tf — and
    * `dl` rides along in the grouping key so document length never
    * needs a second join. The ≤ nQueries·qLen query terms BROADCAST
    * into the tf stream first (the inverted-index lookup, expressed
    * as a hash-probe filter), and df — each term's posting row count
    * — aggregates over those matched postings only, never the corpus
    * vocabulary; the scoring aggregate and the per-query top-k window
    * touch the same matched fraction. Corpus stats (N, Σdl) are one
    * 1-row aggregate. Nothing downstream of the tf build scales with
    * corpus size except the postings of the queried terms — exactly
    * an inverted index's cost model.
    */
  def q104Bm25TopK(spark: SparkSession, dir: String, nQueries: Int = 8,
      qLen: Int = 4, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    bm25TopK(docs, querySetOf(docs, nQueries, qLen), k, k1, b)
  }

  /** (doc_id, toks) projection every retrieval operator starts from. */
  private def tokenizedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  /** The deterministic corpus-derived query set (query_id, tok) that
    * q104/q106/q108/q109 all carve identically — ONE definition, so
    * their row-for-row equality (and the shared oracle it justifies)
    * is structural, not a convention four copies must uphold.
    */
  private def querySetOf(docs: DataFrame, nQueries: Int,
      qLen: Int): DataFrame =
    docs.filter(col("doc_id") % 97 === 0)
      .orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("query_id"),
        explode(slice(col("toks"), 1, qLen)).as("tok"))
      .distinct()

  /** DataFrame core of [[q104Bm25TopK]]: rank `docs` (doc_id, toks)
    * against `queries` (query_id, tok — one row per distinct query
    * term; MUST be bounded/broadcastable, it is collected into a hash
    * join build side). See the operator scaladoc for the plan shape.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double, b: Double): DataFrame = {
    // 1-row corpus stats: N and avgdl (driver traffic bounded)
    val st = docs.agg(count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("total")).head()
    val nDocs = st.getLong(0)
    if (nDocs == 0) return emptyResult(queries)
    val avgdl = st.getLong(1).toDouble / nDocs
    // tf with dl riding in the grouping key: ONE (doc_id, tok) exchange
    val tf = docs
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    // prune to query-term postings FIRST (broadcast hash-probe), so
    // df — the per-term posting row count — aggregates only those
    // postings, never the corpus vocabulary (the bm25Indexed shape)
    scoreMatched(
      tf.join(broadcast(queries.select("tok").distinct()), Seq("tok")),
      queries, nDocs, avgdl, k, k1, b)
  }

  /** Shared scoring tail of [[bm25TopK]] and [[bm25Indexed]]:
    * `matched` holds (tok, doc_id, dl, tf) postings already pruned to
    * the query terms; df per term is its posting row count (rows are
    * unique per (tok, doc) on both paths). The float expression
    * mirrors the oracle SQL token-for-token (same literals, same
    * association) so both engines run the same IEEE ops; only ln()
    * itself is engine libm code, and its ulp-level drift sits ~1e-9
    * micro-units from any rounding boundary (the q100 argument).
    */
  private def scoreMatched(matched: DataFrame, queries: DataFrame,
      nDocs: Long, avgdl: Double, k: Int, k1: Double,
      b: Double): DataFrame = {
    val dfTab = matched.groupBy("tok").agg(count(lit(1)).cast("long").as("df"))
    val contrib = round(
      log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) *
          (lit(1.0 - b) + (lit(b) * col("dl")) / lit(avgdl))) *
        lit(1000000.0)).cast("long")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    matched
      .join(broadcast(dfTab), Seq("tok"))
      .join(broadcast(queries), Seq("tok"))
      .select(col("query_id"), col("doc_id"), contrib.as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "rank", "score_micro")
      .orderBy("query_id", "rank")
  }

  /** #105 Per-source quota — cap every source's contribution to the
    * corpus at its `cap` best documents by the q103 quality score
    * (C4's host-level curation step, Raffel et al. 2020 §2.2, applied
    * as "keep the best N per domain" rather than a blocklist). Quality
    * is the q44/q103 milli-rounded integer (length saturation ×
    * non-stopword mass), so selection is integer-exact; ties break on
    * doc_id. Returns the KEPT rows with their per-source rank.
    *
    * Scale shape — the naive plan (row_number over source) puts an
    * entire host in one task, and host skew is the norm at 100 TB
    * (one domain can be 1% of the web). Two-phase top-k instead:
    * phase 1 ranks within (source, salt) — `salts`-way hash split of
    * each source — and keeps ≤ cap rows per cell, so the phase-2
    * exact window over source sees ≤ salts·cap rows per source, NOT
    * the source's full population. Correct because phase 1 only
    * discards rows that already have ≥ cap better rows in their own
    * cell — such rows cannot be in the true per-source top cap. The
    * quality computation itself is map-side; only narrow (doc_id,
    * source, q_milli) rows ever shuffle.
    */
  def q105SourceQuota(spark: SparkSession, dir: String, cap: Int = 16,
      salts: Int = 8): DataFrame =
    sourceQuotaOf(Tables.documents(spark, dir), cap, salts)

  /** DataFrame core of [[q105SourceQuota]]: the kept (doc_id, source,
    * q_milli, rank) rows of `docs` (doc_id, source, text) — also the
    * optional corpus-balancing stage of
    * [[graft.Pipeline.prepareCorpus]]. See the operator scaladoc for
    * the salted two-phase plan.
    */
  def sourceQuotaOf(docs: DataFrame, cap: Int, salts: Int = 8): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "in", "to")
    val q = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), t => t.isin(stop: _*))).as("n_stop"))
      .select(col("doc_id"), col("source"),
        round(least(col("n_tokens").cast("double") / lit(50.0), lit(1.0)) *
          (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) *
          lit(1000.0)).cast("long").as("q_milli"))
    val order = Seq(col("q_milli").desc, col("doc_id").asc)
    val pre = Window.partitionBy(col("source"),
      pmod(xxhash64(col("doc_id")), lit(salts))).orderBy(order: _*)
    val exact = Window.partitionBy("source").orderBy(order: _*)
    q.withColumn("prank", row_number().over(pre))
      .filter(col("prank") <= cap)
      .withColumn("rank", row_number().over(exact))
      .filter(col("rank") <= cap)
      .select("doc_id", "source", "q_milli", "rank")
      .orderBy("source", "rank")
  }

  /** Zero-row (query_id, doc_id, rank, score_micro) relation — the
    * empty-corpus result (an empty day/partition is routine input;
    * the EmptyInputSpec contract).
    */
  private def emptyResult(queries: DataFrame): DataFrame =
    queries.select(col("query_id"), lit(0L).as("doc_id"),
      lit(0).as("rank"), lit(0L).as("score_micro")).limit(0)

  // ----- persisted inverted index (the q49/q87 index-at-rest story
  // ----- applied to lexical retrieval) -----

  /** Build (or extend) a persisted inverted index under `indexPath`:
    *
    *   postings/tb=<bucket>/  (tok, doc_id, tf, dl) — every posting
    *     of a term lives in the ONE parquet partition its
    *     `pmod(xxhash64(tok), nBuckets)` bucket names, so a probe
    *     prunes the scan to the buckets of its query terms and never
    *     touches the rest of the corpus (the q49 cell-pruning rule,
    *     term-hash instead of k-means cell).
    *   stats/  one (n_docs, total_tokens) row PER WRITE — appends add
    *     a row instead of rewriting; readers SUM, so `append` never
    *     has to read-modify-write shared state (the q87 batch rule).
    *
    * df is deliberately NOT materialized: a term's document frequency
    * is the row count of its own postings, recomputed inside the
    * pruned buckets at probe time — which keeps `append` trivially
    * correct (new docs only add postings; no df merge step, no stale
    * df reads) at the cost of counting rows the probe already scans.
    * Caller contract for `append`: batches must be disjoint doc sets
    * (same as [[graft.ops.LlmOps.dedupIndexAppendBatch]]).
    */
  /** The (doc_id, dl, tok, tf, tb) posting rows of `docs` — the ONE
    * definition both index layouts write, so the flat and
    * batch-stamped paths can never desynchronize their tokenization
    * or bucketing.
    */
  private def postingsOf(docs: DataFrame, nBuckets: Int): DataFrame =
    docs
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(xxhash64(col("tok")), lit(nBuckets)))

  /** (n_docs, total_tokens) of `docs` as one driver-side row. */
  private def statsOf(docs: DataFrame): (Long, Long) = {
    val st = docs.agg(count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("total")).head()
    (st.getLong(0), if (st.isNullAt(1)) 0L else st.getLong(1))
  }

  /** [[statsOf]] as an IN-PLAN one-row relation (n_docs,
    * total_tokens, n_buckets) — writers land it in the same job that
    * computes it instead of paying a separate head() job (round-18).
    * coalesce(sum, 0) mirrors statsOf's null-to-zero on an empty
    * batch; the int cast keeps n_buckets the schema statsOf's
    * Seq.toDF produced.
    */
  private def statsRowOf(docs: DataFrame, nBuckets: Int): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("toks")).cast("long")), lit(0L))
          .as("total_tokens"))
      .select(col("n_docs"), col("total_tokens"),
        lit(nBuckets).cast("int").as("n_buckets"))

  /** The single recorded bucket count of an index's stats relation:
    * Some(n) when every stats row that records one agrees, None when
    * none records one (a pre-f2 index — the caller falls back to its
    * parameter). Mixed recorded counts abort loudly: postings hashed
    * with two moduli in one directory cannot be probed correctly.
    */
  private def indexBucketCount(stDf: DataFrame): Option[Int] =
    if (!stDf.columns.contains("n_buckets")) None
    else {
      // a NULL row means a pre-f2 write whose hash modulus nobody
      // recorded — next to RECORDED rows that is a mixed-provenance
      // index whose early postings may sit in wrong buckets, and
      // accepting the recorded value would validate exactly the
      // silent-incomplete-probe failure this column exists to stop
      val rows = stDf.select("n_buckets").distinct().collect()
      val (nulls, vals) = rows.partition(_.isNullAt(0))
      val counts = vals.map(_.getInt(0)).sorted
      if (counts.length > 1 || (counts.nonEmpty && nulls.nonEmpty))
        throw new IllegalStateException(
          s"inverted index mixes bucket provenance (recorded: " +
            s"${counts.mkString(",")}${if (nulls.nonEmpty) " + unrecorded pre-f2 writes" else ""}) — " +
            "one index, one hash modulus; rebuild the index")
      counts.headOption
    }

  // stats written batch-stamped (invIndexAppendBatch) carry
  // `__batch_id=` partition directories; flat writes (invIndexWrite,
  // or a sealed index) don't. The two directory depths cannot mix —
  // parquet partition discovery requires one. guardAppendBuckets
  // checks this against its own single listing (one listStatus per
  // append, not two).

  /** JVM-local (indexPath → validated bucket count): a long-lived
    * stream appends one stats file per micro-batch, so re-merge-
    * reading ALL stats footers per batch would cost O(batches) per
    * append — quadratic over the stream's life. The first successful
    * guard pins the count for this JVM; later appends compare against
    * the pin in O(1). Cross-JVM writers re-validate on their own
    * first append.
    */
  private val guardedBuckets =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()

  /** Refuse a write that would mix hash moduli OR directory layouts
    * in one index: an append whose `nBuckets` differs from the count
    * the existing stats record, an append onto a pre-f2 index that
    * records none (unprovable layout), or a stamped append onto a
    * flat index (and vice versa — the depths break partition
    * discovery) aborts BEFORE any bytes land, instead of poisoning
    * every later probe. Check-then-act caveat: two CONCURRENT FIRST
    * appends to a brand-new path both see no stats and pass — the
    * guard assumes one pipeline configures one index (the documented
    * concurrent-batch case shares one config); a mixed-modulus index
    * born that way is still caught loudly at the next guard or read.
    */
  private def guardAppendBuckets(spark: SparkSession, indexPath: String,
      nBuckets: Int, stamped: Boolean): Unit = {
    // the pin covers (path, LAYOUT): a stamped append must never ride
    // a pin the flat writer earned (or vice versa), and sealing —
    // which changes the layout in place — retires the path's pins
    val pinKey = s"$indexPath|stamped=$stamped"
    val statsPath = new org.apache.hadoop.fs.Path(s"$indexPath/stats")
    val fs = Sinks.fsFor(spark, statsPath.toString)
    if (!fs.exists(statsPath)) {
      // brand-new (or deleted-and-recreated) index: any pin this JVM
      // held for the old incarnation is meaningless — drop it so the
      // next append after re-creation revalidates from the new stats
      guardedBuckets.remove(pinKey); return
    }
    // ONE listing per append, pinned or not — the pin only amortizes
    // the O(batches) stats-FOOTER read, never this listStatus. The
    // listing carries both cross-JVM invalidation signals: directory
    // LAYOUT (another JVM may have sealed or rebuilt the index since
    // the pin was earned — stamped appends onto a flat layout mix
    // directory depths that break partition discovery) and the
    // MODULUS SENTINEL (`__nb_<n>`, a zero-byte marker every writer
    // maintains — an overwrite rebuild under a different bucket count
    // keeps the layout but changes the sentinel, which a stale pin
    // would otherwise never see; round-12 review).
    val entries = fs.listStatus(statsPath)
    if (entries.exists(_.getPath.getName.startsWith("__batch_id=")) != stamped &&
        entries.nonEmpty) {
      guardedBuckets.remove(pinKey)
      throw new IllegalArgumentException(
        s"${if (stamped) "batch-stamped" else "flat"} append onto " +
          s"$indexPath whose existing layout is " +
          s"${if (stamped) "flat" else "batch-stamped"} — the directory " +
          "depths don't mix (seal the index or use the matching writer)")
    }
    // digits-only: a stray non-numeric `__nb_*` file is NOT a
    // sentinel this writer ever produced — corruption or foreign
    // litter — so it fails the guard loudly instead of throwing a
    // bare NumberFormatException (round-12 advice)
    val nbNames = entries.map(_.getPath.getName).filter(_.startsWith("__nb_"))
    val malformed = nbNames.filterNot(_.stripPrefix("__nb_").matches("[0-9]+"))
    if (malformed.nonEmpty) {
      guardedBuckets.remove(pinKey)
      throw new IllegalArgumentException(
        s"append onto $indexPath: unparsable bucket-count sentinel(s) " +
          s"${malformed.mkString(", ")} in stats/ — the modulus cannot be " +
          "validated; remove the stray file(s) or rebuild the index")
    }
    val sentinel = nbNames.map(_.stripPrefix("__nb_").toInt)
    val mismatched = sentinel.filter(_ != nBuckets)
    if (mismatched.nonEmpty) {
      guardedBuckets.remove(pinKey)
      throw new IllegalArgumentException(
        s"append with nBuckets=$nBuckets onto $indexPath whose postings " +
          s"are hashed with ${mismatched.distinct.mkString("/")} buckets — " +
          "rebuild the index instead")
    }
    val pinned = guardedBuckets.get(pinKey)
    if (pinned != null) {
      if (pinned.intValue != nBuckets) throw new IllegalArgumentException(
        s"append with nBuckets=$nBuckets onto $indexPath validated at " +
          s"$pinned buckets this session — one index, one hash modulus")
      return
    }
    // a matching sentinel IS a validation (it is written only after a
    // write under that modulus): pin and skip the footer read
    if (sentinel.nonEmpty) {
      guardedBuckets.put(pinKey, Int.box(nBuckets)); return
    }
    val stDf =
      try spark.read.option("mergeSchema", "true").parquet(statsPath.toString)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("UNABLE_TO_INFER_SCHEMA") =>
          return // empty stats dir: nothing recorded yet
      }
    indexBucketCount(stDf) match {
      case Some(n) if n != nBuckets => throw new IllegalArgumentException(
        s"append with nBuckets=$nBuckets onto $indexPath whose postings " +
          s"are hashed with $n buckets — rebuild the index instead")
      case None if !stDf.isEmpty => throw new IllegalArgumentException(
        s"append onto $indexPath whose stats record no bucket count " +
          "(pre-f2 layout) — the hash modulus cannot be validated; " +
          "rebuild the index")
      case Some(_) =>
        guardedBuckets.put(pinKey, Int.box(nBuckets)); ()
      case _ => ()
    }
  }

  def invIndexWrite(docs: DataFrame, indexPath: String,
      nBuckets: Int = 64, mode: String = "overwrite"): Unit =
    Sinks.withWriterLease(docs.sparkSession, indexPath, "inv-index-write") {
    val spark = docs.sparkSession
    import spark.implicits._
    if (mode == "append")
      guardAppendBuckets(spark, indexPath, nBuckets, stamped = false)
    else {
      // overwrite rebuilds the index in place — possibly with a new
      // bucket count or layout — so retire this JVM's append-guard
      // pins exactly as invIndexSeal does: a later append must
      // revalidate against the REBUILT stats, not the pin the old
      // incarnation earned (round-11 advice)
      guardedBuckets.remove(s"$indexPath|stamped=true")
      guardedBuckets.remove(s"$indexPath|stamped=false")
    }
    // postings/ and stats/ are disjoint subdirs off one input with no
    // commit-order contract (the invIndexAppendBatch rule), so the two
    // writes run as concurrent driver-thread jobs; the stats agg is
    // fused INTO its write plan (one job, not head()+write — round-18,
    // guide §2.3/§2.6). n_buckets rides the stats table so probes read
    // the bucket count the postings were actually hashed with — two
    // call sites each defaulting to 64 is a silent-mismatch trap
    // (round-10 advice).
    Sinks.awaitAllOrThrow(Seq(
      Sinks.bFuture {
        // one writer task per bucket (explicit numPartitions — the ANN
        // cell-write note: AQE coalesces a KB-scale exchange to one task)
        postingsOf(docs, nBuckets).repartition(nBuckets, col("tb"))
          .write.mode(mode).partitionBy("tb").parquet(s"$indexPath/postings")
      },
      Sinks.bFuture {
        statsRowOf(docs, nBuckets)
          .coalesce(1).write
          .mode(if (mode == "append") "append" else "overwrite")
          .parquet(s"$indexPath/stats")
      }))
    ensureModulusSentinel(spark, indexPath, nBuckets)
  }

  /** Maintain the `__nb_<n>` modulus sentinel in the stats dir — a
    * zero-byte, underscore-prefixed marker (parquet-invisible: Spark
    * hides `_`-led files WITHOUT an `=` in the name — an `=` would
    * read as a partition value and break footer merges)
    * every writer leaves after landing stats under modulus `n`. The
    * append guard reads it from the ONE directory listing it already
    * pays, so cross-JVM modulus validation costs no extra RPC and no
    * stats-footer read — and an overwrite rebuild under a DIFFERENT
    * bucket count (which keeps the directory layout and so would
    * otherwise ride a stale JVM-local pin) is caught at the next
    * append (round-12 review). Sentinels are recreated after any
    * whole-dir rewrite (overwrite stats write, seal).
    */
  private def ensureModulusSentinel(spark: SparkSession,
      indexPath: String, nBuckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/stats/__nb_$nBuckets")
    val fs = Sinks.fsFor(spark, p.toString)
    if (!fs.exists(p)) { fs.create(p, true).close() }
  }

  /** Probe the [[invIndexWrite]] index with `queries` (query_id, tok —
    * bounded/broadcastable): identical scoring arithmetic to
    * [[bm25TopK]], but the posting scan is PRUNED to the partitions
    * of the query terms' buckets — cost scales with those terms'
    * posting lists, never the indexed corpus. Corpus stats are the
    * SUM of the stats rows (one per write), so an appended index
    * scores with its true N and avgdl. The bucket count used to hash
    * query terms is READ FROM THE INDEX (the `n_buckets` stats
    * column each write records), never guessed from a parameter: a
    * probe hashing with a different modulus than the postings layout
    * silently returns incomplete results. `nBuckets` survives only
    * as the fallback for pre-f2 indexes whose stats lack the column,
    * and mixed per-write bucket counts abort loudly.
    */
  def bm25Indexed(spark: SparkSession, queries: DataFrame,
      indexPath: String, nBuckets: Int = 64, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // mergeSchema: a stats dir whose files span the pre-f2 (no
    // n_buckets column) and f2 layouts must surface the column with
    // nulls for the old rows, not whichever single footer Spark
    // happened to pick — a footer race here either NPEs or silently
    // reverts to the parameter against a differently-hashed layout
    val stDf = spark.read.option("mergeSchema", "true")
      .parquet(s"$indexPath/stats")
    // ONE aggregate job carries everything the probe needs from the
    // stats relation (round 13; previously the sums and the modulus
    // validation were separate jobs): N, total tokens, the distinct
    // recorded-modulus set (count-distinct + max reconstructs
    // indexBucketCount's single-modulus check exactly — >1 distinct
    // or a NULL row next to recorded rows is the same mixed-
    // provenance abort) — and the q129 tombstone correction rides the
    // SAME job as a unioned negative contribution (dl was captured at
    // delete time, so the common case stays a bounded-file read; the
    // rare NULL-dl tombstone pays resolveTombstoneDl's one
    // broadcast-filtered postings pass first — see its scaladoc; df
    // needs no correction — it is the row count of the anti-joined
    // postings below). No tombstones ⇒ no union branch.
    val hasNb = stDf.columns.contains("n_buckets")
    val statRows = stDf.select(col("n_docs"), col("total_tokens"),
      (if (hasNb) col("n_buckets") else lit(null).cast("int")).as("nb"))
    // NULL-dl tombstones (deleted-before-ingest docs that have since
    // been appended) are resolved against current postings BEFORE the
    // correction, so the probe's N/avgdl match rebuild-without-deleted
    // even in the delete-then-append case; ids for the anti-join below
    // are unaffected by resolution
    val delsOpt = readInvDeletes(spark, indexPath).map(d =>
      resolveTombstoneDl(spark, indexPath, d, readPostings(spark, indexPath)))
    val unioned = delsOpt match {
      case None => statRows
      case Some(dels) => statRows.unionByName(
        dels.filter(col("dl").isNotNull)
          .select(lit(-1L).as("n_docs"), (-col("dl")).as("total_tokens"),
            // a tombstone row must not look like a pre-f2 NULL-modulus
            // stats row to the provenance check — give it the max nb
            // marker by keeping it NULL and excluding it below via
            // n_docs < 0
            lit(null).cast("int").as("nb")))
    }
    // the stats aggregate and the query-term hash collect are
    // independent (the bucket MODULUS is applied driver-side below,
    // after the stats reveal it), so the probe's two driver waves run
    // concurrently — max(), not sum() (round-18, guide §2.6). Hashes
    // are collected PRE-mod: pmod(h, nb) over the distinct hash set
    // driver-side yields exactly the bucket set the in-plan
    // pmod+distinct produced.
    val stF = Sinks.bFuture {
      unioned.agg(
        coalesce(sum("n_docs"), lit(0L)),
        coalesce(sum("total_tokens"), lit(0L)),
        countDistinct(col("nb")),
        max(col("nb")),
        coalesce(sum(when(col("nb").isNull && col("n_docs") >= 0, 1L)), lit(0L)))
        .head()
    }
    val qHashF = Sinks.bFuture {
      queries.select(xxhash64(col("tok")).as("h"))
        .distinct().collect().map(_.getLong(0)).toIndexedSeq
    }
    Sinks.awaitAllOrThrow(Seq(stF, qHashF))
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration
    val st = Await.result(stF, Duration.Inf)
    val qHashes = Await.result(qHashF, Duration.Inf)
    val nDocs = st.getLong(0)
    // empty index: the postings dir holds no parquet files (an empty
    // partitioned write emits none), so don't even try to read it
    if (nDocs <= 0) return emptyResult(queries)
    val avgdl = st.getLong(1).toDouble / nDocs
    val nbDistinct = st.getLong(2)
    val nbNulls = st.getLong(4)
    if (nbDistinct > 1 || (nbDistinct == 1 && nbNulls > 0))
      throw new IllegalStateException(
        "inverted index mixes bucket provenance (recorded moduli: " +
          s"$nbDistinct distinct${if (nbNulls > 0) " + unrecorded pre-f2 writes" else ""}) — " +
          "one index, one hash modulus; rebuild the index")
    val nb: Int = if (nbDistinct == 1) st.getInt(3) else nBuckets
    // driver-side pmod of the pre-collected distinct hashes — the same
    // ((h % nb) + nb) % nb arithmetic the in-plan pmod applies
    val buckets = qHashes.map(h => ((h % nb) + nb) % nb).distinct
    val pruned0 = spark.read.parquet(s"$indexPath/postings")
      .filter(col("tb").isin(buckets: _*))
    val pruned = delsOpt match {
      case Some(dels) =>
        pruned0.join(dels.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => pruned0
    }
    // exact-term postings; df = posting row count per term (rows are
    // unique per (tok, doc) by the disjoint-batch write contract)
    scoreMatched(
      pruned.join(broadcast(queries.select("tok").distinct()), Seq("tok")),
      queries, nDocs, avgdl, k, k1, b)
  }

  /** #106 Indexed BM25 — [[q104Bm25TopK]]'s exact semantics served
    * from the persisted inverted index: build (overwrite) under an
    * app-scoped tmp path, then probe with the same deterministic
    * query set. Identical arithmetic over identical postings means
    * the result EQUALS q104 row-for-row — which is why this query
    * shares q104's oracle (the q89-shares-q81 structural-exactness
    * argument): the index is a materialization, not a semantic
    * change; what the oracle gate adds here is proof that the
    * partition-pruned probe path loses nothing.
    */
  def q106Bm25Indexed(spark: SparkSession, dir: String, nQueries: Int = 8,
      qLen: Int = 4, k: Int = 10): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    // app-scoped path: two sessions on the same dir can't clobber
    // each other's index mid-probe (the q87 rule)
    val indexPath = s"${Sinks.indexRoot}/graft_q106_index_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      spark.sparkContext.applicationId
    invIndexWrite(docs, indexPath)
    probeAndClean(spark,
      bm25Indexed(spark, querySetOf(docs, nQueries, qLen), indexPath, k = k),
      indexPath)
  }

  /** Materialize a BOUNDED probe result (≤ nQueries·k rows by
    * construction), then delete the demonstration index it read —
    * the declared q106/q109 queries build a throwaway index per run,
    * and without this a long-lived host accumulates one index-sized
    * tmp directory per application (library users calling
    * [[invIndexWrite]]/[[bm25Indexed]] directly manage their own
    * index lifecycle and are untouched). Localizing the rows first is
    * what makes the delete safe: the returned frame no longer reads
    * the files.
    */
  private def probeAndClean(spark: SparkSession, result: DataFrame,
      indexPath: String): DataFrame =
    Sinks.localizeAndDelete(spark, result, indexPath)

  /** Batch-stamped incremental append to the inverted index — the
    * per-micro-batch core of [[graft.ops.Streaming.bm25IndexIngest]]
    * and the declared q109 batch twin. Unlike the plain
    * `mode("append")` path, every write here lands in
    * `postings/tb=<bucket>/__batch_id=<b>/` and
    * `stats/__batch_id=<b>/` via DYNAMIC partition overwrite, so a
    * REPLAYED micro-batch (at-least-once delivery) rewrites exactly
    * its own directories instead of duplicating postings — the
    * q87/q94 exactly-once-state rule. Appending a batch is a pure
    * function of the batch (no probe, no read-modify-write of shared
    * state: df and corpus stats are reconstructed at query time), so
    * batches may even be written CONCURRENTLY. Probes prune on `tb`
    * exactly as before — the batch subdirectories are invisible to
    * the bucket filter. NOTE: one index must be built either all
    * batch-stamped or all flat ([[invIndexWrite]]) — parquet
    * partition discovery requires a consistent directory depth.
    */
  def invIndexAppendBatch(docs: DataFrame, indexPath: String,
      batchId: Long, nBuckets: Int = 64): Unit =
    Sinks.withWriterLease(docs.sparkSession, indexPath, "inv-index-append") {
      invIndexAppendBatchHeld(docs, indexPath, batchId, nBuckets)
    }

  /** Lease-held core of [[invIndexAppendBatch]] — factored out so an
    * orchestrator that already holds the index's writer lease (the
    * q109/q116 batch ingest) can append INDEPENDENT batches from
    * concurrent driver threads under ONE acquisition: the lease is
    * thread-scoped, so per-append reacquisition from a pool thread
    * would fail loud against its own process. Safe to run
    * concurrently per the append contract above (pure function of the
    * batch, disjoint `__batch_id` directories, per-job staging under
    * dynamic partition overwrite).
    */
  private[graft] def invIndexAppendBatchHeld(docs: DataFrame,
      indexPath: String, batchId: Long, nBuckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // same modulus guard as the flat append (first append per JVM
    // pays one stats read; later ones hit the session pin — a
    // replayed batch trivially passes, it recorded this count itself)
    guardAppendBuckets(spark, indexPath, nBuckets, stamped = true)
    // postings/ and stats/ are disjoint subdirs off one batch, with
    // NO commit-order contract between them (contrast the ANN
    // codes-before-vectors ordering): a crash window leaving either
    // relation without its sibling is replay-repaired — dynamic
    // overwrite rewrites exactly this batch's directories — and the
    // interim probe merely mis-weights one batch either way. So the
    // big postings write and the stats aggregate+write run as
    // concurrent driver-thread jobs (the dedup-append rule).
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    Sinks.awaitAllOrThrow(Seq(
      Sinks.bFuture {
        postingsOf(docs, nBuckets)
          .withColumn("__batch_id", lit(batchId))
          .repartition(nBuckets, col("tb"))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("tb", "__batch_id").parquet(s"$indexPath/postings")
      },
      Sinks.bFuture {
        // stats agg fused INTO the write plan: one job computes and
        // lands the row, where head()+literal-write paid two (round-18,
        // guide §2.3 one-pass stats). Same columns, same values —
        // coalesce(sum, 0) is exactly statsOf's null-to-zero rule.
        statsRowOf(docs, nBuckets)
          .withColumn("__batch_id", lit(batchId))
          .coalesce(1).write
          .mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(s"$indexPath/stats")
      }))
    ensureModulusSentinel(spark, indexPath, nBuckets)
  }

  /** Seal a streaming-ingested ([[invIndexAppendBatch]]) inverted
    * index into [[invIndexWrite]]'s flat layout — the
    * [[graft.ops.LlmOps.annIndexSeal]] contract: run at quiesce,
    * probes unchanged (postings keep their `tb` pruning dirs; the
    * per-batch stats rows keep summing at read), per-batch directory
    * fan-out gone, flat appends from here on.
    */
  /** Explicit-schema read of the inverted index's tombstone dir —
    * None when no delete was ever recorded. Rows are (doc_id, dl):
    * the tombstone CARRIES the deleted doc's length (captured from
    * its own postings at delete time, NULL for ids absent from the
    * index), so probe-time stats correction is one bounded aggregate
    * over this dir — never a postings scan.
    */
  private def readInvDeletes(spark: SparkSession,
      indexPath: String): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/deletes")
    if (!Sinks.fsFor(spark, indexPath).exists(p)) None
    else Some(spark.read.schema(StructType(Seq(
      StructField("doc_id", LongType), StructField("dl", LongType))))
      .parquet(p.toString))
  }

  /** Explicit-None read of the postings dir — None when the index has
    * no postings files yet (an empty partitioned write emits none, so
    * schema inference fails rather than yielding an empty frame) or
    * when an apply-deletes emptied the index (postings-less root).
    * A missing index ROOT stays FATAL: every caller probes or mutates
    * an index that must already exist, so tolerating it would turn a
    * mistyped/unmounted indexPath into silently empty results
    * (round-15 advice) — the missing-path tolerance of
    * [[Sinks.readParquetIfAny]] is reserved for merge-on-read sinks
    * that genuinely start absent.
    */
  private def readPostings(spark: SparkSession,
      indexPath: String): Option[DataFrame] = {
    val out = Sinks.readParquetIfAny(spark, s"$indexPath/postings")
    if (out.isEmpty && !Sinks.fsFor(spark, indexPath)
        .exists(new org.apache.hadoop.fs.Path(indexPath)))
      throw new IllegalArgumentException(
        s"BM25 index root not found: $indexPath — build it first " +
          "(invIndexWrite / invIndexAppend); probe-side reads fail " +
          "loud on a missing index rather than returning empty results")
    out
  }

  /** Resolve NULL-dl tombstones against CURRENT postings. A NULL dl
    * means the doc was ABSENT from the index at delete time; if a
    * replayed/late batch appends it afterwards, its postings are
    * correctly anti-joined out but its stats row still counts toward
    * N/avgdl — so the correction must re-capture dl from the postings
    * that exist NOW, or tombstone-masked and rebuild-without-deleted
    * answers diverge in exactly the delete-before-ingest case
    * (round-13 review, medium). The common paths stay cheap: no
    * tombstone file ⇒ this is never called; tombstones all carrying
    * dl ⇒ one bounded-file limit(1) probe and no postings read; only
    * the rare NULL-dl case pays one broadcast-filtered postings pass.
    */
  private def resolveTombstoneDl(spark: SparkSession, indexPath: String,
      dels: DataFrame, posted: => Option[DataFrame]): DataFrame = {
    val nullIds = dels.filter(col("dl").isNull).select("doc_id")
    if (nullIds.isEmpty) return dels
    posted match {
      case None => dels
      case Some(p) =>
        val found = p.join(broadcast(nullIds), Seq("doc_id"), "left_semi")
          .groupBy("doc_id").agg(max("dl").as("__dl_now"))
        dels.join(found, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("dl"), col("__dl_now")).as("dl"))
    }
  }

  /** DELETE documents from a persisted inverted index — the
    * retention/takedown path (the [[graft.ops.LlmOps.annIndexDelete]]
    * contract applied to the lexical family). Merge-on-read: the ONE
    * mutation is an appended bounded tombstone file under
    * `indexPath/deletes/` — (doc_id, dl) rows, dl captured from the
    * doc's own postings so probes can correct N/avgdl without
    * touching postings (df needs no correction at all: it is the
    * anti-joined posting row count). Physical rewrite is deferred to
    * [[invIndexApplyDeletes]] (run by [[invIndexSeal]]). Idempotent
    * re-delete (already-tombstoned ids are not re-recorded); absent
    * ids are recorded with NULL dl — the tombstone must also mask a
    * replayed batch that lands after the delete, and probe/apply
    * re-resolve NULL dl against current postings so the stats
    * correction covers that late-append too ([[resolveTombstoneDl]]).
    * Single-writer discipline like seal. Returns the count of newly
    * recorded ids.
    */
  def invIndexDelete(spark: SparkSession, indexPath: String,
      docIds: DataFrame): Long =
    Sinks.withWriterLease(spark, indexPath, "inv-index-delete") {
    val ids = docIds
      .select(col(docIds.columns(0)).cast("long").as("doc_id")).distinct()
    val fresh0 = readInvDeletes(spark, indexPath) match {
      case Some(ex) => ids.join(ex, Seq("doc_id"), "left_anti")
      case None => ids
    }
    // dl from the doc's own postings: dl is constant per doc (one
    // (doc_id, dl) pair per doc by the postingsOf grouping), so max()
    // is exact; docs with no postings keep NULL
    val withDl = readPostings(spark, indexPath) match {
      case None => fresh0.withColumn("dl", lit(null).cast("long"))
      case Some(posted) => fresh0.join(
        posted.join(fresh0, Seq("doc_id"), "left_semi")
          .groupBy("doc_id").agg(max("dl").as("dl")),
        Seq("doc_id"), "left")
    }
    // lazy pin + count = one materializing job where the eager form
    // paid two (round-18, §2.6): count() computes every partition
    val rows = withDl.select("doc_id", "dl").localCheckpoint(false)
    val n = rows.count()
    if (n > 0)
      rows.coalesce(1).write.mode("append").parquet(s"$indexPath/deletes")
    n
  }

  /** Physically apply pending tombstones: rewrite postings WITHOUT
    * the deleted docs and the stats as ONE corrected row, installed
    * by a count-validated whole-root park-rename swap; `deletes/` is
    * gone in the installed root. The rewrite flattens a stamped
    * layout (this IS a compaction — the seal contract), so JVM
    * append-guard pins are retired and the modulus sentinel is
    * recreated. No-op without tombstones; an index emptied by the
    * delete installs a postings-less root (probes read nDocs 0 and
    * return empty). Crash between the two renames is repaired at the
    * next call's entry recovery.
    */
  def invIndexApplyDeletes(spark: SparkSession, indexPath: String): Boolean =
    Sinks.withWriterLease(spark, indexPath, "inv-index-apply") {
      // named method so its early `return`s stay method-local instead
      // of NonLocalReturnControl through the lease closure (r15 advice)
      invIndexApplyDeletesHeld(spark, indexPath)
    }

  private def invIndexApplyDeletesHeld(spark: SparkSession,
      indexPath: String): Boolean = {
    import spark.implicits._
    val fs = Sinks.fsFor(spark, indexPath)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val root = p(indexPath)
    Sinks.recoverInterrupted(fs, root, "__del_old", "__del_tmp")
    val delsOpt = readInvDeletes(spark, indexPath)
    if (delsOpt.isEmpty) return false
    // pinned lazily (root is parked below): count() materializes every
    // partition, replacing eager-checkpoint + isEmpty with ONE job
    val dels = delsOpt.get.localCheckpoint(false)
    if (dels.count() == 0) { fs.delete(p(s"$indexPath/deletes"), true); return false }
    val stDf = spark.read.option("mergeSchema", "true")
      .parquet(s"$indexPath/stats")
    val posted = readPostings(spark, indexPath)
    // Three INDEPENDENT bounded reads — the stats sums + bucket count,
    // the tombstone stats correction, and the surviving-postings pin +
    // count — previously ran as four serial job waves; they share no
    // state beyond the already-materialized `dels` checkpoint, so they
    // run as concurrent driver-thread jobs and the step pays max(),
    // not sum() (round-18, guide §2.6 — the q129 fixed-latency cut).
    // NULL-dl tombstones are resolved against the postings that exist
    // NOW (delete-before-ingest docs appended since the delete must be
    // subtracted from the compacted stats — see resolveTombstoneDl).
    val kept = posted.map(
      _.drop("__batch_id").join(dels.select("doc_id"), Seq("doc_id"), "left_anti")
        .localCheckpoint(false)) // lazy pin: its count() materializes it
    val stF = Sinks.bFuture {
      val st = stDf.agg(sum("n_docs"), sum("total_tokens")).head()
      val nb = indexBucketCount(stDf).getOrElse(throw new IllegalArgumentException(
        s"invIndexApplyDeletes: $indexPath records no bucket count (pre-f2 " +
          "layout) — rebuild the index instead"))
      (st, nb)
    }
    val corrF = Sinks.bFuture {
      resolveTombstoneDl(spark, indexPath, dels, posted)
        .filter(col("dl").isNotNull)
        .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    }
    val keptF = Sinks.bFuture { kept.map(_.count()).getOrElse(0L) }
    Sinks.awaitAllOrThrow(Seq(stF, corrF, keptF))
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration
    val (st, nb) = Await.result(stF, Duration.Inf)
    val corr = Await.result(corrF, Duration.Inf)
    val expected = Await.result(keptF, Duration.Inf)
    val nDocs = st.getLong(0) - corr.getLong(0)
    val total = st.getLong(1) - corr.getLong(1)
    val tmp = indexPath + "__del_tmp"
    if (expected > 0) {
      kept.get.repartition(nb, col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$tmp/postings")
    }
    // the rewrite's validation count and the 1-row stats write are
    // independent — concurrent, max() not sum() (round-18, §2.6). On
    // a count mismatch the whole tmp root is discarded exactly as
    // before, so the concurrently-written stats never survive.
    val actF = Sinks.bFuture {
      if (expected > 0) spark.read.parquet(s"$tmp/postings").count() else 0L
    }
    val stWrF = Sinks.bFuture {
      Seq((nDocs, total, nb)).toDF("n_docs", "total_tokens", "n_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
    }
    Sinks.awaitAllOrThrow(Seq(actF, stWrF))
    val actual = Await.result(actF, Duration.Inf)
    if (expected > 0 && actual != expected) {
      fs.delete(p(tmp), true)
      throw new java.io.IOException(
        s"invIndexApplyDeletes: rewrite has $actual postings, expected " +
          s"$expected; aborted with $indexPath untouched")
    }
    Sinks.swapInstall(fs, p(tmp), root, "__del_old")
    ensureModulusSentinel(spark, indexPath, nb)
    // layout changed in place (flattened, postings rewritten): retire
    // this JVM's append-guard pins, exactly as invIndexSeal does
    guardedBuckets.remove(s"$indexPath|stamped=true")
    guardedBuckets.remove(s"$indexPath|stamped=false")
    true
  }

  def invIndexSeal(spark: SparkSession, indexPath: String): Unit =
    Sinks.withWriterLease(spark, indexPath, "inv-index-seal") {
    // quiesce-time compaction applies pending tombstones FIRST (the
    // q129 retention/takedown path): a sealed index never carries a
    // deletes/ dir. When tombstones existed, the apply already
    // flattened postings AND stats — the stamped seals below then
    // no-op on the flat layout.
    invIndexApplyDeletes(spark, indexPath)
    Sinks.sealBatchStampedAll(spark, Seq(
      s"$indexPath/postings" -> Some("tb"),
      s"$indexPath/stats" -> None))
    // the layout just changed in place: retire this JVM's append-guard
    // pins so the next append revalidates against the sealed layout
    guardedBuckets.remove(s"$indexPath|stamped=true")
    guardedBuckets.remove(s"$indexPath|stamped=false")
    // the seal rewrote the stats dir wholesale — restore the modulus
    // sentinel from the sealed stats' own recorded count (one bounded
    // read at quiesce time). Guarded: sealing is contractually a
    // no-op on an index that was never written (zero-batch stream),
    // whose stats dir is missing or schema-less — nothing to restore
    try indexBucketCount(spark.read.option("mergeSchema", "true")
        .parquet(s"$indexPath/stats"))
      .foreach(n => ensureModulusSentinel(spark, indexPath, n))
    catch { case _: org.apache.spark.sql.AnalysisException => () }
  }

  /** #109 Batch twin of the streaming inverted-index ingest: split
    * the corpus into `nBatches` ordered doc-id ranges (the q87
    * arithmetic), push each through [[invIndexAppendBatch]] — the
    * IDENTICAL code path the streaming wrapper runs per micro-batch —
    * then serve the q104 query set from the accumulated index.
    * Because an append is a pure function of its batch and df/stats
    * are reconstructed at probe time, the batch-built index holds
    * exactly the full corpus' postings — so the result EQUALS q104
    * row-for-row and shares its oracle (the q87/q94 argument): the
    * driver's hash gates the whole ingest loop — stamped layout,
    * bucket pruning, stats summation, cross-batch df reconstruction.
    */
  def q109Bm25IngestBatch(spark: SparkSession, dir: String,
      nBatches: Int = 3, nQueries: Int = 8, qLen: Int = 4,
      k: Int = 10): DataFrame =
    bm25IngestProbe(spark, dir, nBatches, nQueries, qLen, k,
      seal = false, tag = "q109")

  /** #116 Sealed-index BM25 — [[q109Bm25IngestBatch]] extended one
    * lifecycle step (the [[graft.ops.LlmOps.q114SimsearchSealed]]
    * argument applied to the inverted index): the identical multi-batch
    * ingest (since round 10 built once into a parameter-keyed
    * persisted memo and CLONED per run — the ingest path stays gated
    * fresh by q109), then [[invIndexSeal]] (postings collapse to flat
    * `tb=<bucket>/` directories, the per-batch stats rows collapse to
    * one relation), then the q104 query set served from the SEALED
    * index. Sealing is a pure relayout, so the result EQUALS q104
    * row-for-row and SHARES its oracle — the driver's hash now gates
    * the lexical index's compaction end-to-end: flat-rewrite row
    * validation, park-rename swap, stats summation over the sealed
    * (single-relation) stats, and tb pruning on the flat layout.
    */
  def q116Bm25Sealed(spark: SparkSession, dir: String,
      nBatches: Int = 3, nQueries: Int = 8, qLen: Int = 4,
      k: Int = 10): DataFrame =
    bm25IngestProbe(spark, dir, nBatches, nQueries, qLen, k,
      seal = true, tag = "q116", reuseIngestMemo = true)

  /** Shared body of q109/q116: batch-ingest, optionally seal, probe.
    * ONE definition so the stamped and sealed declarations cannot
    * drift (the LlmOps.simsearchIngestProbe convention).
    */
  private def bm25IngestProbe(spark: SparkSession, dir: String,
      nBatches: Int, nQueries: Int, qLen: Int, k: Int,
      seal: Boolean, tag: String,
      reuseIngestMemo: Boolean = false): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    val maxId = docs.agg(max("doc_id")).head().getAs[Any](0) match {
      case null => -1L
      case l: Long => l
      case i: Int => i.toLong
    }
    val bSize = math.max(1L, maxId / nBatches + 1)
    // app-scoped path + per-run state (the q87/q106 rule)
    val indexPath = s"${Sinks.indexRoot}/graft_${tag}_index_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      spark.sparkContext.applicationId
    val fs = Sinks.fsFor(spark, indexPath)
    fs.delete(new org.apache.hadoop.fs.Path(indexPath), true)
    // Every stamped append is a pure function of its batch (no probe,
    // no read-modify-write of shared state — the invIndexAppendBatch
    // contract says "batches may even be written CONCURRENTLY"), so
    // the ingest loop runs all batches as concurrent driver-thread
    // job chains under ONE writer-lease acquisition: wall cost is
    // max(batch) instead of sum(batch) (guide §2.6 — fill idle
    // capacity; round-18). The index content is byte-identical to the
    // sequential loop (disjoint __batch_id directories, per-job
    // staging), so the q109 oracle gate is unchanged.
    def ingestInto(path: String): Unit =
      Sinks.withWriterLease(spark, path, "inv-index-append") {
        Sinks.awaitAllOrThrow((0 until nBatches).map { b => Sinks.bFuture {
          invIndexAppendBatchHeld(
            docs.filter(expr(s"doc_id DIV $bSize") === b), path, b.toLong)
        }})
      }
    if (!reuseIngestMemo) ingestInto(indexPath)
    else {
      // The stamped ingest is a pure function of (corpus, split) that
      // q109's oracle already gates — memoize its bytes once
      // (parameter-keyed, staged install) and CLONE per run, so this
      // query's bench line times its own declared lifecycle step (the
      // seal), not a re-payment of q109's ingest (the
      // LlmOps.simsearchIngestProbe memo-clone pattern).
      val memo = s"${Sinks.indexRoot}/graft_bm25_stamped_memo_" +
        LlmOps.memoKeyFor(spark, dir, "documents") +
        s"_b${nBatches}_${LlmOps.IndexMemoFormat}"
      val memoRoot = new org.apache.hadoop.fs.Path(memo)
      if (!fs.exists(memoRoot)) {
        val staging = new org.apache.hadoop.fs.Path(
          memo + "__tmp_" + spark.sparkContext.applicationId)
        fs.delete(staging, true)
        ingestInto(staging.toString)
        Sinks.installMemo(fs, staging, memoRoot)
        LlmOps.gcStaleMemos(spark, "graft_bm25_stamped_memo_", dir, "documents")
      } else Sinks.repairNestedStaging(fs, memoRoot)
      Sinks.copyDir(fs, memo, indexPath,
        spark.sparkContext.hadoopConfiguration)
    }
    if (seal) invIndexSeal(spark, indexPath)
    probeAndClean(spark,
      bm25Indexed(spark, querySetOf(docs, nQueries, qLen), indexPath, k = k),
      indexPath)
  }

  /** #129 Index DELETION propagation — the retention/takedown
    * lifecycle step the append-only contract eventually forces
    * (reference README.md:80: the events store only ever grows, but
    * a real deployment must also FORGET), gated on the oracle for
    * BOTH persisted index families. The declared run: clone the flat
    * serving indexes (the [[ensureInvIndexMemo]] /
    * [[graft.ops.LlmOps.ensureServingIndexMemo]] bytes — their build
    * paths are q106's/q111's gates; the memo-clone bench rule), then
    * for each family: tombstone-delete every doc/vector with
    * id ≡ `rem` (mod `every`) ([[invIndexDelete]] /
    * [[graft.ops.LlmOps.annIndexDelete]] — merge-on-read, one
    * appended bounded file), probe (the TOMBSTONE read path: postings
    * anti-join + stats correction / codes anti-join), physically
    * apply ([[invIndexApplyDeletes]] /
    * [[graft.ops.LlmOps.annIndexApplyDeletes]] — count-validated
    * park-rename swaps), probe again (the COMPACTED path). All four
    * probe results ride one relation keyed by `kind`; the DuckDB
    * oracle recomputes BM25 and exact cosine top-k over the corpus
    * MINUS the deleted ids (queries still derive from the FULL
    * corpus — a deleted doc's takedown does not retract queries
    * already in flight), expecting tombstone == compacted == rebuild-
    * without-deleted, row for row. N, avgdl and df all shift under
    * deletion, so a stale stats row, an unapplied tombstone, or a
    * compaction that loses a surviving posting each move the hash.
    */
  def q129IndexDelete(spark: SparkSession, dir: String, nQueries: Int = 5,
      qLen: Int = 4, k: Int = 10, kAnn: Int = 5, every: Int = 5,
      rem: Int = 2): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    val queries = querySetOf(docs, nQueries, qLen).localCheckpoint()
    val sanitized = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val app = spark.sparkContext.applicationId
    val tmpRoot = Sinks.indexRoot
    val lexPath = s"$tmpRoot/graft_q129_lex_${sanitized}_$app"
    val annPath = s"$tmpRoot/graft_q129_ann_${sanitized}_$app"
    val fs = Sinks.fsFor(spark, lexPath)
    def pp(s: String) = new org.apache.hadoop.fs.Path(s)
    Seq(lexPath, annPath).foreach(x => fs.delete(pp(x), true))
    // each probe is localized (bounded nQueries·k rows) BEFORE the
    // next lifecycle step mutates the files it read
    def shaped(kind: String, df: DataFrame, rankCol: String,
        idCol: String, scoreCol: Column): DataFrame =
      df.select(lit(kind).as("kind"), col("query_id"),
        col(rankCol).cast("int").as("rank"),
        col(idCol).cast("long").as("id"),
        scoreCol.cast("double").as("score")).localCheckpoint()
    try {
      // The two family lifecycles are fully INDEPENDENT (disjoint
      // paths, disjoint reads), so they run as CONCURRENT job chains
      // from two driver threads — standard Spark multi-threaded job
      // submission; each chain's steps stay sequential within itself.
      // Wall cost is max(lex, ann) instead of their sum — the same
      // concurrency a production takedown job would use.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val lexF = Sinks.bFuture {
        Sinks.copyDir(fs, ensureInvIndexMemo(spark, dir), lexPath,
          spark.sparkContext.hadoopConfiguration)
        invIndexDelete(spark, lexPath,
          Tables.documents(spark, dir).select("doc_id")
            .filter(pmod(col("doc_id"), lit(every)) === rem))
        val tomb = shaped("bm25_tomb",
          bm25Indexed(spark, queries, lexPath, k = k), "rank", "doc_id",
          col("score_micro"))
        invIndexApplyDeletes(spark, lexPath)
        Seq(tomb, shaped("bm25_compact",
          bm25Indexed(spark, queries, lexPath, k = k), "rank", "doc_id",
          col("score_micro")))
      }
      val annF = Sinks.bFuture {
        LlmOps.ensureServingIndexMemo(spark, dir) match {
          case None => Nil // empty embedding corpus: no dense rows
          case Some(memo) =>
            Sinks.copyDir(fs, memo, annPath,
              spark.sparkContext.hadoopConfiguration)
            val emb = Tables.embeddings(spark, dir)
            LlmOps.annIndexDelete(spark, annPath, emb.select("vec_id")
              .filter(pmod(col("vec_id"), lit(every)) === rem))
            val n = emb.count()
            val annQueries = emb.filter(col("vec_id") < nQueries)
              .select("vec_id", "embedding")
            // exhaustive probe (the q111 argument): every cell,
            // lossless prefilter — the result must equal brute cosine
            // over the surviving vectors
            val candFactor = (((n + kAnn - 1) / kAnn).toInt).max(1)
            def probe() = LlmOps.annIncremental(spark, annQueries,
              annPath, k = kAnn, nProbe = 16, excludeQueryId = true,
              candFactor = candFactor)
            val tomb = shaped("ann_tomb", probe(), "rnk", "neighbor_id",
              col("cos"))
            LlmOps.annIndexApplyDeletes(spark, annPath)
            Seq(tomb, shaped("ann_compact", probe(), "rnk",
              "neighbor_id", col("cos")))
        }
      }
      // Await BOTH chains to COMPLETION (not zipWith, which fails
      // fast): if one chain throws while the sibling is mid-write, the
      // finally below would delete the tmp roots under an in-flight
      // parquet write — which can recreate the deleted directory and
      // orphan tmp state on exactly the failure path the finally
      // exists to clean (round-13 review). Rethrow the first failure
      // only after both chains have stopped touching the roots.
      import scala.concurrent.duration.Duration
      import scala.util.{Failure, Success}
      val done = Seq(lexF, annF).map(f => Await.ready(f, Duration.Inf).value.get)
      val parts = done.map {
        case Success(p) => p
        case Failure(e) => throw e
      }.reduce(_ ++ _)
      parts.reduce(_.unionByName(_))
        .orderBy("kind", "query_id", "rank")
    } finally {
      Seq(lexPath, annPath).foreach(x => fs.delete(pp(x), true))
    }
  }

  /** #108 Hybrid retrieval — reciprocal-rank fusion (Cormack, Clarke
    * & Büttcher 2009) of the lexical BM25 ranking (q104) and a dense
    * cosine ranking over the documents' embeddings, the standard
    * two-tower + lexical serving shape. Each system contributes its
    * top-`kEach` list; fused score = Σ round(1e6 / (rrfK + rank))
    * over the systems that ranked the item (integer per-system terms,
    * integer sum — exact ties, engine-independent). The harness
    * fixture's `embeddings.vec_id` is declared to identify
    * `documents.doc_id` (same id space; at sf0.1 embeddings cover the
    * first 2000 docs — ids outside it simply have no dense list, and
    * RRF's union semantics handle one-sided items by construction).
    *
    * Scale shape: the lexical leg is q104's plan; the dense leg is
    * the q38 shape — a ≤ nQueries-row broadcast against one codegen
    * scan of the embedding table (the deliberate bounded crossJoin,
    * q91's convention) with a per-query top-k window; the fusion is a
    * full-outer join of two ≤ nQueries·kEach-row lists — negligible.
    * Swap the dense leg for q43/q49/q92's index probes at corpus
    * scale; fusion semantics are rank-only, so the legs are pluggable.
    */
  def q108HybridRrf(spark: SparkSession, dir: String, nQueries: Int = 8,
      qLen: Int = 4, kEach: Int = 10, k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    import graft.ops.LlmOps.{cosinePrenorm, dotProduct}
    val docs = tokenizedDocs(spark, dir)
    val qdocs = docs.filter(col("doc_id") % 97 === 0)
      .orderBy("doc_id").limit(nQueries)
    val qterms = querySetOf(docs, nQueries, qLen)
    val lex = bm25TopK(docs, qterms, kEach, k1 = 1.2, b = 0.75)
      .select(col("query_id"), col("doc_id"), col("rank").as("lrank"))
    val emb = Tables.embeddings(spark, dir)
      .withColumn("nsq", dotProduct(col("embedding"), col("embedding")))
    val qemb = emb.join(
        broadcast(qdocs.select(col("doc_id").as("query_id"))),
        col("vec_id") === col("query_id"))
      .select(col("query_id"), col("embedding").as("qe"), col("nsq").as("qnsq"))
    // deliberate bounded crossJoin: the broadcast side is ≤ nQueries
    // rows (q38/q91 convention); self-pairs stay in (cos = 1, rank 1
    // — mirroring BM25, where the query's own doc ranks itself)
    val dense = emb.crossJoin(broadcast(qemb))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        round(cosinePrenorm(dotProduct(col("qe"), col("embedding")),
          col("qnsq"), col("nsq")), 6).as("cos"))
      .withColumn("drank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("doc_id").asc)))
      .filter(col("drank") <= kEach)
      .select("query_id", "doc_id", "drank")
    rrfFuse(lex, dense, k, rrfK)
  }

  /** Rank-only RRF fusion of a lexical list (`query_id, doc_id,
    * lrank`) and a dense list (`query_id, doc_id, drank`) — the
    * fusion stage of [[q108HybridRrf]], factored out because its
    * semantics see ONLY ranks: any dense ranker with the same
    * rank lists fuses to the same result, which is what makes the
    * dense leg pluggable (brute scan here, a persisted-index probe in
    * [[q108HybridRrfIndexed]], q43/q92-shaped probes at corpus scale).
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int,
      rrfK: Int): DataFrame = {
    def term(rank: Column): Column =
      round(lit(1000000.0) / (lit(rrfK) + rank)).cast("long")
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(term(col("lrank")), lit(0L)) +
          coalesce(term(col("drank")), lit(0L))).as("rrf_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "rrf_micro", "rank")
      .orderBy("query_id", "rank")
  }

  /** Ensure the PERSISTED flat inverted-index memo for `dir` exists
    * ([[invIndexWrite]] layout at a parameter-keyed path, staged
    * build + race-tolerant install — the
    * LlmOps.ensureServingIndexMemo discipline applied to the lexical
    * family) and return its path. Serves [[q108HybridRrfIndexed]]'s
    * lexical leg, which must not re-pay a per-run index build the
    * probe doesn't depend on; the build path itself stays gated by
    * q106 (fresh per run, shares q104's oracle).
    */
  private[graft] def ensureInvIndexMemo(spark: SparkSession, dir: String,
      nBuckets: Int = 64): String = {
    val memo = s"${Sinks.indexRoot}/graft_bm25_index_memo_" +
      LlmOps.memoKeyFor(spark, dir, "documents") +
      s"_n${nBuckets}_${LlmOps.IndexMemoFormat}"
    val fs = Sinks.fsFor(spark, memo)
    val root = new org.apache.hadoop.fs.Path(memo)
    if (!fs.exists(root)) {
      val staging = new org.apache.hadoop.fs.Path(
        memo + "__tmp_" + spark.sparkContext.applicationId)
      fs.delete(staging, true)
      invIndexWrite(tokenizedDocs(spark, dir), staging.toString, nBuckets)
      Sinks.installMemo(fs, staging, root)
      LlmOps.gcStaleMemos(spark, "graft_bm25_index_memo_", dir, "documents")
    } else Sinks.repairNestedStaging(fs, root)
    memo
  }

  /** #115 (declared since round 9) — [[q108HybridRrf]] with BOTH legs
    * served from PERSISTED indexes: the dense leg from the PQ-coded
    * IVF serving index ([[graft.ops.LlmOps.annIndexWrite]] →
    * [[graft.ops.LlmOps.annIncremental]]) and, since round 10, the
    * lexical leg from the flat inverted index
    * ([[ensureInvIndexMemo]] → [[bm25Indexed]]) — the full
    * corpus-scale serving shape the q108 scaladoc promises is
    * pluggable, demonstrated end to end. Equality argument per leg:
    * the indexed BM25 probe computes identical arithmetic over
    * identical postings (the q106==q104 oracle gate), and at an
    * exhaustive probe (nProbe = nCells, lossless candFactor — the
    * q111 argument) the ANN rank lists EQUAL the brute leg's; fusion
    * is rank-only, so the fused output is row-identical to
    * [[q108HybridRrf]] (RetrievalSpec pins this). Production uses
    * nProbe < nCells and accepts the recall trade. Self-pairs stay
    * in (excludeQueryId = false), mirroring the brute leg.
    */
  def q108HybridRrfIndexed(spark: SparkSession, dir: String,
      nQueries: Int = 8, qLen: Int = 4, kEach: Int = 10, k: Int = 10,
      rrfK: Int = 60, nCells: Int = 16, nProbe: Int = 0,
      candFactor: Int = 0): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    val qdocs = docs.filter(col("doc_id") % 97 === 0)
      .orderBy("doc_id").limit(nQueries)
    val qterms = querySetOf(docs, nQueries, qLen)
    val lex = bm25Indexed(spark, qterms,
        ensureInvIndexMemo(spark, dir), k = kEach, k1 = 1.2, b = 0.75)
      .select(col("query_id"), col("doc_id"), col("rank").as("lrank"))
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    if (n == 0) // no embeddings: the dense leg is empty, fusion is lex-only
      return rrfFuse(lex,
        lex.limit(0).select(col("query_id"), col("doc_id"),
          col("lrank").as("drank")), k, rrfK)
    // the dense leg reads the PERSISTED parameter-keyed serving index
    // (q118's memo — same corpus, same params, same flat layout)
    // instead of rebuilding a throwaway index per run: fusion
    // semantics are rank-only and the exhaustive probe's rank lists
    // are content-determined, so reuse changes nothing the oracle
    // sees. n > 0 here, so the memo ensure cannot return None.
    val indexPath = LlmOps.ensureServingIndexMemo(spark, dir, nCells).get
    val queries = emb.join(
        broadcast(qdocs.select(col("doc_id").as("query_id"))),
        col("vec_id") === col("query_id"))
      .select("vec_id", "embedding")
    val effProbe = if (nProbe > 0) nProbe else nCells
    val effCand =
      if (candFactor > 0) candFactor
      else (((n + kEach - 1) / kEach).toInt).max(1)
    val dense = LlmOps.annIncremental(spark, queries, indexPath,
        k = kEach, nProbe = effProbe, excludeQueryId = false,
        candFactor = effCand)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("drank"))
    rrfFuse(lex, dense, k, rrfK)
  }
}
