package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-class scale probe: replicate the sf0.1 tables `REPL`× with
  * DECORRELATED content and re-time the headline queries, so every
  * scale argument in this repo is backed by a measured curve, not
  * only plan shape.
  *
  * Replication is deliberately not plain duplication — identical
  * replicas would be adversarial, not realistic:
  *  - documents: every token gets a per-replica suffix, so shingles
  *    never collide ACROSS replicas. Near-dup structure is preserved
  *    within each replica, so LSH candidate volume grows linearly
  *    with the corpus (clone-everything would grow it quadratically —
  *    a dedup stress test, not a scale probe).
  *  - embeddings: per-replica circular rotation + alternating sign
  *    flip (norm-preserving, decorrelating) so LSH buckets / IVF
  *    cells don't accumulate identical vectors.
  *  - events/lineitem/orders: id columns shifted per replica (fresh
  *    users/orders; per-key group sizes stay constant, the population
  *    widens — the growth shape of a real log).
  *
  * Run: SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt "runMain graft.ScaleProbe"
  * Writes /tmp/graft_sf1 once (reused if present) and prints one JSON
  * line with per-query seconds at sf0.1 vs the replica and the ratio.
  */
object ScaleProbe {

  private final val IdStride = 1000000000L // replica id offset, > any base id

  /** Fact tables each probe query reads — lets a high-replication run
    * (30×+) build ONLY the tables its probe subset needs instead of
    * paying for a full sf3-class corpus. Dimension tables are always
    * copied (bounded by design).
    */
  private val probeFacts: Map[String, Seq[String]] = Map(
    "q00_flagship_sessionize" -> Seq("events"),
    "q57_skew_salted_agg" -> Seq("events"),
    "q12_agg_ordered_collect" -> Seq("events"),
    "q76_skew_salted_join" -> Seq("events"),
    "q11_agg_hash_groupby" -> Seq("lineitem"),
    "q08_join_shuffle_multiway" -> Seq("lineitem", "orders"),
    "q37_dedup_near_minhash" -> Seq("documents"),
    "q75_dedup_clusters_lsh" -> Seq("documents"),
    "q86_dedup_paragraph" -> Seq("documents"),
    "q94_dedup_paragraph_ingest" -> Seq("documents"),
    "q87_dedup_ingest_batch" -> Seq("documents"),
    "q119_dedup_ingest_sealed" -> Seq("documents"),
    "q43_simsearch_lsh_ann" -> Seq("embeddings"),
    "q49_simsearch_ivf" -> Seq("embeddings"),
    "q91_simsearch_pq" -> Seq("embeddings"),
    "q92_simsearch_ivfpq" -> Seq("embeddings"),
    "q93_simsearch_ivfpq_residual" -> Seq("embeddings"),
    "q77_repetition_stats" -> Seq("documents"),
    "q80_sequence_packing" -> Seq("documents"),
    "q81_decontamination" -> Seq("documents"),
    "q100_perplexity_filter" -> Seq("documents"),
    "q101_importance_resample" -> Seq("documents"),
    "q104_bm25_topk" -> Seq("documents"),
    "q105_source_quota" -> Seq("documents"),
    "q106_bm25_indexed" -> Seq("documents"),
    "q107_dim_reduction" -> Seq("embeddings"),
    "q108_hybrid_rrf" -> Seq("documents", "embeddings"),
    "q117_perplexity_bigram" -> Seq("documents"),
    "q118_simsearch_serving" -> Seq("embeddings"),
    "q122_quality_lr_refined" -> Seq("documents"),
    "q123_sql_session_events" -> Seq("events"),
    "q124_vocab_decode" -> Seq("documents"),
    "q114_simsearch_sealed" -> Seq("embeddings"),
    "q120_simsearch_retrained" -> Seq("embeddings"),
    "q125_corpus_pipeline" -> Seq("documents"),
    "q126_corpus_release" -> Seq("documents"),
    "q129_index_delete" -> Seq("documents", "embeddings"),
    "q130_perplexity_trigram" -> Seq("documents"),
    "q131_dedup_index_delete" -> Seq("documents"),
    "q132_para_index_delete" -> Seq("documents"),
    "q133_perplexity_backoff" -> Seq("documents"),
    "q134_perplexity_kneser_ney" -> Seq("documents"),
    "q135_perplexity_kn_4gram" -> Seq("documents"),
    "q136_schema_evolution" -> Seq("events"),
    "q137_perplexity_kn_5gram" -> Seq("documents"),
    "q138_dedup_simhash_exact" -> Seq("documents"),
    "q139_perplexity_per_lang" -> Seq("documents"))

  private val allFacts =
    Seq("events", "documents", "embeddings", "lineitem", "orders")

  /** Hot-key rewrites for the SKEW replica mode: one key carrying
    * ~20% of the fact table — the one scale dimension decorrelated
    * replication cannot exercise (every replica widens the key
    * population, keeping per-key group sizes constant; real logs
    * concentrate). The hot 20% is chosen by a DETERMINISTIC id gate
    * (ids are uniform mod 5 and the replica stride is a multiple of
    * 5), and the hot key is a BASE-replica key so join probes (q76's
    * customer side, q08's orders side) still match it.
    */
  private final val HotUser = 1L
  private final val HotOrder = 1L

  /** Documents-mode skew fixtures: the dedup family's two hot shapes.
    * `HotPara` is ONE exact 20-token paragraph prepended to ~20% of
    * the corpus (deterministic id gate) — para-hash dedup (q86/q94)
    * then carries one duplicate group holding a fifth of all
    * paragraph instances, the straggler shape of boilerplate at web
    * scale. `HotTemplate` makes ~0.2% of the corpus ONE giant
    * near-dup cluster (shared 100-token template + per-doc unique
    * tail): LSH banding floods that cluster's buckets with
    * QUADRATIC candidate pairs (~1M real pairs for a 1000-doc
    * cluster at 10x — per-mille concentration is already the stress;
    * a 20% cluster would be ~1e9 pairs, an adversarial DoS rather
    * than a probe) and connected components gets one component
    * spanning the whole cluster — template spam, the other real
    * concentration mode. The gates nest (500 is a multiple of 5) so
    * template docs are classified by the template branch first.
    */
  private final val HotPara = (1 to 20).map(t => s"hotpara$t").mkString(" ")
  private final val HotTemplate = (1 to 100).map(t => s"hotdup$t").mkString(" ")

  def buildReplica(spark: SparkSession, src: String, dst: String, repl: Int,
      tables: Set[String] = allFacts.toSet, hotKey: Boolean = false,
      hotDocs: Boolean = false): Unit = {
    def replicate(name: String, f: (DataFrame, Int) => DataFrame): Unit =
      if (tables(name)) {
        val base = spark.read.parquet(s"$src/$name.parquet")
        val out = (0 until repl).map(i => f(base, i)).reduce(_ unionByName _)
        out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
        ()
      }
    val shift = (c: String, i: Int) => col(c) + lit(i.toLong * IdStride)
    def hot(keyCol: String, hotVal: Long)(c: Column): Column =
      if (!hotKey) c
      else when(pmod(col(keyCol), lit(5)) === 0, lit(hotVal)).otherwise(c)
    replicate("events", (df, i) => df
      .withColumn("event_id", shift("event_id", i))
      .withColumn("user_id", hot("event_id", HotUser)(shift("user_id", i))))
    replicate("documents", (df, i) => {
      val base = df
        .withColumn("doc_id", shift("doc_id", i))
        // suffix every token: within-replica similarity intact, zero
        // cross-replica shingle collisions
        .withColumn("text",
          if (i == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", s"$$1x$i"))
      // hot rewrites go AFTER the replica suffix and use UNsuffixed
      // fixture tokens — the hot paragraph/cluster must be identical
      // ACROSS replicas, or each replica would get its own private
      // hot spot and the probe would measure nothing. Gates use the
      // BASE id (IdStride is a multiple of both moduli).
      if (!hotDocs) base else base
        .withColumn("text",
          when(pmod(col("doc_id"), lit(500)) === 0,
            concat(lit(HotTemplate), lit(" uniq"),
              col("doc_id").cast("string")))
          .when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(HotPara), lit(" "), col("text")))
          .otherwise(col("text")))
    })
    replicate("embeddings", (df, i) => df
      .withColumn("vec_id", shift("vec_id", i))
      .withColumn("embedding",
        if (i == 0) col("embedding")
        else {
          val n = size(col("embedding"))
          // rotation amount mod the dimension: repl >= dim would
          // otherwise drive the first slice's length negative and
          // crash the build mid-replica
          val r = pmod(lit(i), n)
          val rot = concat(
            slice(col("embedding"), r + 1, n - r),
            slice(col("embedding"), lit(1), r))
          transform(rot, (x, j) =>
            when(pmod(j + lit(i), lit(2)) === 0, x).otherwise(-x))
        }))
    replicate("lineitem", (df, i) => df
      .withColumn("l_orderkey", hot("l_orderkey", HotOrder)(shift("l_orderkey", i))))
    replicate("orders", (df, i) => df
      .withColumn("o_orderkey", shift("o_orderkey", i))
      .withColumn("o_custkey", shift("o_custkey", i)))
    // dimension tables are bounded by design — copy as-is
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    Bench.quietLogs()
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_SKEW=1: hot-key mode — one user carries ~20% of
    // events (one order ~20% of lineitem) in the replica, the skew
    // dimension the decorrelated build deliberately avoids. Separate
    // default dir + artifact name; the default probe set narrows to
    // the skew-sensitive queries (AQE-reliant q08/q12 vs the declared
    // salted paths q57/q76, with q00's windowed sessionize riding
    // along as the watermark of unsalted per-key work).
    val skew = sys.env.get("SPARK_GRAFT_SKEW").contains("1")
    // SPARK_GRAFT_SKEW=docs: documents-mode skew — one exact
    // paragraph carried by ~20% of a replicated corpus plus one
    // giant near-dup cluster at ~0.2% (see the HotPara/HotTemplate
    // scaladoc). Hot shingle buckets, a fat paragraph-hash group and
    // a giant CC component are the dedup family's skew story, which
    // the events/lineitem hot-key mode cannot reach.
    val skewDocs = sys.env.get("SPARK_GRAFT_SKEW").contains("docs")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      if (skewDocs) "/tmp/graft_sf1_hotdocs"
      else if (skew) "/tmp/graft_sf1_hot" else "/tmp/graft_sf1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBES narrows the probe set (comma-separated query
    // names) — used by the 30× run to chase only the steepest curves
    val probes = sys.env.get("SPARK_GRAFT_PROBES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(if (skewDocs) Seq(
        "q37_dedup_near_minhash", "q75_dedup_clusters_lsh",
        "q86_dedup_paragraph", "q94_dedup_paragraph_ingest",
        "q87_dedup_ingest_batch", "q119_dedup_ingest_sealed")
      else if (skew) Seq(
        "q00_flagship_sessionize", "q08_join_shuffle_multiway",
        "q12_agg_ordered_collect", "q57_skew_salted_agg",
        "q76_skew_salted_join")
      else Seq(
        "q00_flagship_sessionize", "q57_skew_salted_agg",
        "q11_agg_hash_groupby", "q08_join_shuffle_multiway",
        "q37_dedup_near_minhash", "q75_dedup_clusters_lsh",
        "q43_simsearch_lsh_ann", "q49_simsearch_ivf",
        "q91_simsearch_pq", "q92_simsearch_ivfpq",
        "q93_simsearch_ivfpq_residual",
        "q77_repetition_stats", "q80_sequence_packing", "q81_decontamination",
        "q100_perplexity_filter", "q101_importance_resample",
        "q104_bm25_topk", "q105_source_quota", "q106_bm25_indexed",
        "q107_dim_reduction", "q108_hybrid_rrf",
        "q117_perplexity_bigram", "q118_simsearch_serving"))
    val needed = probes.flatMap(p => probeFacts.getOrElse(p, allFacts)).toSet
    // reuse is keyed on the REPLICATION FACTOR too (marker written
    // after a complete build): a run with a new SPARK_GRAFT_REPL must
    // rebuild, not silently time stale data and mislabel the curve —
    // and a build killed mid-write (no marker) is never trusted
    val marker = java.nio.file.Paths.get(
      s"$dst/__repl_${repl}${if (skewDocs) "_hotdocs" else if (skew) "_hot" else ""}")
    if (!java.nio.file.Files.exists(marker) || !needed.forall(t =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dst/$t.parquet")))) {
      System.err.println(s"[scaleprobe] building ${repl}x replica at $dst (${needed.mkString(",")})")
      buildReplica(spark, src, dst, repl, needed, hotKey = skew,
        hotDocs = skewDocs)
      // the replica dir is REWRITTEN IN PLACE when the replication
      // factor changes — retire every persisted memo keyed to it
      // (cluster labels, the q118 serving index), or a probe would
      // silently serve an index built from the previous corpus
      graft.ops.LlmOps.invalidateMemosFor(spark, dst)
      java.nio.file.Files.list(java.nio.file.Paths.get(dst)).forEach { f =>
        if (f.getFileName.toString.startsWith("__repl_") && f != marker)
          java.nio.file.Files.delete(f)
      }
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
      java.nio.file.Files.writeString(marker, s"$repl\n")
      ()
    }
    // a query that errors (OOM at high repl, typo'd SPARK_GRAFT_PROBES
    // name) is skipped with a stderr note, never aborts the run (the
    // Bench rule); its row is simply absent from the record
    def timeAt(dir: String): Map[String, Double] = probes.flatMap { name =>
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[scaleprobe] $name failed at $dir: ${e.getMessage}")
        None
      }
    }.toMap
    // Noise protocol (round 7): single-shot probes proved as
    // stall-poisonable as single-shot benches (two consecutive runs
    // read q37's x10 at 106 s and 48 s against a quiet-window 5.5 s —
    // the measured multi-minute episodic VM stalls, BASELINE.md). Same
    // cure as Bench: interleave whole (small, large) passes and keep
    // each (query, scale) MIN across rounds — one stall episode can
    // poison at most one round's sample — plus a fixed canary per
    // round so any reader can discount a poisoned round wholesale.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "3").toInt
    val canaries = scala.collection.mutable.ListBuffer[Double]()
    def minMerge(a: Map[String, Double], b: Map[String, Double]) =
      (a.keySet ++ b.keySet).map { k =>
        k -> math.min(a.getOrElse(k, Double.MaxValue), b.getOrElse(k, Double.MaxValue))
      }.toMap
    // warmup pass at the small SF initializes codegen/readers
    timeAt(src)
    import org.apache.spark.sql.functions.{col => c, sum => sm}
    def fmt(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // default 10× run keeps the canonical artifact name; other
    // replication factors write alongside it instead of clobbering
    val outName =
      if (skewDocs) s"scale_probe_hotdocs_x$repl.json"
      else if (skew) s"scale_probe_hot_x$repl.json"
      else if (repl == 10) "scale_probe.json"
      else s"scale_probe_x$repl.json"
    // cumulative emission after every round (the kill-survivable
    // Bench rule): an external timeout mid-round leaves the newest
    // complete record instead of nothing after an hour of timing
    def emit(small: Map[String, Double], large: Map[String, Double],
        roundsDone: Int): String = {
      val per = probes.filter(n => small.contains(n) && large.contains(n)).map { n =>
        s""""$n":{"sf01":${fmt(small(n))},"x$repl":${fmt(large(n))},"ratio":${fmt(large(n) / small(n))}}"""
      }.mkString("{", ",", "}")
      val canaryJson = canaries.map(fmt).mkString("[", ",", "]")
      val json = s"""{"metric":"scale_probe","repl":$repl,"rounds":$roundsDone,"canary":$canaryJson,"queries":$per}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outName), json + "\n")
      println(json)
      json
    }
    var small = Map.empty[String, Double]
    var large = Map.empty[String, Double]
    for (r <- 1 to rounds) {
      val c0 = System.nanoTime()
      spark.range(50000000L).agg(sm(c("id"))).collect()
      canaries += (System.nanoTime() - c0) / 1e9
      small = minMerge(small, timeAt(src))
      large = minMerge(large, timeAt(dst))
      emit(small, large, r)
      ()
    }
    spark.stop()
  }
}
