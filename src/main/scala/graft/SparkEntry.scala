package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Features, LlmOps, Relational, Scalars, Streaming}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator appears twice: a Spark implementation in
  * `queries` and (where SQL-expressible and deterministic) a DuckDB
  * oracle in `oracleSql` with IDENTICAL column names, row order, and
  * arithmetic (exact scaled-integer sums; index-ordered double folds;
  * round-then-compare for genuine floats). Ops without an oracle
  * (sinks, approximate/hash-seeded ops, streaming-only semantics) are
  * covered by ScalaTest instead — see src/test/scala/graft.
  */
object SparkEntry {

  /** Flagship on sf0.001 (driver smoke-checks rows>0): gap-based
    * sessionization of the event log — every session with its
    * time-ordered interaction array (no min-size cut so the smoke
    * result is dense; the declared q00 applies the reference's
    * ARRAY_SIZE > 2 extraction filter).
    */
  def entry(spark: SparkSession): DataFrame =
    Features.sessionize(Tables.events(spark, "/root/testdata/sf0.001"), minSize = 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q00_flagship_sessionize" -> Features.q00FlagshipSessionize _,
    "q01_scan_project" -> Relational.q01ScanProject _,
    "q02_bulk_load_csv" -> Relational.q02BulkLoadCsv _,
    "q03_sink_parquet_partitioned" -> Relational.q03SinkParquetPartitioned _,
    "q04_filter_eq_in" -> Relational.q04FilterEqIn _,
    "q05_filter_range_param" -> ((s: SparkSession, d: String) => Relational.q05FilterRangeParam(s, d)),
    "q06_project_compute_alias" -> Relational.q06ProjectComputeAlias _,
    "q07_join_broadcast_top1" -> Relational.q07JoinBroadcastTop1 _,
    "q08_join_shuffle_multiway" -> Relational.q08JoinShuffleMultiway _,
    "q09_join_semi_anti" -> Relational.q09JoinSemiAnti _,
    "q10_join_asof_range" -> Relational.q10JoinAsofRange _,
    "q11_agg_hash_groupby" -> Relational.q11AggHashGroupby _,
    "q12_agg_ordered_collect" -> Relational.q12AggOrderedCollect _,
    "q13_agg_distinct_dupes" -> Relational.q13AggDistinctDupes _,
    "q14_agg_approx_distinct" -> Relational.q14AggApproxDistinct _,
    "q15_rollup_grouping_sets" -> Relational.q15RollupGroupingSets _,
    "q16_window_first_value" -> Relational.q16WindowFirstValue _,
    "q17_window_rank_topk" -> ((s: SparkSession, d: String) => Relational.q17WindowRankTopk(s, d)),
    "q18_window_running_frame" -> Relational.q18WindowRunningFrame _,
    "q19_window_lag_gap" -> Relational.q19WindowLagGap _,
    "q20_orderby_desc_limit1" -> Relational.q20OrderbyDescLimit1 _,
    "q21_global_multisort" -> Relational.q21GlobalMultisort _,
    "q22_union_except_intersect" -> Relational.q22UnionExceptIntersect _,
    "q23_string_normalize" -> Scalars.q23StringNormalize _,
    "q24_json_extract_cast" -> Scalars.q24JsonExtractCast _,
    "q25_date_epoch_funcs" -> Scalars.q25DateEpochFuncs _,
    "q26_array_funcs" -> Scalars.q26ArrayFuncs _,
    "q27_math_stats" -> Scalars.q27MathStats _,
    "q28_uuid_hash_gen" -> Scalars.q28UuidHashGen _,
    "q29_time_split" -> ((s: SparkSession, d: String) => Features.q29TimeSplit(s, d)),
    "q30_vocab_index" -> Features.q30VocabIndex _,
    "q31_hit_rate_at_k" -> Features.q31HitRateAtK _,
    "q32_tumbling_window_agg" -> Streaming.q32TumblingWindowAgg _,
    "q33_sliding_window_agg" -> Streaming.q33SlidingWindowAgg _,
    "q34_session_window" -> Streaming.q34SessionWindow _,
    "q35_watermark_late_dedup" -> Streaming.q35WatermarkLateDedup _,
    "q36_dedup_exact" -> LlmOps.q36DedupExact _,
    "q37_dedup_near_minhash" -> ((s: SparkSession, d: String) => LlmOps.q37DedupNearMinhash(s, d)),
    "q38_similarity_topk" -> ((s: SparkSession, d: String) => LlmOps.q38SimilarityTopk(s, d)),
    "q39_text_analysis" -> LlmOps.q39TextAnalysis _,
    "q40_dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => LlmOps.q40DedupNgramJaccard(s, d)),
    "q41_dedup_simhash" -> ((s: SparkSession, d: String) => LlmOps.q41DedupSimhash(s, d)),
    "q42_dedup_embedding_cosine" -> ((s: SparkSession, d: String) => LlmOps.q42DedupEmbeddingCosine(s, d)),
    "q43_simsearch_lsh_ann" -> ((s: SparkSession, d: String) => LlmOps.q43SimsearchLshAnn(s, d)),
    "q44_text_quality" -> LlmOps.q44TextQuality _,
    "q45_lang_id" -> LlmOps.q45LangId _,
    "q46_token_count_bpe" -> LlmOps.q46TokenCountBpe _,
    "q47_doc_fingerprint" -> LlmOps.q47DocFingerprint _,
    "q48_multimodal_decode" -> LlmOps.q48MultimodalDecode _,
    "q49_simsearch_ivf" -> ((s: SparkSession, d: String) => LlmOps.q49SimsearchIvf(s, d)),
    "q50_multimodal_frames" -> ((s: SparkSession, d: String) => LlmOps.q50MultimodalFrames(s, d)),
    "q51_sources_roundtrip" -> Relational.q51SourcesRoundtrip _,
    "q52_bucketed_join" -> Relational.q52BucketedJoin _,
    "q53_quantiles" -> Scalars.q53Quantiles _,
    "q54_corr_covar" -> Scalars.q54CorrCovar _,
    "q55_session_events_stateful" -> graft.ops.StatefulSessionize.q55SessionEventsStateful _,
    "q56_stream_interval_join" -> Streaming.q56StreamIntervalJoin _,
    "q57_skew_salted_agg" -> graft.ops.Skew.q57SkewSaltedAgg _,
    "q58_pivot" -> Relational.q58Pivot _,
    "q59_merge_upsert" -> Relational.q59MergeUpsert _,
    "q60_pipeline_tensors" -> Features.q60PipelineTensors _,
    "q61_dedup_clusters" -> ((s: SparkSession, d: String) => LlmOps.q61DedupClusters(s, d)),
    "q62_tfidf" -> ((s: SparkSession, d: String) => LlmOps.q62Tfidf(s, d)),
    "q63_deterministic_sample" -> Relational.q63DeterministicSample _,
    "q64_heavy_hitters" -> graft.ops.Sketches.q64HeavyHitters _,
    "q65_stream_topk" -> graft.ops.StatefulTopK.q65StreamTopk _,
    "q66_zorder_curve" -> graft.ops.Layout.q66ZorderCurve _,
    "q67_data_quality_audit" -> graft.ops.Quality.q67DataQualityAudit _,
    "q68_funnel_conversion" -> Features.q68FunnelConversion _,
    "q69_retention_cohorts" -> Features.q69RetentionCohorts _,
    "q70_embedding_centroids" -> LlmOps.q70EmbeddingCentroids _,
    "q71_transition_matrix" -> Features.q71TransitionMatrix _,
    "q72_anomaly_flags" -> ((s: SparkSession, d: String) => Scalars.q72AnomalyFlags(s, d)),
    "q73_dedup_fuzzy" -> ((s: SparkSession, d: String) => LlmOps.q73DedupFuzzy(s, d)),
    "q74_vocab_oov" -> Features.q74VocabOov _,
    "q75_dedup_clusters_lsh" -> ((s: SparkSession, d: String) => LlmOps.q75DedupClustersLsh(s, d)),
    "q76_skew_salted_join" -> graft.ops.Skew.q76SkewSaltedJoin _,
    "q77_repetition_stats" -> ((s: SparkSession, d: String) => LlmOps.q77RepetitionStats(s, d)),
    "q78_pii_redact" -> LlmOps.q78PiiRedact _,
    "q79_stratified_sample" -> ((s: SparkSession, d: String) => LlmOps.q79StratifiedSample(s, d)),
    "q80_sequence_packing" -> ((s: SparkSession, d: String) => LlmOps.q80SequencePacking(s, d)),
    "q81_decontamination" -> ((s: SparkSession, d: String) => LlmOps.q81Decontamination(s, d)),
    "q82_simsearch_quantized" -> ((s: SparkSession, d: String) => LlmOps.q82SimsearchQuantized(s, d)),
    "q83_stream_topk_sketched" -> graft.ops.StatefulTopK.q83StreamTopkSketched _,
    "q84_range_join" -> ((s: SparkSession, d: String) => graft.ops.RangeJoin.q84RangeJoin(s, d)),
    "q85_token_count_bpe_trained" -> ((s: SparkSession, d: String) => graft.ops.Bpe.q85TokenCountBpeTrained(s, d)),
    "q86_dedup_paragraph" -> ((s: SparkSession, d: String) => LlmOps.q86DedupParagraph(s, d)),
    "q87_dedup_ingest_batch" -> ((s: SparkSession, d: String) => LlmOps.q87DedupIngestBatch(s, d)),
    "q88_sequence_packing_bpe" -> ((s: SparkSession, d: String) => graft.ops.Bpe.q88SequencePackingBpe(s, d)),
    "q89_decontamination_bloom" -> ((s: SparkSession, d: String) => LlmOps.q89DecontaminationBloom(s, d)),
    "q90_multimodal_transform" -> LlmOps.q90MultimodalTransform _,
    "q91_simsearch_pq" -> ((s: SparkSession, d: String) => LlmOps.q91SimsearchPq(s, d)),
    "q92_simsearch_ivfpq" -> ((s: SparkSession, d: String) => LlmOps.q92SimsearchIvfPq(s, d)),
    "q93_simsearch_ivfpq_residual" -> ((s: SparkSession, d: String) => LlmOps.q93SimsearchIvfPqResidual(s, d)),
    "q94_dedup_paragraph_ingest" -> ((s: SparkSession, d: String) => LlmOps.q94DedupParagraphIngest(s, d)),
    "q95_boilerplate_freq" -> ((s: SparkSession, d: String) => LlmOps.q95BoilerplateFreq(s, d)),
    "q96_data_mixture" -> ((s: SparkSession, d: String) => LlmOps.q96DataMixture(s, d)),
    "q97_dedup_semantic" -> ((s: SparkSession, d: String) => LlmOps.q97DedupSemantic(s, d)),
    "q98_dedup_substring" -> ((s: SparkSession, d: String) => LlmOps.q98DedupSubstring(s, d)),
    "q99_dedup_resolve" -> ((s: SparkSession, d: String) => LlmOps.q99DedupResolve(s, d)),
    "q100_perplexity_filter" -> ((s: SparkSession, d: String) => LlmOps.q100PerplexityFilter(s, d)),
    "q101_importance_resample" -> ((s: SparkSession, d: String) => LlmOps.q101ImportanceResample(s, d)),
    "q102_training_shards" -> ((s: SparkSession, d: String) => graft.ops.Layout.q102TrainingShards(s, d)),
    "q103_corpus_datacard" -> LlmOps.q103CorpusDatacard _,
    "q104_bm25_topk" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q104Bm25TopK(s, d)),
    "q105_source_quota" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q105SourceQuota(s, d)),
    "q106_bm25_indexed" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q106Bm25Indexed(s, d)),
    "q107_dim_reduction" -> ((s: SparkSession, d: String) => graft.ops.Projection.q107DimReduction(s, d)),
    "q108_hybrid_rrf" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q108HybridRrf(s, d)),
    "q109_bm25_ingest_batch" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q109Bm25IngestBatch(s, d)),
    "q110_negative_sampling" -> ((s: SparkSession, d: String) => Features.q110NegativeSampling(s, d)),
    "q111_simsearch_indexed" -> ((s: SparkSession, d: String) => LlmOps.q111SimsearchIndexed(s, d)),
    "q112_json_schema_projection" -> ((s: SparkSession, d: String) => Scalars.q112JsonSchemaProjection(s, d)),
    "q113_simsearch_ingest_batch" -> ((s: SparkSession, d: String) => LlmOps.q113SimsearchIngestBatch(s, d)),
    "q114_simsearch_sealed" -> ((s: SparkSession, d: String) => LlmOps.q114SimsearchSealed(s, d)),
    "q115_hybrid_rrf_indexed" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q108HybridRrfIndexed(s, d)),
    "q116_bm25_sealed" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q116Bm25Sealed(s, d)),
    "q117_perplexity_bigram" -> ((s: SparkSession, d: String) => LlmOps.q117PerplexityBigram(s, d)),
    "q118_simsearch_serving" -> ((s: SparkSession, d: String) => LlmOps.q118SimsearchServing(s, d)),
    "q119_dedup_ingest_sealed" -> ((s: SparkSession, d: String) => LlmOps.q119DedupIngestSealed(s, d)),
    "q120_simsearch_retrained" -> ((s: SparkSession, d: String) => LlmOps.q120SimsearchRetrained(s, d)),
    "q121_quality_classifier" -> ((s: SparkSession, d: String) => LlmOps.q121QualityClassifier(s, d)),
    "q122_quality_lr_refined" -> ((s: SparkSession, d: String) => LlmOps.q122QualityLrRefined(s, d)),
    "q123_sql_session_events" -> ((s: SparkSession, d: String) => graft.Pipeline.q123SqlSessionEvents(s, d)),
    "q124_vocab_decode" -> ((s: SparkSession, d: String) => Features.q124VocabDecode(s, d)),
    "q125_corpus_pipeline" -> ((s: SparkSession, d: String) => graft.Pipeline.q125CorpusPipeline(s, d)),
    "q126_corpus_release" -> ((s: SparkSession, d: String) => graft.Pipeline.q126CorpusRelease(s, d)),
    "q127_compact_roundtrip" -> ((s: SparkSession, d: String) => Relational.q127CompactRoundtrip(s, d)),
    "q128_versioned_lifecycle" -> ((s: SparkSession, d: String) => Relational.q128VersionedLifecycle(s, d)),
    "q129_index_delete" -> ((s: SparkSession, d: String) => graft.ops.Retrieval.q129IndexDelete(s, d)),
    "q130_perplexity_trigram" -> ((s: SparkSession, d: String) => LlmOps.q130PerplexityTrigram(s, d)),
    "q131_dedup_index_delete" -> ((s: SparkSession, d: String) => LlmOps.q131DedupIndexDelete(s, d)),
    "q132_para_index_delete" -> ((s: SparkSession, d: String) => LlmOps.q132ParaIndexDelete(s, d)),
    "q133_perplexity_backoff" -> ((s: SparkSession, d: String) => LlmOps.q133PerplexityBackoff(s, d)),
    "q134_perplexity_kneser_ney" -> ((s: SparkSession, d: String) => LlmOps.q134PerplexityKneserNey(s, d)),
    "q135_perplexity_kn_4gram" -> ((s: SparkSession, d: String) => LlmOps.q135PerplexityKneserNey4(s, d)),
    "q137_perplexity_kn_5gram" -> ((s: SparkSession, d: String) => LlmOps.q137PerplexityKneserNey5(s, d)),
    "q138_dedup_simhash_exact" -> ((s: SparkSession, d: String) => LlmOps.q138DedupSimhashExact(s, d)),
    "q139_perplexity_per_lang" -> ((s: SparkSession, d: String) => LlmOps.q139PerplexityPerLang(s, d)),
    "q136_schema_evolution" -> ((s: SparkSession, d: String) => Relational.q136SchemaEvolution(s, d))
  )

  /** DuckDB oracle SQL per query (same parquet tables registered by
    * name). Omitted: q02/q03 (sinks, smoke-only), q14 (approximate),
    * q37/q41/q43 (xxhash64-seeded candidate generation — verified in
    * ScalaTest against exact twins q40/q47/q38), q48 (binary media),
    * q85/q88 (iterative trained-BPE encoding is not SQL-expressible —
    * BpeSpec carries the semantics), q97 (k-means-seeded cells — the
    * q49 rule; LlmOpsSpec recomputes the screen brute-force).
    * Round 8 moved q82 (integer-exact quantization), q99 (now rides
    * q61's exact closure), q02/q03 (the sink READ-BACK result is
    * exact — the oracle gates the round-trip, the q109 argument),
    * q111 and q112 ONTO the gate. q41 was evaluated and correctly
    * stays off: its hamming-0 pairs are REAL near-dups with different
    * token multisets (measured: 4/4 at sf0.01), so no multiset-based
    * SQL mirror exists — the hash-seeded omission stands. Round 9
    * adds q118 (realistic-params pruned ANN probe — approximate by
    * construction, the q49 rule; recall spec-pinned ≥ q92, and its
    * bench line times the warm pruned probe against the memoized
    * index) and q122 (iterative hashed-LR refinement of q121 —
    * ITERATIVE float training, the q97/k-means rule; LlmOpsSpec pins
    * a deterministic planted-token separation law and the
    * theorem-backed monotone training loss). q121 itself — the
    * closed-form Naive-Bayes log-count-ratio tier — IS oracled: its
    * per-token weights micro-round once (the q101 Δbits rule) and
    * everything downstream is integer arithmetic.
    *
    * ORACLE-AUTHORING RULE for composed/stage-chained CTE oracles
    * (q125, q126): mark every CTE referenced more than once — or
    * referenced by a scalar count subquery — `AS MATERIALIZED`.
    * DuckDB inlines non-recursive CTEs PER REFERENCE, so each
    * `(SELECT count(*) FROM stage_k)` re-instantiates the entire
    * upstream chain; on q125's oracle that re-inlining blew DuckDB
    * past 20 GB at sf0.1, and the hints brought it to 3.4 s (commit
    * e5d3c3c). The hint is semantically transparent — same rows,
    * bounded memory.
    */
  /** Exact top-k cosine over the embeddings table — q38's oracle,
    * SHARED by q111 (persisted-index probe): declared exhaustive
    * (nProbe = nCells, lossless prefilter), the index path's rerank
    * emits exactly these rows — the q106-shares-q104 argument; the
    * gate proves the write→read round-trip loses nothing.
    */
  private val simsearchOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
      |s AS (SELECT query_id, e.vec_id AS neighbor_id,
      |round(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
      |(sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))) *
      |sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))), 6) AS cos
      |FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rnk FROM s)
      |SELECT query_id, rnk, neighbor_id, cos FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  private val decontaminationOracle: String =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' AS is_train FROM documents),
      |sh AS (SELECT DISTINCT doc_id, is_train, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS shingle
      |FROM (SELECT doc_id, is_train, toks, unnest(range(1, len(toks) - 1)) AS i FROM docs WHERE len(toks) >= 3) x),
      |tr AS (SELECT DISTINCT shingle FROM sh WHERE is_train),
      |te AS (SELECT doc_id, shingle FROM sh WHERE NOT is_train),
      |ov AS (SELECT doc_id, count(*) AS n_overlap FROM te JOIN tr USING (shingle) GROUP BY 1),
      |n AS (SELECT doc_id, count(*) AS n_shingles FROM te GROUP BY 1)
      |SELECT n.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles, CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
      |CAST((COALESCE(ov.n_overlap, 0) * 1000) // n_shingles AS INTEGER) AS overlap_milli,
      |CAST(((COALESCE(ov.n_overlap, 0) * 1000) // n_shingles) >= 100 AS INTEGER) AS contaminated
      |FROM n LEFT JOIN ov ON n.doc_id = ov.doc_id ORDER BY n.doc_id""".stripMargin

  private val paragraphDedupOracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |paras AS (SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
      |array_to_string(t[(CAST(i AS INTEGER) * 20 + 1):(CAST(i AS INTEGER) * 20 + 20)], ' ') AS para
      |FROM (SELECT doc_id, t, unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS i FROM toks) x),
      |ranked AS (SELECT doc_id, para_idx, para,
      |row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM paras)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
      |CAST(COALESCE(SUM(CASE WHEN rn = 1 THEN 1 END), 0) AS BIGINT) AS n_kept,
      |COALESCE(string_agg(CASE WHEN rn = 1 THEN para END, ' ' ORDER BY para_idx), '') AS clean_text
      |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared BM25 CTE chain (corpus stats, tf-with-dl, df, the
    * deterministic query set, micro-rounded contributions, per-pair
    * score) — ONE definition, so the q104 oracle and the queries that
    * share it by structural exactness (q106's pruned-index probe,
    * q109's batch-ingest-built index, q108's lexical leg) can never
    * drift apart. The full q104 text below adds only the rank window.
    */
  private val bm25OracleCtes: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS total FROM d),
      |tf2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, tok, CAST(count(*) AS BIGINT) AS tf
      |FROM (SELECT doc_id, toks, unnest(toks) AS tok FROM d) x GROUP BY doc_id, dl, tok),
      |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY tok),
      |qd AS (SELECT doc_id AS query_id, toks FROM d WHERE doc_id % 97 = 0 ORDER BY doc_id LIMIT 8),
      |qt AS (SELECT DISTINCT query_id, unnest(toks[1:4]) AS tok FROM qd),
      |m AS (SELECT qt.query_id, tf2.doc_id,
      |CAST(round(ln((CAST(st.n_docs AS DOUBLE) - dft.df + 0.5) / (dft.df + 0.5) + 1.0) * (tf2.tf * (1.2 + 1.0)) / (tf2.tf + 1.2 * ((1.0 - 0.75) + (0.75 * tf2.dl) / (CAST(st.total AS DOUBLE) / st.n_docs))) * 1000000.0) AS BIGINT) AS contrib
      |FROM tf2 JOIN qt USING (tok) JOIN dft USING (tok), st),
      |sc AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_micro FROM m GROUP BY query_id, doc_id)""".stripMargin

  /** Shared trigram-LM CTE chain (reference token stream, the three
    * TakeOrdered-bounded tables voc/bi/tri, the scored corpus's
    * per-token (cur, prev, prev2) stream) — ONE definition composed
    * by the q130 (interpolated) and q133 (stupid-backoff) oracles, so
    * the two scoring declarations share exactly one model fit.
    */
  private val trigramLmOracleCtes: String =
    """WITH ref AS MATERIALIZED (SELECT string_split(text, ' ') AS toks FROM documents WHERE source = 'src0'),
      |rt AS (SELECT unnest(toks) AS tok FROM ref),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rt),
      |voc AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM rt GROUP BY tok ORDER BY c DESC, tok ASC LIMIT 4096),
      |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
      |bi AS MATERIALIZED (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb FROM
      |(SELECT toks[i] AS prev, toks[i + 1] AS cur FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM ref) x) y
      |JOIN voc vv ON y.prev = vv.tok
      |GROUP BY prev, cur ORDER BY cb DESC, prev ASC, cur ASC LIMIT 16384),
      |tri AS MATERIALIZED (SELECT y.p2 AS p2, y.p1 AS p1, y.cur AS cur, CAST(count(*) AS BIGINT) AS ct FROM
      |(SELECT toks[i] AS p2, toks[i + 1] AS p1, toks[i + 2] AS cur FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM ref) x) y
      |JOIN bi bb ON y.p2 = bb.prev AND y.p1 = bb.cur
      |GROUP BY y.p2, y.p1, y.cur ORDER BY ct DESC, y.p2 ASC, y.p1 ASC, y.cur ASC LIMIT 32768),
      |tk AS (SELECT doc_id, lang, toks, unnest(range(1, len(toks) + 1)) AS p FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents) d),
      |tok AS (SELECT doc_id, lang, toks[p] AS cur, CASE WHEN p > 1 THEN toks[p - 1] END AS prev, CASE WHEN p > 2 THEN toks[p - 2] END AS prev2 FROM tk)""".stripMargin

  /** q135's oracle extends [[trigramLmOracleCtes]] one order: the
    * bounded fourgram table (context = in-table trigram, the fit
    * invariant one order up) and a `tok4` view carrying prev3. The
    * scoring expression is COMPOSED from nested-CASE building blocks
    * (pcont → pbi → ptri → pquad) so the DuckDB tree matches the
    * Spark when/otherwise tree token-for-token at every tier — the
    * q134 SQL's hand-inlined nesting, generated instead of typed.
    */
  private val fourgramLmOracleCtes: String = trigramLmOracleCtes + ",\n" +
    """quad AS MATERIALIZED (SELECT y.p3 AS p3, y.p2 AS p2, y.p1 AS p1, y.cur AS cur, CAST(count(*) AS BIGINT) AS cq FROM
      |(SELECT toks[i] AS p3, toks[i + 1] AS p2, toks[i + 2] AS p1, toks[i + 3] AS cur FROM (SELECT toks, unnest(range(1, len(toks) - 2)) AS i FROM ref) x) y
      |JOIN tri tt ON y.p3 = tt.p2 AND y.p2 = tt.p1 AND y.p1 = tt.cur
      |GROUP BY y.p3, y.p2, y.p1, y.cur ORDER BY cq DESC, y.p3 ASC, y.p2 ASC, y.p1 ASC, y.cur ASC LIMIT 65536),
      |tok4 AS (SELECT doc_id, lang, toks[p] AS cur, CASE WHEN p > 1 THEN toks[p - 1] END AS prev, CASE WHEN p > 2 THEN toks[p - 2] END AS prev2, CASE WHEN p > 3 THEN toks[p - 3] END AS prev3 FROM tk)""".stripMargin

  private val kn4Pcont: String =
    "(COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)"
  private val kn4Pbi: String =
    "CASE WHEN bi.cb IS NOT NULL THEN (bi.cb - 0.75) / vp.c + (0.75 * f1.f1 / vp.c) * (" +
      kn4Pcont + ") WHEN f1.f1 IS NOT NULL THEN (0.75 * f1.f1 / vp.c) * (" +
      kn4Pcont + ") ELSE " + kn4Pcont + " END"
  private val kn4Ptri: String =
    "CASE WHEN tri.ct IS NOT NULL THEN (tri.ct - 0.75) / bc.cb + (0.75 * f2.f2 / bc.cb) * (" +
      kn4Pbi + ") WHEN f2.f2 IS NOT NULL THEN (0.75 * f2.f2 / bc.cb) * (" +
      kn4Pbi + ") ELSE (" + kn4Pbi + ") END"
  private val kn4Pquad: String =
    "CASE WHEN quad.cq IS NOT NULL THEN (quad.cq - 0.75) / tc.ct + (0.75 * f3.f3 / tc.ct) * (" +
      kn4Ptri + ") WHEN f3.f3 IS NOT NULL THEN (0.75 * f3.f3 / tc.ct) * (" +
      kn4Ptri + ") ELSE (" + kn4Ptri + ") END"
  private def kn4Bits(p: String): String =
    "CAST(round(-log2(" + p + ") * 1000000.0) AS BIGINT)"

  /** q137's oracle extends [[fourgramLmOracleCtes]] one order: the
    * bounded fivegram table (context = in-table fourgram) and a
    * `tok5` view carrying prev4. The kn4 nested-CASE blocks compose
    * unchanged underneath the quint tier — same table aliases, one
    * more rung.
    */
  private val fivegramLmOracleCtes: String = fourgramLmOracleCtes + ",\n" +
    """quint AS MATERIALIZED (SELECT y.p4 AS p4, y.p3 AS p3, y.p2 AS p2, y.p1 AS p1, y.cur AS cur, CAST(count(*) AS BIGINT) AS c5 FROM
      |(SELECT toks[i] AS p4, toks[i + 1] AS p3, toks[i + 2] AS p2, toks[i + 3] AS p1, toks[i + 4] AS cur FROM (SELECT toks, unnest(range(1, len(toks) - 3)) AS i FROM ref) x) y
      |JOIN quad qq ON y.p4 = qq.p3 AND y.p3 = qq.p2 AND y.p2 = qq.p1 AND y.p1 = qq.cur
      |GROUP BY y.p4, y.p3, y.p2, y.p1, y.cur ORDER BY c5 DESC, y.p4 ASC, y.p3 ASC, y.p2 ASC, y.p1 ASC, y.cur ASC LIMIT 131072),
      |tok5 AS (SELECT doc_id, lang, toks[p] AS cur, CASE WHEN p > 1 THEN toks[p - 1] END AS prev, CASE WHEN p > 2 THEN toks[p - 2] END AS prev2, CASE WHEN p > 3 THEN toks[p - 3] END AS prev3, CASE WHEN p > 4 THEN toks[p - 4] END AS prev4 FROM tk)""".stripMargin

  private val kn5Pquint: String =
    "CASE WHEN quint.c5 IS NOT NULL THEN (quint.c5 - 0.75) / qc.cq + (0.75 * f4.f4 / qc.cq) * (" +
      kn4Pquad + ") WHEN f4.f4 IS NOT NULL THEN (0.75 * f4.f4 / qc.cq) * (" +
      kn4Pquad + ") ELSE (" + kn4Pquad + ") END"

  /** q138's oracle, GENERATED like the kn blocks: the md5-derived
    * SimHash signature as 64 integer bit-sums (hex digit d, bit b →
    * column s{d*4+b}), assembled into (lo, hi) halves, then
    * brute-force all-pairs Hamming — the pigeonhole on the Spark side
    * is candidate generation only, so brute force IS the semantic
    * mirror.
    */
  private val simhashExactOracle: String = {
    val hd = (0 until 16).map(d =>
      s"strpos('0123456789abcdef', substring(h, ${d + 1}, 1)) - 1 AS hd$d")
    val sums = (for (d <- 0 until 16; b <- 0 until 4) yield
      s"SUM(CASE WHEN (hd$d // ${1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s${d * 4 + b}")
    val lo = (0 until 32)
      .map(i => s"CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    val hi = (32 until 64)
      .map(i => s"CASE WHEN s$i > 0 THEN ${1L << (i - 32)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, md5(tok) AS h FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) x),
       |dg AS (SELECT doc_id, ${hd.mkString(", ")} FROM t),
       |s AS MATERIALIZED (SELECT doc_id, ${sums.mkString(", ")} FROM dg GROUP BY doc_id),
       |f AS MATERIALIZED (SELECT doc_id, CAST($lo AS BIGINT) AS lo, CAST($hi AS BIGINT) AS hi FROM s)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS hamming
       |FROM f a JOIN f b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val bm25Oracle: String = bm25OracleCtes + ",\n" +
    """r AS (SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank, score_micro FROM sc)
      |SELECT query_id, doc_id, rank, score_micro FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** The q125 corpus-prep stage chain (exact dedup -> paragraph strip
    * -> exact near-dup closure -> quality -> LM gate -> decontamination
    * -> train gate) as shared DuckDB CTEs ending at `tr` (the cleaned
    * corpus + its is_train split) -- ONE definition composed by the
    * q125 oracle (mixture + shard tail) and the q126 oracle (release
    * read-back tail), so the two gated declarations of the same chain
    * can never drift. Every multi-referenced CTE is AS MATERIALIZED
    * (the oracle-authoring rule above).
    */
  private val corpusChainCtes: String =
    """WITH RECURSIVE
      |d0 AS MATERIALIZED (SELECT doc_id, lang, source, text FROM documents WHERE doc_id < 5000),
      |ek AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM d0 GROUP BY text),
      |e AS MATERIALIZED (SELECT d0.doc_id, d0.lang, d0.source, d0.text FROM d0 JOIN ek USING (doc_id)),
      |ptoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM e),
      |paras AS (SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
      |array_to_string(t[(CAST(i AS INTEGER) * 20 + 1):(CAST(i AS INTEGER) * 20 + 20)], ' ') AS para
      |FROM (SELECT doc_id, t, unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS i FROM ptoks) x),
      |pranked AS (SELECT doc_id, para_idx, para,
      |row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM paras),
      |ctext AS (SELECT doc_id, COALESCE(string_agg(CASE WHEN rn = 1 THEN para END, ' ' ORDER BY para_idx), '') AS text
      |FROM pranked GROUP BY doc_id),
      |c AS MATERIALIZED (SELECT e.doc_id, e.lang, e.source, ct.text FROM e JOIN ctext ct ON e.doc_id = ct.doc_id WHERE length(ct.text) > 0),
      |sh AS (SELECT DISTINCT doc_id, sp[p] || ' ' || sp[p+1] || ' ' || sp[p+2] AS shingle
      |FROM (SELECT doc_id, sp, unnest(range(1, len(sp) - 1)) AS p FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM c) t0 WHERE len(sp) >= 3) t1),
      |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |j AS (SELECT doc_a, doc_b FROM pr JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id WHERE CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) >= 0.5),
      |ed AS (SELECT doc_a AS a, doc_b AS b FROM j UNION ALL SELECT doc_b, doc_a FROM j),
      |reach(n, r) AS (SELECT doc_id, doc_id FROM c UNION SELECT ed.b, reach.r FROM reach JOIN ed ON ed.a = reach.n),
      |cl AS (SELECT n AS doc_id, min(r) AS component FROM reach GROUP BY n),
      |nr AS MATERIALIZED (SELECT c.doc_id, c.lang, c.source, c.text FROM c JOIN cl ON c.doc_id = cl.doc_id WHERE cl.component = c.doc_id),
      |qt AS (SELECT doc_id, lang, source, text, string_split(text, ' ') AS toks FROM nr),
      |qb AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |len(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS tb,
      |len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS db FROM qt),
      |qtop AS (SELECT doc_id, max(cnt) AS top_n FROM (SELECT doc_id, tok, count(*) AS cnt FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM nr) z GROUP BY doc_id, tok) y GROUP BY doc_id),
      |qual AS MATERIALIZED (SELECT qt.doc_id, qt.lang, qt.source, qt.text FROM qt JOIN qb USING (doc_id) JOIN qtop USING (doc_id)
      |WHERE qb.n_tokens >= 5 AND ((qb.tb - qb.db) * 1000) // greatest(qb.tb, 1) <= 300 AND (qtop.top_n * 1000) // qb.n_tokens <= 200),
      |ref AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents WHERE source = 'src0'),
      |rn0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
      |voc AS (SELECT tok, count(*) AS c FROM ref GROUP BY tok ORDER BY c DESC, tok ASC LIMIT 4096),
      |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
      |lm AS (SELECT tok, CAST(round(-log2((c + 1.0) / (rn0.n + vv.v + 1)) * 1000000.0) AS BIGINT) AS bits FROM voc, rn0, vv),
      |oovb AS (SELECT CAST(round(-log2(1.0 / (rn0.n + vv.v + 1)) * 1000000.0) AS BIGINT) AS bits FROM rn0, vv),
      |ptk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM qual),
      |psc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, CAST(SUM(COALESCE(lm.bits, (SELECT bits FROM oovb))) AS BIGINT) AS bits_micro FROM ptk LEFT JOIN lm USING (tok) GROUP BY doc_id),
      |ppl AS MATERIALIZED (SELECT qual.doc_id, qual.lang, qual.source, qual.text FROM qual JOIN psc USING (doc_id) WHERE psc.bits_micro < 4940000 * psc.n_tokens),
      |esh AS (SELECT DISTINCT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |FROM (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id % 13 = 0) w WHERE len(toks) >= 3) x),
      |tsh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM ppl) w WHERE len(toks) >= 3) y),
      |ovl AS (SELECT doc_id, count(*) AS n_overlap FROM tsh JOIN esh USING (shingle) GROUP BY doc_id),
      |tnn AS (SELECT doc_id, count(*) AS n_sh FROM tsh GROUP BY doc_id),
      |flagged AS (SELECT tnn.doc_id FROM tnn LEFT JOIN ovl USING (doc_id) WHERE (COALESCE(ovl.n_overlap, 0) * 1000) // tnn.n_sh >= 700),
      |dec AS MATERIALIZED (SELECT ppl.doc_id, ppl.lang, ppl.source, ppl.text FROM ppl WHERE ppl.doc_id NOT IN (SELECT doc_id FROM flagged)),
      |qqm AS (SELECT doc_id, source, CAST(round(least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * (1.0 - CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to'], x))) AS DOUBLE) / len(toks)) * 1000.0) AS BIGINT) AS q_milli FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM dec) z),
      |qqr AS (SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY q_milli DESC, doc_id) AS qrank FROM qqm),
      |quo AS MATERIALIZED (SELECT dec.doc_id, dec.lang, dec.source, dec.text FROM dec JOIN qqr USING (doc_id) WHERE qqr.qrank <= 12),
      |tr AS MATERIALIZED (SELECT doc_id, lang, source, text, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' AS is_train FROM quo)""".stripMargin

  /** q87's oracle (batch-sequential LSH ingest at threshold 1.0 ==
    * global first-occurrence dedup by identical shingle set), SHARED
    * by q119 (seal inserted before the final batch — a pure relayout
    * admission cannot observe).
    */
  private val dedupIngestOracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |fp AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
      |array_to_string(list_sort(list_distinct(list_transform(range(1, len(t) - 1),
      |i -> array_to_string(t[CAST(i AS INTEGER):(CAST(i AS INTEGER) + 2)], ' ')))), chr(31)) END AS f
      |FROM toks),
      |keep AS (SELECT doc_id, CASE WHEN f IS NULL THEN doc_id
      |ELSE min(doc_id) OVER (PARTITION BY f) END AS keeper FROM fp),
      |b AS (SELECT COALESCE(max(doc_id), -1) // 3 + 1 AS sz FROM documents)
      |SELECT doc_id, CAST(doc_id // (SELECT GREATEST(sz, 1) FROM b) AS BIGINT) AS batch_id
      |FROM keep WHERE doc_id = keeper ORDER BY doc_id""".stripMargin

  /** RRF fusion of the q104 lexical CTEs and a q38-style dense cosine
    * leg — q108's oracle, SHARED by q115 (dense leg served from the
    * persisted PQ index at the exhaustive declaration: identical rank
    * lists ⇒ identical fusion, since rrfFuse sees only ranks).
    */
  private val hybridRrfOracle: String = bm25OracleCtes + ",\n" +
    """lex AS (SELECT query_id, doc_id, lrank FROM (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS lrank FROM sc) t WHERE lrank <= 10),
      |qe AS (SELECT qd.query_id, e.embedding AS qv FROM qd JOIN embeddings e ON e.vec_id = qd.query_id),
      |dc AS (SELECT qe.query_id, e.vec_id AS doc_id,
      |round(list_sum(list_transform(range(1, 65), i -> CAST(qe.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
      |(sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe.qv[i] AS DOUBLE) * CAST(qe.qv[i] AS DOUBLE)))) *
      |sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))), 6) AS cos
      |FROM embeddings e CROSS JOIN qe),
      |den AS (SELECT query_id, doc_id, drank FROM (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS drank FROM dc) t WHERE drank <= 10),
      |u AS (SELECT COALESCE(lex.query_id, den.query_id) AS query_id, COALESCE(lex.doc_id, den.doc_id) AS doc_id,
      |COALESCE(CAST(round(1000000.0 / (60 + lex.lrank)) AS BIGINT), 0) + COALESCE(CAST(round(1000000.0 / (60 + den.drank)) AS BIGINT), 0) AS rrf_micro
      |FROM lex FULL OUTER JOIN den ON lex.query_id = den.query_id AND lex.doc_id = den.doc_id),
      |f AS (SELECT query_id, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro, CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS INTEGER) AS rank FROM u)
      |SELECT query_id, doc_id, rrf_micro, rank FROM f WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q00_flagship_sessionize" ->
      """WITH f AS (SELECT user_id, event_id, ts, epoch_ms(ts) AS tms FROM events WHERE event_type IN ('click','view','purchase')),
        |g AS (SELECT *, CASE WHEN lag(tms) OVER w IS NULL OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g)
        |SELECT user_id, session_idx, min(ts) AS session_start, string_agg(CAST(event_id AS VARCHAR), '|' ORDER BY ts, event_id) AS interactions
        |FROM s GROUP BY user_id, session_idx HAVING count(*) > 2 ORDER BY user_id, session_idx""".stripMargin,
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem ORDER BY l_orderkey, l_linenumber",
    // q02: the CSV round-trip must reproduce the source table exactly
    // (header+quoteAll write, explicit-schema read). Longs/strings are
    // textual round-trips by construction; doubles round-trip because
    // the writer emits shortest-uniquely-parsing decimal.
    "q02_bulk_load_csv" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin,
    // q03: the partitioned-sink read-back per-date counts equal the
    // source's — gates that the repartition+partitionBy write and the
    // schema-pinned read lose no rows (the q109 sink-gate argument).
    "q03_sink_parquet_partitioned" ->
      """SELECT CAST(ts AS DATE) AS event_date, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_date ORDER BY event_date""".stripMargin,
    "q04_filter_eq_in" ->
      "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey",
    "q05_filter_range_param" ->
      "SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE o_orderstatus = 'O' AND o_orderdate > TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate <= TIMESTAMP '1999-01-01 00:00:00' AND len(string_split(o_orderpriority,'-')) = 2 ORDER BY o_orderdate, o_orderkey",
    "q06_project_compute_alias" ->
      "SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_cents, CAST(year(l_shipdate) AS INTEGER) AS ship_year, l_returnflag || '-' || l_linestatus AS flag_status FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q07_join_broadcast_top1" ->
      """WITH latest AS (SELECT CAST(ts AS DATE) AS max_date FROM events ORDER BY max_date DESC LIMIT 1)
        |SELECT e.event_id, e.user_id, e.event_type, CAST(e.ts AS DATE) AS event_date
        |FROM events e JOIN latest l ON CAST(e.ts AS DATE) = l.max_date ORDER BY e.event_id""".stripMargin,
    "q08_join_shuffle_multiway" ->
      """SELECT n_name, CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q09_join_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS tag FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS tag FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY tag, c_custkey""".stripMargin,
    "q10_join_asof_range" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, event_id, event_type FROM events WHERE event_type IN ('view','purchase')),
        |v AS (SELECT user_id, tms, max(event_id) AS v_id, CAST(NULL AS BIGINT) AS p_id, 0 AS is_p FROM e WHERE event_type = 'view' GROUP BY user_id, tms),
        |p AS (SELECT user_id, tms, CAST(NULL AS BIGINT) AS v_id, event_id AS p_id, 1 AS is_p FROM e WHERE event_type = 'purchase'),
        |u AS (SELECT * FROM v UNION ALL SELECT * FROM p),
        |c AS (SELECT user_id, p_id, is_p, last_value(v_id IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tms, is_p ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_view_id FROM u)
        |SELECT user_id, p_id AS purchase_id, COALESCE(prior_view_id, -1) AS prior_view_id FROM c WHERE is_p = 1 ORDER BY user_id, purchase_id""".stripMargin,
    "q11_agg_hash_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |CAST(count(*) AS BIGINT) AS count_order,
        |CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_agg_ordered_collect" ->
      """SELECT user_id, CAST(ts AS DATE) AS event_date, string_agg(CAST(event_id AS VARCHAR), '|' ORDER BY ts, event_id) AS interactions, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id, event_date ORDER BY user_id, event_date""".stripMargin,
    "q13_agg_distinct_dupes" ->
      "SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey",
    "q15_rollup_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,
    "q16_window_first_value" ->
      "SELECT event_id, user_id, first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event_id FROM events ORDER BY event_id",
    "q17_window_rank_topk" ->
      """SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q18_window_running_frame" ->
      "SELECT event_id, user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents FROM events ORDER BY event_id",
    "q19_window_lag_gap" ->
      "SELECT event_id, user_id, COALESCE(epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_ms FROM events ORDER BY event_id",
    "q20_orderby_desc_limit1" ->
      "SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1",
    "q21_global_multisort" ->
      "SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber FROM lineitem ORDER BY l_returnflag, l_shipdate, l_orderkey, l_linenumber",
    "q22_union_except_intersect" ->
      """WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |closed_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM closed_c) a
        |UNION ALL SELECT o_custkey, 'only_open' AS tag FROM (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM closed_c) b
        |UNION ALL SELECT o_custkey, 'only_closed' AS tag FROM (SELECT o_custkey FROM closed_c EXCEPT SELECT o_custkey FROM open_c) c
        |ORDER BY tag, o_custkey""".stripMargin,
    "q23_string_normalize" ->
      "SELECT p_partkey, replace(lower(p_name), ' ', '_') AS sku, array_to_string(string_split(p_name, ' '), '|') AS joined, upper(p_brand) AS brand_uc FROM part ORDER BY p_partkey",
    "q24_json_extract_cast" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val, json_extract_string(props, '$.missing') AS missing_val FROM events ORDER BY event_id",
    "q25_date_epoch_funcs" ->
      "SELECT event_id, CAST(ts AS DATE) AS event_date, strftime(ts, '%Y-%m-%d') AS date_str, ts > TIMESTAMP '2024-01-15 00:00:00' AS is_late, epoch_ms(ts) AS epoch_ms FROM events ORDER BY event_id",
    "q26_array_funcs" ->
      """WITH a AS (SELECT user_id, CAST(ts AS DATE) AS event_date, array_agg(event_id ORDER BY ts, event_id) AS a FROM events GROUP BY user_id, event_date)
        |SELECT user_id, event_date, CAST(len(a) AS INTEGER) AS n,
        |COALESCE(array_to_string(a[1:len(a)-1], '|'), '') AS all_but_last, a[len(a)] AS last_el,
        |COALESCE(array_to_string(list_concat(list_transform(range(greatest(0, 20 - len(a))), x -> CAST(0 AS BIGINT)), a[greatest(1, len(a) - 19):len(a)]), '|'), '') AS padded
        |FROM a ORDER BY user_id, event_date""".stripMargin,
    "q27_math_stats" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS cnt, SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS qs,
        |SUM(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS qsq,
        |min(l_quantity) AS min_qty, max(l_quantity) AS max_qty FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(cnt AS BIGINT) AS cnt, CAST(qs AS DOUBLE) / 100.0 AS sum_qty,
        |CAST(qs AS DOUBLE) / 100.0 / cnt AS avg_qty,
        |sqrt((CAST(qsq AS DOUBLE) / 10000.0 - (CAST(qs AS DOUBLE) / 100.0) * (CAST(qs AS DOUBLE) / 100.0) / cnt) / (cnt - 1)) AS std_qty,
        |min_qty, max_qty FROM s ORDER BY l_returnflag""".stripMargin,
    "q28_uuid_hash_gen" ->
      "SELECT doc_id, sha256(text) AS content_sha, source || '-' || doc_id AS stamp FROM documents ORDER BY doc_id",
    "q29_time_split" ->
      "SELECT o_orderkey, CASE WHEN percent_rank() OVER (ORDER BY o_orderdate, o_orderkey) < 0.9 THEN 'train' ELSE 'test' END AS split FROM orders ORDER BY o_orderkey",
    "q30_vocab_index" ->
      """WITH tok AS (SELECT doc_id, p - 1 AS pos, sp[p] AS token FROM (SELECT doc_id, sp, unnest(range(1, len(sp) + 1)) AS p FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents) t0) t1),
        |vocab AS (SELECT token, CAST(row_number() OVER (ORDER BY count(*) DESC, token ASC) AS INTEGER) AS id FROM tok GROUP BY token),
        |enc AS (SELECT t.doc_id, string_agg(CAST(v.id AS VARCHAR), '|' ORDER BY t.pos) AS ids FROM tok t JOIN vocab v ON t.token = v.token GROUP BY t.doc_id)
        |SELECT doc_id, ids FROM enc ORDER BY doc_id""".stripMargin,
    "q31_hit_rate_at_k" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |CAST(SUM(CASE WHEN list_contains([CAST(vec_id % 10 AS INTEGER), CAST((vec_id + 3) % 10 AS INTEGER), CAST((vec_id + 7) % 10 AS INTEGER)], label) THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS hr_at_k
        |FROM embeddings""".stripMargin,
    "q32_tumbling_window_agg" ->
      "SELECT date_trunc('day', ts) AS ws, CAST(count(*) AS BIGINT) AS n, CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents FROM events GROUP BY ws ORDER BY ws",
    "q33_sliding_window_agg" ->
      """SELECT make_timestamp((epoch_ms(ts) // 900000) * 900000000 - CAST(k AS BIGINT) * 900000000) AS ws, CAST(count(*) AS BIGINT) AS n
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) t GROUP BY ws ORDER BY ws""".stripMargin,
    "q34_session_window" ->
      """WITH g AS (SELECT user_id, ts, event_id, CASE WHEN lag(epoch_us(ts)) OVER w IS NULL OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q35_watermark_late_dedup" ->
      """SELECT CAST(min(event_id) AS BIGINT) AS event_id, user_id, epoch_ms(ts) AS ts_ms, CAST(count(*) AS BIGINT) AS n_dupes
        |FROM events GROUP BY user_id, ts_ms ORDER BY user_id, ts_ms""".stripMargin,
    "q36_dedup_exact" ->
      "SELECT sha256(text) AS content_sha, CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY content_sha ORDER BY content_sha",
    "q38_similarity_topk" -> simsearchOracle,
    "q39_text_analysis" ->
      """SELECT lang, token, CAST(count(*) AS BIGINT) AS n FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY lang, token ORDER BY lang, token""".stripMargin,
    "q40_dedup_ngram_jaccard" ->
      """WITH sh AS (SELECT DISTINCT doc_id, sp[p] || ' ' || sp[p+1] || ' ' || sp[p+2] AS shingle
        |FROM (SELECT doc_id, sp, unnest(range(1, len(sp) - 1)) AS p FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents WHERE doc_id < 5000) t0 WHERE len(sp) >= 3) t1),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) AS jaccard FROM pr JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id)
        |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM j WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "q42_dedup_embedding_cosine" ->
      """WITH p AS (SELECT vec_id AS va, embedding AS ea FROM embeddings WHERE vec_id < 200),
        |s AS (SELECT va, e.vec_id AS vb,
        |round(list_sum(list_transform(range(1, 65), i -> CAST(ea[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
        |(sqrt(list_sum(list_transform(range(1, 65), i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE)))) *
        |sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))), 6) AS cos
        |FROM embeddings e JOIN p ON e.vec_id > p.va)
        |SELECT va, vb, cos FROM s WHERE cos >= 0.4 ORDER BY va, vb""".stripMargin,
    "q44_text_quality" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens, CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        |CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to'], x))) AS INTEGER) AS n_stop FROM t)
        |SELECT doc_id, n_tokens, n_distinct, round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
        |round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr,
        |round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens), 6) AS quality
        |FROM c ORDER BY doc_id""".stripMargin,
    "q45_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und'], x))) AS INTEGER) AS score_de,
        |CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of'], x))) AS INTEGER) AS score_en,
        |CAST(len(list_filter(toks, x -> list_contains(['el','los','las','y'], x))) AS INTEGER) AS score_es,
        |CAST(len(list_filter(toks, x -> list_contains(['le','les','et','ou'], x))) AS INTEGER) AS score_fr FROM t),
        |b AS (SELECT doc_id, lang, CASE
        |WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
        |WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
        |WHEN score_es >= score_fr THEN 'es'
        |ELSE 'fr' END AS pred_lang FROM s)
        |SELECT doc_id, pred_lang, pred_lang = lang AS is_correct FROM b ORDER BY doc_id""".stripMargin,
    "q46_token_count_bpe" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |CAST(list_sum(list_transform(string_split(text, ' '), t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_pieces,
        |CAST(len(regexp_extract_all(array_to_string(string_split(text, ' '), ' '), '[a-z]+')) AS INTEGER) AS n_alpha_chunks
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q47_doc_fingerprint" ->
      """SELECT sha256(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint, CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n
        |FROM documents GROUP BY fingerprint HAVING count(*) > 1 ORDER BY fingerprint""".stripMargin,
    // q52's bucketed layout is a physical-plan property (PlanSpec pins
    // the missing Exchange); its OUTPUT is a plain deterministic join
    // aggregate, so it carries the plain-join oracle too (round-6).
    "q52_bucketed_join" ->
      """SELECT o.o_orderstatus,
        |CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |CAST(count(*) AS BIGINT) AS n
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin,
    "q53_quantiles" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.25), 4) AS p25, round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |round(quantile_cont(l_quantity, 0.75), 4) AS p75, round(quantile_cont(l_quantity, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q54_corr_covar" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
        |SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
        |SUM(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx,
        |SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS HUGEINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
        |SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
        |FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / n / (n - 1.0) / 10000.0, 4) AS covar_samp,
        |round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q55_session_events_stateful" ->
      """WITH x AS (SELECT CAST(user_id AS VARCHAR) || '-' || strftime(ts, '%Y-%m-%d') AS session_id,
        |CAST(ts AS DATE) AS session_date, epoch_ms(ts) AS epoch_ms,
        |'sku_' || CAST(event_id % 100 AS VARCHAR) AS sku FROM events)
        |SELECT session_id, 'k1' AS api_key, min(session_date) AS session_date,
        |string_agg(sku, '|' ORDER BY epoch_ms, sku) AS interactions
        |FROM x GROUP BY session_id ORDER BY session_id""".stripMargin,
    "q56_stream_interval_join" ->
      """SELECT v.user_id, p.event_id AS purchase_id, v.event_id AS view_id
        |FROM events v JOIN events p ON v.user_id = p.user_id
        |AND v.event_type = 'view' AND p.event_type = 'purchase'
        |AND epoch_ms(v.ts) <= epoch_ms(p.ts) AND epoch_ms(v.ts) > epoch_ms(p.ts) - 1800000
        |ORDER BY v.user_id, purchase_id, view_id""".stripMargin,
    "q57_skew_salted_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q76_skew_salted_join" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "q58_pivot" ->
      """SELECT o_orderpriority,
        |CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
        |CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
        |CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q59_merge_upsert" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
        |base AS (SELECT user_id, event_id, ts_ms, 0 AS src, 'upsert' AS op FROM ev WHERE event_id % 2 = 0
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) = 1),
        |changes AS (SELECT user_id, event_id, ts_ms, 1 AS src,
        |CASE WHEN event_type = 'click' THEN 'delete' ELSE 'upsert' END AS op FROM ev WHERE event_id % 2 = 1),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
        |w AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY src DESC, ts_ms DESC, event_id DESC) AS rn FROM u)
        |SELECT user_id, event_id, ts_ms FROM w WHERE rn = 1 AND op = 'upsert' ORDER BY user_id""".stripMargin,
    "q60_pipeline_tensors" ->
      """WITH s0 AS (SELECT CAST(user_id AS VARCHAR) || '-' || strftime(ts, '%Y-%m-%d') AS session_id,
        |epoch_ms(ts) AS tms, 'sku_' || CAST(event_id % 100 AS VARCHAR) AS sku FROM events),
        |sess AS (SELECT session_id, array_agg(sku ORDER BY tms, sku) AS interactions FROM s0 GROUP BY session_id HAVING count(*) > 2),
        |tok AS (SELECT session_id, p - 1 AS pos, interactions[p] AS sku
        |FROM (SELECT session_id, interactions, unnest(range(1, len(interactions) + 1)) AS p FROM sess) t),
        |vocab AS (SELECT sku, CAST(row_number() OVER (ORDER BY count(*) DESC, sku ASC) AS INTEGER) AS id FROM tok GROUP BY sku),
        |enc AS (SELECT t.session_id, array_agg(v.id ORDER BY t.pos) AS ids FROM tok t JOIN vocab v ON t.sku = v.sku GROUP BY t.session_id),
        |xy AS (SELECT session_id, ids[1:len(ids)-1] AS xa, ids[len(ids)] - 1 AS y FROM enc),
        |pad AS (SELECT session_id,
        |list_concat(list_transform(range(greatest(0, 20 - len(xa))), i -> CAST(0 AS INTEGER)), xa[greatest(1, len(xa) - 19):len(xa)]) AS xp, y FROM xy)
        |SELECT session_id, array_to_string(xp, '|') AS x, y FROM pad ORDER BY session_id""".stripMargin,
    "q61_dedup_clusters" ->
      """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id, sp[p] || ' ' || sp[p+1] || ' ' || sp[p+2] AS shingle
        |FROM (SELECT doc_id, sp, unnest(range(1, len(sp) - 1)) AS p FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents WHERE doc_id < 5000) t0 WHERE len(sp) >= 3) t1),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b FROM pr JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id WHERE CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) >= 0.5),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM j UNION ALL SELECT doc_b, doc_a FROM j),
        |reach(n, r) AS (SELECT doc_id, doc_id FROM documents WHERE doc_id < 5000
        |UNION SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n)
        |SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY n ORDER BY doc_id""".stripMargin,
    "q62_tfidf" ->
      """WITH tf AS (SELECT doc_id, token, count(*) AS tf FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, token, CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf FROM tf JOIN df USING (token) CROSS JOIN n),
        |r AS (SELECT doc_id, token, tfidf, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rnk FROM s)
        |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, token, round(tfidf, 6) AS tfidf FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    "q63_deterministic_sample" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS gate
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < CASE WHEN o_orderstatus = 'P' THEN '80' ELSE '40' END
        |ORDER BY o_orderkey""".stripMargin,
    "q64_heavy_hitters" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token
        |HAVING count(*) * 200 >= (SELECT count(*) FROM (SELECT unnest(string_split(text, ' ')) AS tk FROM documents) u)
        |ORDER BY token""".stripMargin,
    "q65_stream_topk" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT day, event_type, n, row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type ASC) AS rnk FROM c)
        |SELECT day, CAST(rnk AS INTEGER) AS rnk, event_type, CAST(n AS BIGINT) AS n FROM r WHERE rnk <= 2 ORDER BY day, rnk""".stripMargin,
    // identical oracle to q65 BY DESIGN: with capacity >= distinct
    // keys the MG sketch is exact, so the sketched state path must
    // reproduce the exact ranking bit for bit
    "q83_stream_topk_sketched" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT day, event_type, n, row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type ASC) AS rnk FROM c)
        |SELECT day, CAST(rnk AS INTEGER) AS rnk, event_type, CAST(n AS BIGINT) AS n FROM r WHERE rnk <= 2 ORDER BY day, rnk""".stripMargin,
    "q67_data_quality_audit" ->
      """SELECT 'accepted_values_orderstatus' AS check_name, CAST((SELECT count(*) FROM orders WHERE NOT (o_orderstatus IN ('F','O','P'))) AS BIGINT) AS n_violations
        |UNION ALL SELECT 'not_null_custkey', CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
        |UNION ALL SELECT 'relationship_orders_customer', CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        |UNION ALL SELECT 'unique_orderkey', CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1) t) AS BIGINT)
        |ORDER BY check_name""".stripMargin,
    "q68_funnel_conversion" ->
      """WITH up AS (SELECT CAST(ts AS DATE) AS day, user_id,
        |min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v,
        |min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS p
        |FROM events GROUP BY 1, 2)
        |SELECT day, CAST(count(v) AS BIGINT) AS n_viewers,
        |CAST(SUM(CASE WHEN v IS NOT NULL AND p IS NOT NULL AND p > v THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM up GROUP BY day ORDER BY day""".stripMargin,
    "q69_retention_cohorts" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
        |SELECT cohort_day, CAST(day - cohort_day AS INTEGER) AS day_offset,
        |CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q70_embedding_centroids" ->
      """WITH ex AS (SELECT COALESCE(label, -1) AS label, CAST(p - 1 AS INTEGER) AS pos, embedding[p] AS v
        |FROM (SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS p FROM embeddings) t)
        |SELECT label, pos, CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro, CAST(count(*) AS BIGINT) AS n
        |FROM ex GROUP BY 1, 2 ORDER BY label, pos""".stripMargin,
    "q71_transition_matrix" ->
      """WITH s AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
        |pp AS (SELECT event_type, lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS next_type FROM s),
        |c AS (SELECT event_type, next_type, count(*) AS n FROM pp WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
        |round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6) AS p
        |FROM c ORDER BY event_type, next_type""".stripMargin,
    "q72_anomaly_flags" ->
      """WITH e AS (SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |st AS (SELECT user_id, count(*) AS cnt, CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS sq FROM e GROUP BY 1 HAVING count(*) >= 5),
        |j AS (SELECT e.user_id, event_id, c, CAST(s AS DOUBLE) / cnt AS mean,
        |sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1)) AS std
        |FROM e JOIN st USING (user_id))
        |SELECT user_id, event_id, c AS value_cents, round((CAST(c AS DOUBLE) - mean) / std, 6) AS z
        |FROM j WHERE std > 0 AND abs(CAST(c AS DOUBLE) - mean) > 3 * std ORDER BY user_id, event_id""".stripMargin,
    "q73_dedup_fuzzy" ->
      """WITH d AS (SELECT doc_id, text, lang, string_split(text, ' ')[1] AS tok0,
        |CAST(floor(len(text) / 20.0) AS INTEGER) AS lb FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
        |FROM d a JOIN d b ON a.lang = b.lang AND a.tok0 = b.tok0 AND a.lb = b.lb AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) <= 30 ORDER BY doc_a, doc_b""".stripMargin,
    "q74_vocab_oov" ->
      """WITH tok AS (SELECT doc_id, p - 1 AS pos, sp[p] AS token FROM (SELECT doc_id, sp, unnest(range(1, len(sp) + 1)) AS p FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents) t0) t1),
        |tr AS (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' AS is_train FROM documents),
        |vocab AS (SELECT token, CAST(row_number() OVER (ORDER BY count(*) DESC, token ASC) + 1 AS INTEGER) AS id FROM tok JOIN tr USING (doc_id) WHERE tr.is_train GROUP BY token),
        |enc AS (SELECT t.doc_id, string_agg(CAST(COALESCE(v.id, 1) AS VARCHAR), '|' ORDER BY t.pos) AS ids FROM tok t LEFT JOIN vocab v ON t.token = v.token GROUP BY t.doc_id)
        |SELECT e.doc_id, tr.is_train, e.ids FROM enc e JOIN tr USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q77_repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, toks, list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS bi FROM t),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS top_n FROM tf GROUP BY 1),
        |c AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens, len(bi) AS tb, len(list_distinct(bi)) AS db FROM b)
        |SELECT c.doc_id, c.n_tokens,
        |CAST(((tb - db) * 1000) // greatest(tb, 1) AS INTEGER) AS dup_bigram_milli,
        |CAST((top_n * 1000) // n_tokens AS INTEGER) AS top_token_milli,
        |CAST((((tb - db) * 1000) // greatest(tb, 1)) > 300 OR ((top_n * 1000) // n_tokens) > 200 AS INTEGER) AS repetitive
        |FROM c JOIN top ON c.doc_id = top.doc_id ORDER BY c.doc_id""".stripMargin,
    "q78_pii_redact" ->
      """WITH a AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com phone 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug FROM documents),
        |r AS (SELECT doc_id, aug, regexp_replace(regexp_replace(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'), '555-[0-9]{4}', '<PHONE>', 'g') AS redacted FROM a)
        |SELECT doc_id,
        |CAST(len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
        |CAST(len(regexp_extract_all(aug, '555-[0-9]{4}')) AS INTEGER) AS n_phones,
        |CAST(length(redacted) AS INTEGER) AS n_chars_redacted,
        |substring(md5(redacted), 1, 16) AS redacted_hash
        |FROM r ORDER BY doc_id""".stripMargin,
    "q79_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk FROM documents)
        |SELECT lang, CAST(rnk AS INTEGER) AS rnk, doc_id FROM r WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    "q80_sequence_packing" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens, COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens, 0) AS cum_before FROM d)
        |SELECT doc_id, shard, n_tokens, CAST(cum_before // 512 AS INTEGER) AS bin, CAST(cum_before % 512 AS INTEGER) AS bin_offset FROM c ORDER BY doc_id""".stripMargin,
    "q81_decontamination" -> decontaminationOracle,
    // q89 is q81's declared OUTPUT behind a Bloom prefilter whose
    // exactness is structural (no false negatives; false positives
    // die in the exact join) — same oracle, deliberately shared
    "q89_decontamination_bloom" -> decontaminationOracle,
    // q51 writes ALL event rows to JSON and ORC and re-reads both
    // sides with explicit schemas — lossless for these column types
    // (longs, string, double written by Spark's writers), so the
    // per-type counts provably equal counts over the source table;
    // the spec keeps the file-level roundtrip pin (round-7, the
    // q52/q87 "oracle the output, keep the spec" pattern).
    "q51_sources_roundtrip" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_json, CAST(count(*) AS BIGINT) AS n_orc
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q82: int8 quantization is deterministic integer arithmetic —
    // codes are bit-identical cross-engine (float max exact, /127 in
    // double on both sides, float32 round-trip, away-from-zero
    // rounding), and every downstream value is a function of exact
    // integers. Mirrors quantize -> integer cosine -> top-k.
    "q82_simsearch_quantized" ->
      """WITH s AS (SELECT vec_id,
        |CAST(CAST(greatest(list_max(list_transform(embedding, x -> abs(x))), 1e-12) AS DOUBLE) / 127.0 AS FLOAT) AS scale,
        |embedding FROM embeddings),
        |qv AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) / CAST(scale AS DOUBLE))) AS qf FROM s),
        |n AS (SELECT vec_id, qf, list_sum(list_transform(qf, x -> x * x)) AS nsq FROM qv),
        |qq AS (SELECT vec_id AS query_id, qf AS pe, nsq AS qnsq FROM n WHERE vec_id < 10),
        |sc AS (SELECT query_id, n.vec_id AS neighbor_id,
        |round(list_sum(list_transform(range(1, 65), i -> pe[i] * qf[i])) / (sqrt(qnsq) * sqrt(nsq)), 6) AS cos
        |FROM n JOIN qq ON n.vec_id <> qq.query_id),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rnk FROM sc)
        |SELECT query_id, rnk, neighbor_id, cos FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q84_range_join" ->
      """WITH iv AS (SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS s_ms,
        |epoch_ms(l_shipdate) + ((l_suppkey % 20) + 1) * 86400000 AS e_ms
        |FROM lineitem WHERE l_quantity = 50),
        |pt AS (SELECT o_orderkey, epoch_ms(o_orderdate) AS p_ms FROM orders WHERE o_orderstatus = 'P')
        |SELECT l_orderkey, l_linenumber, o_orderkey, p_ms
        |FROM iv JOIN pt ON p_ms >= s_ms AND p_ms < e_ms
        |ORDER BY l_orderkey, l_linenumber, o_orderkey""".stripMargin,
    "q86_dedup_paragraph" -> paragraphDedupOracle,
    // q94 is q86's global first-occurrence rule evaluated as ordered
    // batch ranges against a persisted paragraph index — provably the
    // same output (LlmOps.q94DedupParagraphIngest scaladoc), so the
    // oracle is deliberately shared; it hash-gates the whole ingest
    // loop (index layout, Bloom prefilter, strict probe, replay-safe
    // append), the q87 pattern at paragraph granularity.
    "q94_dedup_paragraph_ingest" -> paragraphDedupOracle,
    // q95: same paragraph CTE as q86's oracle, but the keep rule is
    // the frequency threshold (count of DISTINCT docs per paragraph
    // <= 1), not first-occurrence rank
    "q95_boilerplate_freq" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |paras AS (SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
        |array_to_string(t[(CAST(i AS INTEGER) * 20 + 1):(CAST(i AS INTEGER) * 20 + 20)], ' ') AS para
        |FROM (SELECT doc_id, t, unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS i FROM toks) x),
        |f AS (SELECT para, COUNT(DISTINCT doc_id) AS nd FROM paras GROUP BY para)
        |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |CAST(COALESCE(SUM(CASE WHEN f.nd <= 1 THEN 1 END), 0) AS BIGINT) AS n_kept,
        |COALESCE(string_agg(CASE WHEN f.nd <= 1 THEN p.para END, ' ' ORDER BY p.para_idx), '') AS clean_text
        |FROM paras p JOIN f USING (para) GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    // q96: the oracle states the SEMANTICS directly — one greedy
    // prefix-sum window per lang over (md5-gate, doc_id) order; the
    // Spark side reaches the identical keep set through the bucketed
    // two-phase plan (no per-domain global sort). Budget arithmetic
    // is written in the same left-assoc double order on both sides.
    "q96_data_mixture" ->
      """WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS gate FROM documents),
        |tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM d),
        |w AS (SELECT doc_id, lang, n_tokens, gate,
        |COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY gate, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb FROM d)
        |SELECT doc_id, lang, n_tokens, gate FROM w CROSS JOIN tot
        |WHERE cumb < (CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END) * 0.5 * t
        |ORDER BY doc_id""".stripMargin,
    // q98: duplicated 8-token windows (exact text count > 1 corpus-
    // wide) cover token positions; covered positions are removed from
    // every document. Same window/coverage arithmetic on both sides.
    "q98_dedup_substring" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, CAST(i AS BIGINT) AS gpos,
        |array_to_string(t[(CAST(i AS INTEGER) + 1):(CAST(i AS INTEGER) + 8)], ' ') AS gram
        |FROM (SELECT doc_id, t, unnest(range(0, len(t) - 7)) AS i FROM toks) x),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
        |occ AS (SELECT g.doc_id, g.gpos FROM g JOIN d USING (gram)),
        |cov AS (SELECT DISTINCT doc_id, gpos + j AS p FROM occ CROSS JOIN (SELECT unnest(range(0, 8)) AS j) u),
        |tp AS (SELECT doc_id, CAST(p AS BIGINT) AS p, t[CAST(p AS INTEGER) + 1] AS tok
        |FROM (SELECT doc_id, t, unnest(range(0, len(t))) AS p FROM toks) y)
        |SELECT tp.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(COALESCE(SUM(CASE WHEN cov.p IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_dup_tokens,
        |COALESCE(string_agg(CASE WHEN cov.p IS NULL THEN tp.tok END, ' ' ORDER BY tp.p), '') AS clean_text
        |FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
        |GROUP BY tp.doc_id ORDER BY tp.doc_id""".stripMargin,
    // q87 at threshold 1.0: batch-sequential LSH ingest == global
    // first-occurrence dedup by identical shingle SET (an equivalence
    // relation; see LlmOps.q87DedupIngestBatch scaladoc). Docs with
    // < 3 tokens have no shingles and are always admitted.
    "q87_dedup_ingest_batch" -> dedupIngestOracle,
    // q119 shares q87's oracle: the seal before the final batch is a
    // pure relayout and admission depends only on index CONTENT, so
    // the sealed-probe + flat-append run admits exactly q87's rows —
    // the q114/q116 argument for the LSH family, exercised
    // mid-ingest.
    "q119_dedup_ingest_sealed" -> dedupIngestOracle,
    "q66_zorder_curve" -> {
      // generated from the SAME (bit, position) sequence as
      // Layout.zValue — the two sides cannot drift
      val terms = (0 until 10).flatMap { i =>
        Seq(s"(((o_custkey >> $i) & 1) << ${2 * i})",
          s"(((o_orderkey >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" | ")
      s"SELECT o_orderkey, CAST($terms AS BIGINT) AS z FROM orders ORDER BY z, o_orderkey"
    },
    // q100: the same add-one unigram LM on both sides — vocab = top
    // 4096 src0 tokens (count desc, tok asc), P=(c+1)/(N+V+1), bits
    // micro-rounded PER TOKEN then integer-summed (order-independent);
    // buckets compare bits < threshold×n_tokens in exact integers, so
    // no division semantics are in play. Only log2 itself is engine
    // float code; its ulp-level drift is ~1e-9 micro-units, far from
    // the rounding boundary.
    // q99: dedupResolve over q61's exact clusters — the recursive-CTE
    // closure (q61's oracle verbatim) joined to q44's quality, one
    // keep window. Rounded quality compares exactly cross-engine.
    "q99_dedup_resolve" ->
      """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id, sp[p] || ' ' || sp[p+1] || ' ' || sp[p+2] AS shingle
        |FROM (SELECT doc_id, sp, unnest(range(1, len(sp) - 1)) AS p FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents WHERE doc_id < 5000) t0 WHERE len(sp) >= 3) t1),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b FROM pr JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id WHERE CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) >= 0.5),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM j UNION ALL SELECT doc_b, doc_a FROM j),
        |reach(n, r) AS (SELECT doc_id, doc_id FROM documents WHERE doc_id < 5000
        |UNION SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n),
        |cl AS (SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY n),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        |CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to'], x))) AS INTEGER) AS n_stop FROM t),
        |q AS (SELECT doc_id, round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens), 6) AS quality FROM c),
        |r AS (SELECT cl.doc_id, cl.cluster_id, q.quality,
        |row_number() OVER (PARTITION BY cl.cluster_id ORDER BY q.quality DESC, cl.doc_id ASC) AS rn FROM cl JOIN q ON cl.doc_id = q.doc_id)
        |SELECT doc_id, cluster_id, quality, (rn = 1) AS keep FROM r ORDER BY doc_id""".stripMargin,
    "q100_perplexity_filter" ->
      """WITH ref AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents WHERE source = 'src0'),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
        |voc AS (SELECT tok, count(*) AS c FROM ref GROUP BY tok ORDER BY c DESC, tok ASC LIMIT 4096),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
        |lm AS (SELECT tok, CAST(round(-log2((c + 1.0) / (n.n + v.v + 1)) * 1000000.0) AS BIGINT) AS bits FROM voc, n, v),
        |oov AS (SELECT CAST(round(-log2(1.0 / (n.n + v.v + 1)) * 1000000.0) AS BIGINT) AS bits FROM n, v),
        |tk AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(SUM(COALESCE(lm.bits, (SELECT bits FROM oov))) AS BIGINT) AS bits_micro
        |FROM tk LEFT JOIN lm USING (tok) GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro < 4910000 * n_tokens THEN 'head'
        |WHEN bits_micro < 4940000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin,
    // q117: q100's machinery, interpolated-bigram model — both model
    // tables are bounded TakeOrdered CTEs (top-4096 unigrams, top-16384
    // in-vocab-prev bigrams, count desc then pair asc); per-token bits
    // -log2(0.5*P_bi + 0.5*P_uni) written token-for-token as the Spark
    // side builds them (same literals, same association), micro-rounded
    // then integer-summed; first token = P_uni alone. Only log2's libm
    // ulp drift is engine code (the q100/q104 argument).
    "q117_perplexity_bigram" ->
      """WITH ref AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE source = 'src0'),
        |rt AS (SELECT unnest(toks) AS tok FROM ref),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rt),
        |voc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM rt GROUP BY tok ORDER BY c DESC, tok ASC LIMIT 4096),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
        |bi AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb FROM
        |(SELECT toks[i] AS prev, toks[i + 1] AS cur FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM ref) x) y
        |JOIN voc vv ON y.prev = vv.tok
        |GROUP BY prev, cur ORDER BY cb DESC, prev ASC, cur ASC LIMIT 16384),
        |tk AS (SELECT doc_id, lang, toks, unnest(range(1, len(toks) + 1)) AS p FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents) d),
        |tok AS (SELECT doc_id, lang, toks[p] AS cur, CASE WHEN p > 1 THEN toks[p - 1] END AS prev FROM tk),
        |sc0 AS (SELECT doc_id, lang,
        |CASE WHEN tok.prev IS NULL THEN CAST(round(-log2((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1)) * 1000000.0) AS BIGINT)
        |ELSE CAST(round(-log2(0.5 * ((COALESCE(bi.cb, 0) + 1.0) / (COALESCE(vp.c, 0) + v.v + 1)) + 0.5 * ((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1))) * 1000000.0) AS BIGINT) END AS bits
        |FROM tok LEFT JOIN voc vc ON tok.cur = vc.tok LEFT JOIN voc vp ON tok.prev = vp.tok
        |LEFT JOIN bi ON tok.prev = bi.prev AND tok.cur = bi.cur, n, v),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens, CAST(SUM(bits) AS BIGINT) AS bits_micro FROM sc0 GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro < 4930000 * n_tokens THEN 'head'
        |WHEN bits_micro < 4980000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin,
    // q121: Naive-Bayes log-count-ratio quality gate — vocab = top
    // 4096 corpus tokens (count desc, tok asc; class-conditional
    // counts ride the same aggregate), per-token weight = the
    // log₂-ratio DIFFERENCE micro-rounded once (the q101 Δbits rule),
    // OOV and prior-log-odds constants likewise; doc score and the
    // kept rule are exact integer arithmetic. Only log2's libm ulp
    // drift is engine float code (the q100/q104 argument).
    "q121_quality_classifier" ->
      """WITH lt AS (SELECT doc_id, lang, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS label, text FROM documents),
        |tk AS (SELECT doc_id, lang, label, unnest(string_split(text, ' ')) AS tok FROM lt),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS n1 FROM tk),
        |dc AS (SELECT CAST(count(*) AS BIGINT) AS d, CAST(sum(label) AS BIGINT) AS d1 FROM lt),
        |voc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c, CAST(sum(label) AS BIGINT) AS c1 FROM tk GROUP BY tok ORDER BY c DESC, tok ASC LIMIT 4096),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
        |w AS (SELECT tok, CAST(round((log2((c1 + 1.0) / (tot.n1 + v.v + 1)) - log2((c - c1 + 1.0) / ((tot.n - tot.n1) + v.v + 1))) * 1000000.0) AS BIGINT) AS w FROM voc, tot, v),
        |oov AS (SELECT CAST(round((log2(1.0 / (tot.n1 + v.v + 1)) - log2(1.0 / ((tot.n - tot.n1) + v.v + 1))) * 1000000.0) AS BIGINT) AS w FROM tot, v),
        |bs AS (SELECT CAST(round((log2(dc.d1 + 1.0) - log2(dc.d - dc.d1 + 1.0)) * 1000000.0) AS BIGINT) AS b FROM dc),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(SUM(COALESCE(w.w, (SELECT w FROM oov))) + (SELECT b FROM bs) AS BIGINT) AS llr_micro
        |FROM tk LEFT JOIN w USING (tok) GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, llr_micro, (llr_micro > 0) AS kept
        |FROM sc ORDER BY doc_id""".stripMargin,
    // q123: the spark.sql view-stack query over the registered temp
    // views — by construction it must hash-match the q55 oracle (the
    // declared SQL↔DataFrame parity gate), so the oracle IS q55's.
    "q123_sql_session_events" ->
      """WITH x AS (SELECT CAST(user_id AS VARCHAR) || '-' || strftime(ts, '%Y-%m-%d') AS session_id,
        |CAST(ts AS DATE) AS session_date, epoch_ms(ts) AS epoch_ms,
        |'sku_' || CAST(event_id % 100 AS VARCHAR) AS sku FROM events)
        |SELECT session_id, 'k1' AS api_key, min(session_date) AS session_date,
        |string_agg(sku, '|' ORDER BY epoch_ms, sku) AS interactions
        |FROM x GROUP BY session_id ORDER BY session_id""".stripMargin,
    // q124: encode ∘ decode = identity — the decode leg re-joins the
    // q30 vocab the other way (id → token) and reassembles each doc.
    "q124_vocab_decode" ->
      """WITH tok AS (SELECT doc_id, p - 1 AS pos, sp[p] AS token FROM (SELECT doc_id, sp, unnest(range(1, len(sp) + 1)) AS p FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents) t0) t1),
        |vocab AS (SELECT token, CAST(row_number() OVER (ORDER BY count(*) DESC, token ASC) AS INTEGER) AS id FROM tok GROUP BY token),
        |enc AS (SELECT t.doc_id, t.pos, v.id FROM tok t JOIN vocab v ON t.token = v.token),
        |dec AS (SELECT e.doc_id, string_agg(iv.token, ' ' ORDER BY e.pos) AS decoded FROM enc e JOIN vocab iv ON e.id = iv.id GROUP BY e.doc_id)
        |SELECT doc_id, decoded FROM dec ORDER BY doc_id""".stripMargin,
    // q125: the END-TO-END corpus-prep chain as one gated relation —
    // every stage CTE below is the already-green oracle of its
    // component query (q36 exact keeper, q86 paragraph strip, q40+q61
    // exact pairs + recursive-CTE closure with min-id resolution, q77
    // integer repetition gate, q100 micro-bit LM gate on the full
    // src0 slice, q81 shingle decontamination vs the doc_id%13 eval
    // slice, q63 md5 train gate, q96 budget walk over CLEANED train
    // tokens, q102 shard/rank), chained in Pipeline.prepareCorpus's
    // declared order over doc_id < 5000. Output = per-doc (kind='doc',
    // name=lang, doc_id, shard, pos) rows plus one (kind='report')
    // counter row per CorpusReport stage, so the hash gates every
    // intermediate cardinality as well as the final keep set.
    "q125_corpus_pipeline" -> (corpusChainCtes + ",\n" +
      """mdd AS MATERIALIZED (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS gate FROM tr WHERE is_train),
        |mtot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM mdd),
        |mwin AS (SELECT doc_id, lang, n_tokens, gate, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY gate, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb FROM mdd),
        |mx AS MATERIALIZED (SELECT doc_id, lang, gate FROM mwin CROSS JOIN mtot WHERE cumb < (CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END) * 0.5 * t),
        |shq AS (SELECT doc_id, lang, gate, CAST(((strpos('0123456789abcdef', substring(gate, 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(gate, 2, 1)) - 1)) % 8 AS INTEGER) AS shard FROM mx),
        |docrows AS (SELECT 'doc' AS kind, lang AS name, CAST(doc_id AS BIGINT) AS doc_id, shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY gate, doc_id) - 1 AS BIGINT) AS pos FROM shq)
        |SELECT kind, name, doc_id, shard, pos FROM docrows
        |UNION ALL SELECT 'report', 'input', CAST(-1 AS BIGINT), CAST(-1 AS INTEGER), (SELECT count(*) FROM d0)
        |UNION ALL SELECT 'report', 'after_exact_dedup', -1, -1, (SELECT count(*) FROM e)
        |UNION ALL SELECT 'report', 'para_dropped', -1, -1, (SELECT count(*) FROM e) - (SELECT count(*) FROM c)
        |UNION ALL SELECT 'report', 'after_near_dedup', -1, -1, (SELECT count(*) FROM nr)
        |UNION ALL SELECT 'report', 'ppl_dropped', -1, -1, (SELECT count(*) FROM qual) - (SELECT count(*) FROM ppl)
        |UNION ALL SELECT 'report', 'decontaminated', -1, -1, (SELECT count(*) FROM ppl) - (SELECT count(*) FROM dec)
        |UNION ALL SELECT 'report', 'quota_dropped', -1, -1, (SELECT count(*) FROM dec) - (SELECT count(*) FROM quo)
        |UNION ALL SELECT 'report', 'final_kept', -1, -1, (SELECT count(*) FROM quo)
        |UNION ALL SELECT 'report', 'train', -1, -1, (SELECT count(*) FROM tr WHERE is_train)
        |UNION ALL SELECT 'report', 'holdout', -1, -1, (SELECT count(*) FROM tr WHERE NOT is_train)
        |UNION ALL SELECT 'report', 'mixture_kept', -1, -1, (SELECT count(*) FROM mx)
        |ORDER BY kind, name, doc_id""".stripMargin),
    // q126: the RELEASE artifact read back — same chain CTEs as q125,
    // then the release's four shipped relations recomputed: per-doc
    // shard rows (the q102 md5-gate shard rule over the train split,
    // pos = cleaned-text token count), holdout rows, the q103
    // datacard arithmetic over the WHOLE released corpus, and the
    // manifest counters (q125's report family + n_shards). The Spark
    // side builds its result ENTIRELY from reading the written files
    // back, so this hash gates the release writers byte-for-byte.
    "q126_corpus_release" -> (corpusChainCtes + ",\n" +
      """trn AS MATERIALIZED (SELECT doc_id, lang, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM tr WHERE is_train),
        |hld AS MATERIALIZED (SELECT doc_id, lang, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM tr WHERE NOT is_train),
        |docrows AS (SELECT 'doc' AS kind, lang AS name, CAST(doc_id AS BIGINT) AS doc_id,
        |CAST(((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 8 AS INTEGER) AS shard,
        |n_tokens AS pos FROM trn),
        |hrows AS (SELECT 'holdout' AS kind, lang AS name, CAST(doc_id AS BIGINT) AS doc_id, CAST(-1 AS INTEGER) AS shard, n_tokens AS pos FROM hld),
        |cm AS (SELECT lang, source, CAST(length(text) AS BIGINT) AS n_chars, CAST(len(toks) AS INTEGER) AS n_tokens, CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to'], x))) AS INTEGER) AS n_stop, COUNT(*) OVER (PARTITION BY text) AS nd FROM (SELECT lang, source, text, string_split(text, ' ') AS toks FROM tr) z),
        |cagg AS MATERIALIZED (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, CAST(SUM(n_chars) AS BIGINT) AS n_chars, CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 END), 0) AS BIGINT) AS dup_docs, CAST(SUM(CAST(round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 1000.0) AS BIGINT)) AS BIGINT) AS quality_milli_sum FROM cm GROUP BY lang, source),
        |crows AS (SELECT 'card' AS kind, lang || ':' || source || '/n_docs' AS name, CAST(-1 AS BIGINT) AS doc_id, CAST(-1 AS INTEGER) AS shard, n_docs AS pos FROM cagg
        |UNION ALL SELECT 'card', lang || ':' || source || '/n_tokens', -1, -1, n_tokens FROM cagg
        |UNION ALL SELECT 'card', lang || ':' || source || '/n_chars', -1, -1, n_chars FROM cagg
        |UNION ALL SELECT 'card', lang || ':' || source || '/dup_docs', -1, -1, dup_docs FROM cagg
        |UNION ALL SELECT 'card', lang || ':' || source || '/quality_milli_sum', -1, -1, quality_milli_sum FROM cagg)
        |SELECT kind, name, doc_id, shard, pos FROM docrows
        |UNION ALL SELECT kind, name, doc_id, shard, pos FROM hrows
        |UNION ALL SELECT kind, name, doc_id, shard, pos FROM crows
        |UNION ALL SELECT 'manifest', 'input', -1, -1, (SELECT count(*) FROM d0)
        |UNION ALL SELECT 'manifest', 'after_exact_dedup', -1, -1, (SELECT count(*) FROM e)
        |UNION ALL SELECT 'manifest', 'para_dropped', -1, -1, (SELECT count(*) FROM e) - (SELECT count(*) FROM c)
        |UNION ALL SELECT 'manifest', 'after_near_dedup', -1, -1, (SELECT count(*) FROM nr)
        |UNION ALL SELECT 'manifest', 'ppl_dropped', -1, -1, (SELECT count(*) FROM qual) - (SELECT count(*) FROM ppl)
        |UNION ALL SELECT 'manifest', 'decontaminated', -1, -1, (SELECT count(*) FROM ppl) - (SELECT count(*) FROM dec)
        |UNION ALL SELECT 'manifest', 'quota_dropped', -1, -1, (SELECT count(*) FROM dec) - (SELECT count(*) FROM quo)
        |UNION ALL SELECT 'manifest', 'final_kept', -1, -1, (SELECT count(*) FROM quo)
        |UNION ALL SELECT 'manifest', 'train', -1, -1, (SELECT count(*) FROM trn)
        |UNION ALL SELECT 'manifest', 'holdout', -1, -1, (SELECT count(*) FROM hld)
        |UNION ALL SELECT 'manifest', 'n_shards', -1, -1, 8
        |ORDER BY kind, name, doc_id""".stripMargin),
    // q127: compaction is row identity — the oracle recomputes the
    // per-date aggregates from the RAW events relation; the Spark
    // side computed them from the compacted files, so the hash gates
    // the in-place rewrite byte-for-byte (the q02/q03/q126 sink rule).
    "q127_compact_roundtrip" ->
      """SELECT CAST(ts AS DATE) AS event_date, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(event_id) AS BIGINT) AS sum_event_id, CAST(sum(user_id) AS BIGINT) AS sum_user_id
        |FROM events GROUP BY event_date ORDER BY event_date""".stripMargin,
    // q128: the manifest-resolved live version is the FULL slice —
    // the oracle recomputes the aggregates from the raw slice, so a
    // flip pointing at the superseded v1 halves a count, a prune that
    // bites the live version empties one, a lossy compaction moves an
    // id-sum (the q127 row-identity rule through the version pointer).
    // q128: the live leg recomputes from the raw slice; the n_v1 /
    // sum_event_id_v1 leg recomputes the SUPERSEDED v1 half-state
    // (even event_ids) — a pinned read that followed the manifest
    // instead would double n_v1
    "q128_versioned_lifecycle" ->
      """WITH s AS (SELECT CAST(ts AS DATE) AS event_date, event_id, user_id FROM events WHERE user_id % 8 = 0),
        |a AS (SELECT event_date, CAST(count(*) AS BIGINT) AS n, CAST(sum(event_id) AS BIGINT) AS sum_event_id, CAST(sum(user_id) AS BIGINT) AS sum_user_id FROM s GROUP BY event_date),
        |h AS (SELECT event_date, CAST(count(*) AS BIGINT) AS n_v1, CAST(sum(event_id) AS BIGINT) AS sum_event_id_v1 FROM s WHERE event_id % 2 = 0 GROUP BY event_date)
        |SELECT a.event_date, a.n, a.sum_event_id, a.sum_user_id,
        |CAST(COALESCE(h.n_v1, 0) AS BIGINT) AS n_v1, CAST(COALESCE(h.sum_event_id_v1, -1) AS BIGINT) AS sum_event_id_v1
        |FROM a LEFT JOIN h USING (event_date) ORDER BY event_date""".stripMargin,
    // q136: the evolved live version holds the base half NULL-filled
    // for the added column plus the evolved half carrying it — the
    // oracle recomputes from the raw slice with the same parity split
    "q136_schema_evolution" ->
      """WITH s AS (SELECT CAST(ts AS DATE) AS event_date, event_id, user_id, value FROM events WHERE user_id % 8 = 1),
        |o AS (SELECT event_date, event_id, user_id, CAST(NULL AS BIGINT) AS value_micro FROM s WHERE event_id % 2 = 0),
        |nw AS (SELECT event_date, event_id, user_id, CAST(round(value * 1000000.0) AS BIGINT) AS value_micro FROM s WHERE event_id % 2 = 1),
        |u AS (SELECT * FROM o UNION ALL SELECT * FROM nw)
        |SELECT event_date, CAST(count(*) AS BIGINT) AS n, CAST(sum(event_id) AS BIGINT) AS sum_event_id,
        |CAST(count(value_micro) AS BIGINT) AS n_valued, CAST(COALESCE(sum(value_micro), -1) AS BIGINT) AS sum_value_micro
        |FROM u GROUP BY event_date ORDER BY event_date""".stripMargin,
    // q101: md5-bucketed DSIR weights — 256-bucket hashed unigram
    // models for target (src0) and raw (all docs); Δbits rounded once
    // per BUCKET (the difference, not each log) then integer-summed;
    // keep rule in exact integer arithmetic, mirroring the Spark side.
    "q101_importance_resample" ->
      """WITH tt AS (SELECT substring(md5(unnest(string_split(text, ' '))), 1, 2) AS b FROM documents WHERE source = 'src0'),
        |rt AS (SELECT substring(md5(unnest(string_split(text, ' '))), 1, 2) AS b FROM documents),
        |tm AS (SELECT b, count(*) AS c FROM tt GROUP BY b),
        |rm AS (SELECT b, count(*) AS c FROM rt GROUP BY b),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tt),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rt),
        |tk AS (SELECT doc_id, lang, substring(md5(unnest(string_split(text, ' '))), 1, 2) AS b FROM documents),
        |w AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(SUM(CAST(round((log2((COALESCE(tm.c, 0) + 1.0) / (nt.n + 256)) - log2((COALESCE(rm.c, 0) + 1.0) / (nr.n + 256))) * 1000000.0) AS BIGINT)) AS BIGINT) AS logw_micro
        |FROM tk LEFT JOIN tm USING (b) LEFT JOIN rm USING (b), nt, nr GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, logw_micro, logw_micro > -210000 * n_tokens AS kept
        |FROM w ORDER BY doc_id""".stripMargin,
    // q102: both sides read the gate's first two hex digits as one
    // base-16 value (Spark conv == the strpos arithmetic here) and
    // rank by (gate, doc_id) within the shard; the Spark side reaches
    // the identical rank through bucketed prefix offsets (no
    // per-shard global sort — see Layout.q102TrainingShards).
    "q102_training_shards" ->
      """WITH d AS (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS gate FROM documents),
        |s AS (SELECT doc_id, gate, CAST(((strpos('0123456789abcdef', substring(gate, 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(gate, 2, 1)) - 1)) % 8 AS INTEGER) AS shard FROM d)
        |SELECT doc_id, shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY gate, doc_id) - 1 AS BIGINT) AS pos
        |FROM s ORDER BY doc_id""".stripMargin,
    // q103: per-doc quality milli-rounded FIRST then integer-summed
    // (order-independent); dup flag = exact text multiplicity (the
    // Spark side windows over sha2(text) — identical partition up to
    // 256-bit collisions, the q36 assumption)
    "q103_corpus_datacard" ->
      """WITH t AS (SELECT doc_id, lang, source, text, length(text) AS n_chars, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT lang, source, CAST(n_chars AS BIGINT) AS n_chars,
        |CAST(len(toks) AS INTEGER) AS n_tokens,
        |CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to'], x))) AS INTEGER) AS n_stop,
        |COUNT(*) OVER (PARTITION BY text) AS nd FROM t)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 END), 0) AS BIGINT) AS dup_docs,
        |CAST(SUM(CAST(round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 1000.0) AS BIGINT)) AS BIGINT) AS quality_milli_sum
        |FROM m GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // q104: textbook BM25 with every per-(query, term, doc)
    // contribution micro-rounded then integer-summed (the q100 rule);
    // the float expression is written token-for-token as the Spark
    // side builds it — same literals, same association — so only
    // ln()'s libm ulp drift is engine code, ~1e-9 micro-units from
    // any rounding boundary. Ranking and ties are pure integers.
    "q104_bm25_topk" -> bm25Oracle,
    // q105: per-source quota over the q103 quality integer — the
    // two-phase salted window on the Spark side keeps only rows the
    // exact per-source window would keep (phase 1 discards a row only
    // when >= cap better rows exist in its own cell), so plain
    // row_number semantics here ARE the operator's contract.
    "q105_source_quota" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, source, CAST(len(toks) AS INTEGER) AS n_tokens,
        |CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','in','to'], x))) AS INTEGER) AS n_stop FROM t),
        |q AS (SELECT doc_id, source, CAST(round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 1000.0) AS BIGINT) AS q_milli FROM m),
        |r AS (SELECT doc_id, source, q_milli, CAST(row_number() OVER (PARTITION BY source ORDER BY q_milli DESC, doc_id) AS INTEGER) AS rank FROM q)
        |SELECT doc_id, source, q_milli, rank FROM r WHERE rank <= 16 ORDER BY source, rank""".stripMargin,
    // q106 shares q104's oracle (the q89-shares-q81 structural-
    // exactness argument): the inverted index is a materialization of
    // the identical postings + arithmetic, so the indexed probe must
    // reproduce q104 row-for-row — an oracle gate on the pruned path.
    "q106_bm25_indexed" -> bm25Oracle,
    // q107: the Rademacher matrix is md5-derived on BOTH sides (the
    // q101 digest trick) and 1/√16 is an exact power of two, so the
    // single micro-round per term is the operator's only rounding —
    // no libm anywhere, bit-exact across engines by construction.
    "q107_dim_reduction" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i, unnest(embedding) AS x FROM embeddings),
        |c AS (SELECT vec_id, j, CAST(round(CAST(x AS DOUBLE) * (CASE WHEN substring(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1) < '8' THEN 1 ELSE -1 END) / 4.0 * 1000000.0) AS BIGINT) AS t
        |FROM e CROSS JOIN (SELECT unnest(range(0, 16)) AS j) js)
        |SELECT vec_id, CAST(j AS INTEGER) AS j, CAST(SUM(t) AS BIGINT) AS v_micro FROM c GROUP BY vec_id, j ORDER BY vec_id, j""".stripMargin,
    // q108: RRF fusion of the q104 lexical CTEs and a q38-style dense
    // cosine leg. Per-system terms round(1e6/(60+rank)) are integers
    // (both engines round the same IEEE quotient), so the fused score
    // and its ties are exact; the dense leg reuses q38's proven
    // fixed-order list_sum cosine rounded to 6 dp before ranking.
    // SHARED by q115 (indexed hybrid): at the exhaustive probe the
    // persisted-index dense leg's rank lists equal the brute leg's,
    // and RRF sees only ranks — so the fused output is row-identical
    // (the q111-shares-q38 argument lifted through rrfFuse).
    "q108_hybrid_rrf" -> hybridRrfOracle,
    "q115_hybrid_rrf_indexed" -> hybridRrfOracle,
    // q114: q113's ingest + the quiesce-time SEAL + a probe of the
    // SEALED index == exact q38 (sealing is a pure relayout — the
    // q113 argument extended one lifecycle step; the hash now gates
    // the park-rename compaction every round).
    "q114_simsearch_sealed" -> simsearchOracle,
    // q116: q109's ingest + invIndexSeal + probe of the SEALED
    // inverted index == exact q104 (the q114 argument for the
    // lexical index family).
    "q116_bm25_sealed" -> bm25Oracle,
    // q109 shares q104's oracle (the q87/q94 ingest-twin argument):
    // appending disjoint doc batches is a pure postings partition of
    // the corpus — df and stats reconstruct at probe time, so the
    // batch-built index must serve q104's exact answer; the driver
    // hash thereby gates the whole ingest loop (stamped layout,
    // dynamic-overwrite replay safety, stats summation, cross-batch
    // df reconstruction, bucket pruning).
    "q109_bm25_ingest_batch" -> bm25Oracle,
    // q110: the negative draw is md5(event_id || '_' || j) read as a
    // 4-hex-digit base-16 value mod the item universe (Spark
    // conv(hex,16,10) == the strpos arithmetic here — the q102
    // pairing); positive-collision steps to the next id. The sample
    // is a pure function of the data — identical on any engine. The
    // final `it.n IS NOT NULL` mirrors the Spark side's empty-universe
    // guard: with purchases but no item anywhere, there is nothing to
    // sample from and BOTH sides emit zero rows.
    "q110_negative_sampling" ->
      """WITH it AS (SELECT CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) + 1 AS n FROM events),
        |p AS (SELECT event_id, user_id, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS pos_item FROM events WHERE event_type = 'purchase'),
        |x AS (SELECT p.*, CAST(j AS INTEGER) AS neg_idx FROM p CROSS JOIN (SELECT unnest(range(0, 4)) AS j) js),
        |h AS (SELECT *, substring(md5(CAST(event_id AS VARCHAR) || '_' || CAST(neg_idx AS VARCHAR)), 1, 4) AS hx FROM x),
        |d AS (SELECT event_id, user_id, pos_item, neg_idx,
        |CAST(((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256 + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % it.n AS BIGINT) AS draw
        |FROM h, it)
        |SELECT event_id, user_id, pos_item, neg_idx,
        |CAST(CASE WHEN draw = pos_item THEN (draw + 1) % it.n ELSE draw END AS INTEGER) AS neg_item
        |FROM d, it WHERE it.n IS NOT NULL ORDER BY event_id, neg_idx""".stripMargin,
    // q111: the persisted PQ-coded IVF index probed exhaustively ==
    // exact q38 (see simsearchOracle scaladoc)
    "q111_simsearch_indexed" -> simsearchOracle,
    // q113: the batch-ingest-built index probed exhaustively == exact
    // q38 — the oracle hash-gates the whole ANN ingest loop (the
    // q109-shares-q104 argument applied to vector search)
    "q113_simsearch_ingest_batch" -> simsearchOracle,
    // q120: ingest + annIndexRetrain + exhaustive probe == exact q38 —
    // rotation rewrites every quantizer-derived byte but preserves the
    // vector set, which is all the exhaustive answer depends on; the
    // hash gates the re-encode pass end-to-end every round.
    "q120_simsearch_retrained" -> simsearchOracle,
    // q112: schema-full PERMISSIVE from_json projection. Fields
    // absent from a payload are NULL -> sentinel-coalesced on both
    // sides; the corrupt-record column mirrors as "props where NOT
    // json_valid". k is extracted with TRY_CAST (the q24/q110 rule).
    // SCOPE of the corrupt mirror: Spark additionally routes
    // valid-JSON-but-mismatched payloads (a non-object, a declared
    // field with the wrong type) to the corrupt column, which
    // json_valid cannot see; the fixture's payloads are uniformly
    // valid {"k": int} objects, so the two notions coincide here —
    // OperatorSpec pins the Spark-side behavior on a junk fixture
    // the oracle never reads.
    "q112_json_schema_projection" ->
      """SELECT event_id,
        |COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k_val,
        |COALESCE(json_extract_string(props, '$.session_id'), '') AS session_id,
        |COALESCE(json_extract_string(props, '$.product_action'), '') AS product_action,
        |COALESCE(TRY_CAST(json_extract_string(props, '$.server_timestamp_epoch_ms') AS BIGINT), -1) AS payload_ts_ms,
        |CASE WHEN json_valid(props) THEN '' ELSE COALESCE(props, '') END AS corrupt_rec
        |FROM events ORDER BY event_id""".stripMargin,
    // q129: deletion propagation — BM25 and exact-cosine top-k
    // recomputed over the corpus MINUS the deleted ids (id % 5 = 2),
    // queries still carved from the FULL corpus (takedown does not
    // retract in-flight queries). The tombstone probe and the
    // physically-compacted probe must BOTH equal this
    // rebuild-without-deleted answer, so each family contributes two
    // kinds of identical expected rows. The BM25 CTEs are the q104
    // arithmetic over the surviving docs (N, avgdl, df all shift
    // under deletion — a stale stats row or an unapplied tombstone
    // moves the hash); the dense CTEs are q38's fixed-order cosine
    // over the surviving vectors. Multi-referenced CTEs are
    // MATERIALIZED (the oracle-authoring rule).
    "q129_index_delete" ->
      """WITH d AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |surv AS MATERIALIZED (SELECT doc_id, toks FROM d WHERE doc_id % 5 <> 2),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(len(toks)) AS BIGINT) AS total FROM surv),
        |tf2 AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, tok, CAST(count(*) AS BIGINT) AS tf
        |FROM (SELECT doc_id, toks, unnest(toks) AS tok FROM surv) x GROUP BY doc_id, dl, tok),
        |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY tok),
        |qd AS (SELECT doc_id AS query_id, toks FROM d WHERE doc_id % 97 = 0 ORDER BY doc_id LIMIT 5),
        |qt AS (SELECT DISTINCT query_id, unnest(toks[1:4]) AS tok FROM qd),
        |m AS (SELECT qt.query_id, tf2.doc_id,
        |CAST(round(ln((CAST(st.n_docs AS DOUBLE) - dft.df + 0.5) / (dft.df + 0.5) + 1.0) * (tf2.tf * (1.2 + 1.0)) / (tf2.tf + 1.2 * ((1.0 - 0.75) + (0.75 * tf2.dl) / (CAST(st.total AS DOUBLE) / st.n_docs))) * 1000000.0) AS BIGINT) AS contrib
        |FROM tf2 JOIN qt USING (tok) JOIN dft USING (tok), st),
        |sc AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_micro FROM m GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank, score_micro FROM sc),
        |bm AS MATERIALIZED (SELECT query_id, rank, doc_id AS id, CAST(score_micro AS DOUBLE) AS score FROM r WHERE rank <= 10),
        |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |round(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
        |(sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))) *
        |sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))), 6) AS cos
        |FROM embeddings e JOIN q ON e.vec_id <> q.query_id WHERE e.vec_id % 5 <> 2),
        |rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rnk FROM s),
        |an AS MATERIALIZED (SELECT query_id, rnk AS rank, neighbor_id AS id, cos AS score FROM rr WHERE rnk <= 5)
        |SELECT kind, query_id, rank, id, score FROM (
        |SELECT 'bm25_tomb' AS kind, query_id, rank, id, score FROM bm
        |UNION ALL SELECT 'bm25_compact' AS kind, query_id, rank, id, score FROM bm
        |UNION ALL SELECT 'ann_tomb' AS kind, query_id, rank, id, score FROM an
        |UNION ALL SELECT 'ann_compact' AS kind, query_id, rank, id, score FROM an) u
        |ORDER BY kind, query_id, rank""".stripMargin,
    // q130: q117's interpolated-LM gate one order up — trigram table
    // = top 32768 triples whose (prev2, prev) context is an in-table
    // bigram (P_tri < 1 by construction, the q117 in-vocab invariant
    // lifted); per-token bits micro-rounded from the identical
    // token-for-token float expression (only log2's libm ulp is
    // engine code), integer-summed, integer bucket thresholds.
    "q130_perplexity_trigram" -> (trigramLmOracleCtes + ",\n" +
      """sc0 AS (SELECT doc_id, lang,
        |CASE WHEN tok.prev IS NULL THEN CAST(round(-log2((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1)) * 1000000.0) AS BIGINT)
        |WHEN tok.prev2 IS NULL THEN CAST(round(-log2(0.5 * ((COALESCE(bi.cb, 0) + 1.0) / (COALESCE(vp.c, 0) + v.v + 1)) + 0.5 * ((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1))) * 1000000.0) AS BIGINT)
        |ELSE CAST(round(-log2((((COALESCE(tri.ct, 0) + 1.0) / (COALESCE(bc.cb, 0) + v.v + 1)) + ((COALESCE(bi.cb, 0) + 1.0) / (COALESCE(vp.c, 0) + v.v + 1)) + ((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1))) / 3.0) * 1000000.0) AS BIGINT) END AS bits
        |FROM tok LEFT JOIN voc vc ON tok.cur = vc.tok LEFT JOIN voc vp ON tok.prev = vp.tok
        |LEFT JOIN bi ON tok.prev = bi.prev AND tok.cur = bi.cur
        |LEFT JOIN bi bc ON tok.prev2 = bc.prev AND tok.prev = bc.cur
        |LEFT JOIN tri ON tok.prev2 = tri.p2 AND tok.prev = tri.p1 AND tok.cur = tri.cur, n, v),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens, CAST(SUM(bits) AS BIGINT) AS bits_micro FROM sc0 GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro < 4960000 * n_tokens THEN 'head'
        |WHEN bits_micro < 4995000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin),
    // q133: stupid backoff over the SAME fitted tables (shared CTEs —
    // the ONE trainer definition, so q130's and q133's models cannot
    // drift): in-table orders score as exact relative frequencies
    // c_tri/c_ctx and c_bi/c_prev; a miss backs off with alpha = 0.4;
    // the unigram base keeps the add-one shape (the declared OOV
    // deviation — see the q133 scaladoc).
    "q133_perplexity_backoff" -> (trigramLmOracleCtes + ",\n" +
      """sc0 AS (SELECT doc_id, lang,
        |CASE WHEN tok.prev IS NULL THEN CAST(round(-log2((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1)) * 1000000.0) AS BIGINT)
        |WHEN tok.prev2 IS NULL THEN CAST(round(-log2(CASE WHEN bi.cb IS NOT NULL THEN CAST(bi.cb AS DOUBLE) / vp.c ELSE 0.4 * ((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1)) END) * 1000000.0) AS BIGINT)
        |ELSE CAST(round(-log2(CASE WHEN tri.ct IS NOT NULL THEN CAST(tri.ct AS DOUBLE) / bc.cb ELSE 0.4 * (CASE WHEN bi.cb IS NOT NULL THEN CAST(bi.cb AS DOUBLE) / vp.c ELSE 0.4 * ((COALESCE(vc.c, 0) + 1.0) / (n.n + v.v + 1)) END) END) * 1000000.0) AS BIGINT) END AS bits
        |FROM tok LEFT JOIN voc vc ON tok.cur = vc.tok LEFT JOIN voc vp ON tok.prev = vp.tok
        |LEFT JOIN bi ON tok.prev = bi.prev AND tok.cur = bi.cur
        |LEFT JOIN bi bc ON tok.prev2 = bc.prev AND tok.prev = bc.cur
        |LEFT JOIN tri ON tok.prev2 = tri.p2 AND tok.prev = tri.p1 AND tok.cur = tri.cur, n, v),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens, CAST(SUM(bits) AS BIGINT) AS bits_micro FROM sc0 GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro < 6050000 * n_tokens THEN 'head'
        |WHEN bits_micro < 6250000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin),
    // q134: Kneser–Ney discounting (fixed D = 0.75) over the SAME
    // fitted tables (shared CTEs — the one trainer definition for all
    // three trigram-order gates): discounted in-table heads plus
    // continuation-count backoff, with the aux stats (n1b/f1/f2/B)
    // derived as integer counts over the bounded tables themselves;
    // the add-one continuation base is the declared OOV deviation
    // (the q133 rule). See the q134 scaladoc for the (0,1) proofs.
    "q134_perplexity_kneser_ney" -> (trigramLmOracleCtes + ",\n" +
      """nb AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1b FROM bi GROUP BY cur),
        |f1 AS (SELECT prev, CAST(count(*) AS BIGINT) AS f1 FROM bi GROUP BY prev),
        |f2 AS (SELECT p2, p1, CAST(count(*) AS BIGINT) AS f2 FROM tri GROUP BY p2, p1),
        |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
        |sc0 AS (SELECT doc_id, lang,
        |CASE WHEN tok.prev IS NULL THEN CAST(round(-log2((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) * 1000000.0) AS BIGINT)
        |WHEN tok.prev2 IS NULL THEN CAST(round(-log2(CASE WHEN bi.cb IS NOT NULL THEN (bi.cb - 0.75) / vp.c + (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) WHEN f1.f1 IS NOT NULL THEN (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) ELSE (COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1) END) * 1000000.0) AS BIGINT)
        |ELSE CAST(round(-log2(CASE WHEN tri.ct IS NOT NULL THEN (tri.ct - 0.75) / bc.cb + (0.75 * f2.f2 / bc.cb) * (CASE WHEN bi.cb IS NOT NULL THEN (bi.cb - 0.75) / vp.c + (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) WHEN f1.f1 IS NOT NULL THEN (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) ELSE (COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1) END) WHEN f2.f2 IS NOT NULL THEN (0.75 * f2.f2 / bc.cb) * (CASE WHEN bi.cb IS NOT NULL THEN (bi.cb - 0.75) / vp.c + (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) WHEN f1.f1 IS NOT NULL THEN (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) ELSE (COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1) END) ELSE (CASE WHEN bi.cb IS NOT NULL THEN (bi.cb - 0.75) / vp.c + (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) WHEN f1.f1 IS NOT NULL THEN (0.75 * f1.f1 / vp.c) * ((COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1)) ELSE (COALESCE(nb.n1b, 0) + 1.0) / (bt.b + v.v + 1) END) END) * 1000000.0) AS BIGINT) END AS bits
        |FROM tok LEFT JOIN voc vc ON tok.cur = vc.tok LEFT JOIN voc vp ON tok.prev = vp.tok
        |LEFT JOIN bi ON tok.prev = bi.prev AND tok.cur = bi.cur
        |LEFT JOIN bi bc ON tok.prev2 = bc.prev AND tok.prev = bc.cur
        |LEFT JOIN tri ON tok.prev2 = tri.p2 AND tok.prev = tri.p1 AND tok.cur = tri.cur
        |LEFT JOIN nb ON tok.cur = nb.cur
        |LEFT JOIN f1 ON tok.prev = f1.prev
        |LEFT JOIN f2 ON tok.prev2 = f2.p2 AND tok.prev = f2.p1, v, bt),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens, CAST(SUM(bits) AS BIGINT) AS bits_micro FROM sc0 GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro < 5390000 * n_tokens THEN 'head'
        |WHEN bits_micro < 5520000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin),
    "q135_perplexity_kn_4gram" -> (fourgramLmOracleCtes + ",\n" +
      """nb AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1b FROM bi GROUP BY cur),
        |f1 AS (SELECT prev, CAST(count(*) AS BIGINT) AS f1 FROM bi GROUP BY prev),
        |f2 AS (SELECT p2, p1, CAST(count(*) AS BIGINT) AS f2 FROM tri GROUP BY p2, p1),
        |f3 AS (SELECT p3, p2, p1, CAST(count(*) AS BIGINT) AS f3 FROM quad GROUP BY p3, p2, p1),
        |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
        |sc0 AS (SELECT doc_id, lang,
        |CASE WHEN tok4.prev IS NULL THEN """.stripMargin +
      kn4Bits(kn4Pcont) + "\nWHEN tok4.prev2 IS NULL THEN " +
      kn4Bits(kn4Pbi) + "\nWHEN tok4.prev3 IS NULL THEN " +
      kn4Bits(kn4Ptri) + "\nELSE " + kn4Bits(kn4Pquad) + " END AS bits" +
      """
        |FROM tok4 LEFT JOIN voc vc ON tok4.cur = vc.tok LEFT JOIN voc vp ON tok4.prev = vp.tok
        |LEFT JOIN bi ON tok4.prev = bi.prev AND tok4.cur = bi.cur
        |LEFT JOIN bi bc ON tok4.prev2 = bc.prev AND tok4.prev = bc.cur
        |LEFT JOIN tri ON tok4.prev2 = tri.p2 AND tok4.prev = tri.p1 AND tok4.cur = tri.cur
        |LEFT JOIN tri tc ON tok4.prev3 = tc.p2 AND tok4.prev2 = tc.p1 AND tok4.prev = tc.cur
        |LEFT JOIN quad ON tok4.prev3 = quad.p3 AND tok4.prev2 = quad.p2 AND tok4.prev = quad.p1 AND tok4.cur = quad.cur
        |LEFT JOIN nb ON tok4.cur = nb.cur
        |LEFT JOIN f1 ON tok4.prev = f1.prev
        |LEFT JOIN f2 ON tok4.prev2 = f2.p2 AND tok4.prev = f2.p1
        |LEFT JOIN f3 ON tok4.prev3 = f3.p3 AND tok4.prev2 = f3.p2 AND tok4.prev = f3.p1, v, bt),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens, CAST(SUM(bits) AS BIGINT) AS bits_micro FROM sc0 GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro < 5407000 * n_tokens THEN 'head'
        |WHEN bits_micro < 5529000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin),
    "q137_perplexity_kn_5gram" -> (fivegramLmOracleCtes + ",\n" +
      """nb AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1b FROM bi GROUP BY cur),
        |f1 AS (SELECT prev, CAST(count(*) AS BIGINT) AS f1 FROM bi GROUP BY prev),
        |f2 AS (SELECT p2, p1, CAST(count(*) AS BIGINT) AS f2 FROM tri GROUP BY p2, p1),
        |f3 AS (SELECT p3, p2, p1, CAST(count(*) AS BIGINT) AS f3 FROM quad GROUP BY p3, p2, p1),
        |f4 AS (SELECT p4, p3, p2, p1, CAST(count(*) AS BIGINT) AS f4 FROM quint GROUP BY p4, p3, p2, p1),
        |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
        |sc0 AS (SELECT doc_id, lang,
        |CASE WHEN tok5.prev IS NULL THEN """.stripMargin +
      kn4Bits(kn4Pcont) + "\nWHEN tok5.prev2 IS NULL THEN " +
      kn4Bits(kn4Pbi) + "\nWHEN tok5.prev3 IS NULL THEN " +
      kn4Bits(kn4Ptri) + "\nWHEN tok5.prev4 IS NULL THEN " +
      kn4Bits(kn4Pquad) + "\nELSE " + kn4Bits(kn5Pquint) + " END AS bits" +
      """
        |FROM tok5 LEFT JOIN voc vc ON tok5.cur = vc.tok LEFT JOIN voc vp ON tok5.prev = vp.tok
        |LEFT JOIN bi ON tok5.prev = bi.prev AND tok5.cur = bi.cur
        |LEFT JOIN bi bc ON tok5.prev2 = bc.prev AND tok5.prev = bc.cur
        |LEFT JOIN tri ON tok5.prev2 = tri.p2 AND tok5.prev = tri.p1 AND tok5.cur = tri.cur
        |LEFT JOIN tri tc ON tok5.prev3 = tc.p2 AND tok5.prev2 = tc.p1 AND tok5.prev = tc.cur
        |LEFT JOIN quad ON tok5.prev3 = quad.p3 AND tok5.prev2 = quad.p2 AND tok5.prev = quad.p1 AND tok5.cur = quad.cur
        |LEFT JOIN quad qc ON tok5.prev4 = qc.p3 AND tok5.prev3 = qc.p2 AND tok5.prev2 = qc.p1 AND tok5.prev = qc.cur
        |LEFT JOIN quint ON tok5.prev4 = quint.p4 AND tok5.prev3 = quint.p3 AND tok5.prev2 = quint.p2 AND tok5.prev = quint.p1 AND tok5.cur = quint.cur
        |LEFT JOIN nb ON tok5.cur = nb.cur
        |LEFT JOIN f1 ON tok5.prev = f1.prev
        |LEFT JOIN f2 ON tok5.prev2 = f2.p2 AND tok5.prev = f2.p1
        |LEFT JOIN f3 ON tok5.prev3 = f3.p3 AND tok5.prev2 = f3.p2 AND tok5.prev = f3.p1
        |LEFT JOIN f4 ON tok5.prev4 = f4.p4 AND tok5.prev3 = f4.p3 AND tok5.prev2 = f4.p2 AND tok5.prev = f4.p1, v, bt),
        |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens, CAST(SUM(bits) AS BIGINT) AS bits_micro FROM sc0 GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro < 5407000 * n_tokens THEN 'head'
        |WHEN bits_micro < 5529000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin),
    "q138_dedup_simhash_exact" -> simhashExactOracle,
    // q139: per-language unigram LM gate — per-lang window-ranked
    // vocab, per-lang totals, the identical add-one float expression;
    // docs whose lang lacks a reference model get the declared
    // 'unmodeled' bucket (bits_micro -1), never another lang's model
    "q139_perplexity_per_lang" ->
      """WITH ref AS MATERIALIZED (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents WHERE source = 'src0'),
        |nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM ref GROUP BY lang),
        |cts AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM ref GROUP BY lang, tok),
        |voc AS MATERIALIZED (SELECT lang, tok, c FROM (SELECT lang, tok, c, row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok ASC) AS rk FROM cts) x WHERE rk <= 4096),
        |vl AS (SELECT lang, CAST(count(*) AS BIGINT) AS v FROM voc GROUP BY lang),
        |bits AS MATERIALIZED (SELECT voc.lang, voc.tok, CAST(round(-log2((voc.c + 1.0) / (nl.n + vl.v + 1)) * 1000000.0) AS BIGINT) AS bits FROM voc JOIN nl USING (lang) JOIN vl USING (lang)),
        |oov AS (SELECT nl.lang, CAST(round(-log2(1.0 / (nl.n + vl.v + 1)) * 1000000.0) AS BIGINT) AS oov_bits FROM nl JOIN vl USING (lang)),
        |tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |sc AS (SELECT t.doc_id, t.lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(COALESCE(SUM(COALESCE(b.bits, o.oov_bits)), -1) AS BIGINT) AS bits_micro
        |FROM tok t LEFT JOIN bits b ON t.lang = b.lang AND t.tok = b.tok
        |LEFT JOIN oov o ON t.lang = o.lang GROUP BY t.doc_id, t.lang)
        |SELECT doc_id, lang, n_tokens, bits_micro,
        |CASE WHEN bits_micro = -1 THEN 'unmodeled'
        |WHEN bits_micro < 4943000 * n_tokens THEN 'head'
        |WHEN bits_micro < 5006000 * n_tokens THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc ORDER BY doc_id""".stripMargin,
    // q131: the LSH-dedup takedown lifecycle. Three legs share the
    // one fingerprint construction (q87's identical-shingle-set rule
    // at threshold 1.0): 'ingest' is q87's oracle verbatim; 'tomb'
    // and 'compact' are the SAME probe answer twice — the deleted
    // docs' content re-submitted under shifted ids is admitted iff no
    // SURVIVING admitted doc holds its fingerprint (ghost suppression:
    // without the delete every one of these is blocked) and it is the
    // probe batch's own min-id occurrence. Deletion semantics are a
    // rebuild over the surviving INDEXED set — an index of first
    // occurrences cannot resurrect docs it dropped for a now-deleted
    // keeper (see the q131 scaladoc).
    "q131_dedup_index_delete" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |fp AS MATERIALIZED (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |array_to_string(list_sort(list_distinct(list_transform(range(1, len(t) - 1),
        |i -> array_to_string(t[CAST(i AS INTEGER):(CAST(i AS INTEGER) + 2)], ' ')))), chr(31)) END AS f
        |FROM toks),
        |keep AS (SELECT doc_id, f, CASE WHEN f IS NULL THEN doc_id ELSE min(doc_id) OVER (PARTITION BY f) END AS keeper FROM fp),
        |adm AS MATERIALIZED (SELECT doc_id, f FROM keep WHERE doc_id = keeper),
        |b AS (SELECT COALESCE(max(doc_id), -1) // 3 + 1 AS sz FROM documents),
        |ingest AS (SELECT 'ingest' AS kind, doc_id, CAST(doc_id // (SELECT GREATEST(sz, 1) FROM b) AS BIGINT) AS batch_id FROM adm),
        |surv AS (SELECT f FROM adm WHERE doc_id % 5 <> 2 AND f IS NOT NULL),
        |probe AS (SELECT doc_id + GREATEST(10000000, (SELECT COALESCE(max(doc_id), -1) + 1 FROM documents)) AS doc_id, f FROM fp WHERE doc_id % 5 = 2),
        |unblocked AS (SELECT doc_id, f FROM probe WHERE f IS NULL OR f NOT IN (SELECT f FROM surv)),
        |padm AS MATERIALIZED (SELECT doc_id FROM (SELECT doc_id, CASE WHEN f IS NULL THEN doc_id ELSE min(doc_id) OVER (PARTITION BY f) END AS k FROM unblocked) z WHERE doc_id = k)
        |SELECT kind, doc_id, batch_id FROM ingest
        |UNION ALL SELECT 'tomb' AS kind, doc_id, CAST(-1 AS BIGINT) AS batch_id FROM padm
        |UNION ALL SELECT 'compact' AS kind, doc_id, CAST(-1 AS BIGINT) AS batch_id FROM padm
        |ORDER BY kind, doc_id""".stripMargin,
    // q132: the paragraph-index takedown lifecycle (q131 at paragraph
    // granularity, q86's segmentation + global first-occurrence
    // rule): a probe paragraph — the deleted docs' content under
    // shifted ids — is kept iff its q86 keeper doc SURVIVES the
    // delete... i.e. is NOT kept iff a surviving keeper holds it, and
    // it must be the probe batch's own first occurrence. tomb ==
    // compacted, cleaned text included.
    "q132_para_index_delete" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |paras AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS para_idx,
        |array_to_string(t[(CAST(i AS INTEGER) * 20 + 1):(CAST(i AS INTEGER) * 20 + 20)], ' ') AS para
        |FROM (SELECT doc_id, t, unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS i FROM toks) x),
        |ranked AS (SELECT doc_id, para_idx, para, row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM paras),
        |surv AS MATERIALIZED (SELECT DISTINCT para FROM ranked WHERE rn = 1 AND doc_id % 5 <> 2),
        |bp AS (SELECT doc_id + GREATEST(10000000, (SELECT COALESCE(max(doc_id), -1) + 1 FROM documents)) AS doc_id, para_idx, para FROM paras WHERE doc_id % 5 = 2),
        |br AS (SELECT doc_id, para_idx, para, row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM bp),
        |bk AS (SELECT doc_id, para_idx, para, (rn = 1 AND para NOT IN (SELECT para FROM surv)) AS kept FROM br),
        |o AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |CAST(COALESCE(SUM(CASE WHEN kept THEN 1 END), 0) AS BIGINT) AS n_kept,
        |COALESCE(string_agg(CASE WHEN kept THEN para END, ' ' ORDER BY para_idx), '') AS clean_text
        |FROM bk GROUP BY doc_id)
        |SELECT 'tomb' AS kind, doc_id, n_paras, n_kept, clean_text FROM o
        |UNION ALL SELECT 'compact' AS kind, doc_id, n_paras, n_kept, clean_text FROM o
        |ORDER BY kind, doc_id""".stripMargin
  )
}
