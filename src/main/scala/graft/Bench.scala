package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mainT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - mainT0) / 1e9
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ICU case-mapping tables take ~60s of CPU to build on first
      // upper()/lower() call (CollationAwareUTF8String static init);
      // the JVM path is identical for this corpus (ASCII) and instant
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec warns on EVERY execution of a global-window frame; the
    // repo's global-window sites are domain-bounded post-agg frames
    // (bins/labels/strata — adjudicated per round in VERDICT), so the
    // warning is noise here — and in r12 it FLOODED the consumer's
    // bounded stdout tail (~2000 chars) with hundreds of copies,
    // burying the result line. Must run AFTER setLogLevel (which only
    // moves the root logger).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    ObservedMetricsLog.register(spark)
    // headline set: representative operators, timed end-to-end — the
    // round-over-round comparison series, unchanged since r3
    val headline = (graft.rel.RelQueries.all ++ graft.llm.LlmOps.all).collect {
      case (k, q) if q.headline => k -> q.fn
    }.toSeq
    // EXTENDED set: the post-r6 operator surface — a second series so
    // regressions in the new surface show up in BENCH files.
    // VALUES-pinned entries (recalls, BPE-derived) are excluded: their
    // fixture guards fail loud off sf0.01 by design. Streaming
    // harnesses (q127/q136/q140/q178/q219/q238/q245/q253/q278/q284/
    // q299/q307/q353/q391/q398) stay out: they time MemoryStream
    // micro-batch machinery, driver-side fixture collects and temp-dir
    // round-trips, not operator cost (q391/q398 were benched in r12 —
    // dropped r13 per the advisory; both stay oracle-checked in
    // SparkEntry).
    val extKeys = Seq("q58_image_decode", "q60_curation_pipeline",
      "q63_interval_stab", "q65_ivf_index_ann", "q67_dedup_index_probe",
      "q70_bloom_join", "q71_zorder_scan", "q76_cms_heavy_hitters",
      "q83_repeated_substrings", "q84_pq_index_ann", "q85_mixture_budget",
      "q93_image_neardup",
      // r7 continuation surface: line dedup, one-pass profile, snapshot
      // diff, BM25. q100_shard_manifest is NOT here: it builds on the
      // q72-pinned BPE vocabulary, so its fixture guard fail-louds off
      // sf0.01 by design (same category as q82/q94).
      "q97_line_dedup", "q99_profile",
      "q101_snapshot_diff", "q102_bm25_topk", "q103_lexical_index",
      "q106_rrf_fusion", "q107_weighted_sample", "q108_bigram_lm",
      "q110_source_kl",
      "q112_leakage_split", "q115_fuzzy_join", "q116_pagerank",
      "q117_scd2", "q118_triangles", "q119_audio_neardup", "q120_sessionize",
      "q121_pit_lookup", "q122_bfs_hops",
      "q123_kcore", "q124_ewma_smooth", "q125_rolling_anomaly",
      "q126_target_encode",
      "q130_pmi_cooccur", "q131_incr_agg", "q132_ppr", "q133_containment",
      "q134_kmv_setops", "q135_markov_transitions",
      "q137_rare_transitions", "q138_trend_ols", "q139_data_quality",
      "q141_psi_drift", "q142_series_corr", "q143_temperature_mix",
      "q144_twap", "q145_golden_record", "q146_weighted_pagerank",
      "q147_sketch_rollup", "q148_rank_normalize", "q149_winsorized_mean",
      "q150_centroid_sim", "q151_ks_drift",
      "q165_cohort_retention", "q168_assortativity", "q170_session_paths",
      "q173_weighted_median", "q180_gini", "q181_temporal_reach",
      "q182_prefix_jaccard", "q188_embeddedness", "q189_widest_path",
      "q190_decay_attribution", "q191_doc_keywords",
      // q218 has filesystem side effects but delta-sized ones —
      // included deliberately so the IVM path's cost is tracked
      "q211_scc", "q214_bitmap_rollup", "q215_theilsen", "q216_hhi",
      "q218_incr_join", "q220_bitmap_audience",
      "q221_exact_median_twopass", "q224_mg_heavy_hitters",
      "q225_hdr_percentiles", "q229_welch_ab",
      "q184_window_ranks", "q187_funnel_gap_stats", "q228_rfm_segments",
      "q233_retrieval_eval", "q237_cdc_apply",
      "q239_connected_components", "q240_sorted_neighborhood",
      "q241_k_anonymity", "q242_cdc_scd2", "q243_fellegi_sunter",
      "q244_incr_components",
      "q246_entity_resolution", "q247_grouped_auc", "q248_woe_encode",
      "q249_generalize", "q250_skew_report", "q251_mv_rewrite",
      "q254_stratified_sample", "q255_source_overlap",
      "q256_join_elimination",
      "q257_fk_audit", "q258_clustering_coeff", "q259_cdc_diff",
      "q260_blocking_quality", "q261_multipass_snm", "q262_fd_audit",
      "q264_langid_trigram", "q265_cdc_evolve",
      "q166_cusum_changepoint",
      "q267_chunking", "q268_hard_negatives", "q269_mutual_knn",
      "q270_semantic_clusters", "q273_centroid_outliers",
      "q275_retrieval_pipeline",
      "q277_clusters_delta",
      "q281_dsir_weights", "q282_dsir_gumbel",
      "q286_rm3_rerank",
      "q288_ql_dirichlet", "q289_ql_jm",
      "q290_cuped", "q291_bootstrap_ci", "q292_mad_outliers",
      "q293_calibration_bins",
      "q294_krippendorff_alpha", "q295_srm_check", "q296_delta_ratio",
      "q297_t_closeness", "q300_kaplan_meier",
      "q301_gram_normal_eq", "q302_chi2_features",
      "q303_logrank", "q304_conformal", "q305_grouped_percentiles",
      "q306_mann_kendall", "q308_corr_matrix", "q309_spearman",
      "q310_kruskal_wallis", "q312_bh_fdr", "q313_winsorized",
      "q315_link_prediction", "q316_hits",
      "q317_nelson_aalen", "q318_shapley_attribution", "q319_acf",
      "q321_markov_attribution",
      "q322_decontamination", "q323_bradley_terry",
      "q324_neighborhood_exact", "q325_hyperanf_hll",
      "q326_isotonic_calibration", "q327_theil_sen",
      "q328_stratified_ate", "q329_benford_audit",
      "q331_ktruss", "q332_rule_attribution",
      "q333_modularity", "q334_group_sequential",
      "q335_lift_table", "q336_trigram_like", "q338_sliding_distinct",
      "q339_logrank_stratified", "q340_kendall_tau",
      "q342_retrieval_pipeline_served", "q343_trigram_index",
      "q344_lpa_modularity", "q352_louvain_move",
      "q345_cox_ph", "q346_cox_ph_stratified",
      "q350_competing_risks", "q365_rmst",
      "q347_png_neardup", "q354_pii_cards", "q355_readability",
      "q356_warc_ingest", "q357_char_entropy", "q360_warc_gz",
      "q363_gif_neardup",
      "q348_logistic", "q349_ipw_ate", "q358_diff_in_diff",
      "q359_raking",
      "q361_split_gain", "q362_seq_patterns", "q366_zipf_fit",
      "q367_regression_discontinuity", "q368_changepoint",
      "q369_burstiness", "q370_calibration_audit", "q371_c_index",
      "q372_naive_bayes", "q373_psm_att", "q374_aipw_ate",
      "q375_betweenness", "q376_textrank", "q377_boosted_stumps",
      "q378_harmonic_exact", "q379_harmonic_hyperball",
      "q380_spectral_terms", "q381_iv_wald", "q382_uplift_qini",
      "q383_walk_corpus", "q384_kfold_cv_auc", "q385_logistic2",
      "q386_negative_samples", "q387_mcnemar",
      "q388_node_embedding_axis", "q389_source_valuation",
      "q390_uncertainty_batch",
      "q392_psi_drift", "q393_label_noise", "q394_cms_join_size",
      "q395_embedding_drift", "q396_classifier_report",
      "q397_feature_shapley",
      "q399_more_like_this", "q400_corpus_report", "q401_ks_drift",
      "q402_cramers_v", "q403_cohens_d", "q404_mi_features",
      "q405_feature_ranking_rbo",
      // round-13: JPEG decode + aHash near-dup (the q347 cost class on
      // the dominant crawl format, with restart markers on every blob);
      // Unicode-normalization rung (one codegen'd pass over the corpus
      // + the pinned fixture union)
      "q406_jpeg_neardup", "q407_normalize_text",
      // two-level Louvain: the q352 cost class + the quotient-sized
      // aggregation and re-move rounds; PR curve + AP (one conditional
      // agg + group windows, the q247 cost class)
      "q408_louvain_two_level", "q409_pr_curve",
      // Heaps'-law growth fit (checkpoint aggs + 32-row OLS) and the
      // perplexity filter (the q108 LM scoring shape + one rollup)
      "q410_heaps_law", "q411_perplexity_filter",
      // matryoshka truncation-recall anchor (bounded query brute force)
      // and the gram-novelty curve (one flatMap + checkpoint aggs)
      "q412_matryoshka_recall", "q413_ngram_novelty",
      // cross-source dup matrix (the q34 pair space + one rollup) and
      // the Gopher repetition filter (one narrow typed pass + rollup)
      "q414_source_dup_matrix", "q415_repetition_filter",
      // priority dedup (pairs + CC fold + argmin rollup) and the URL
      // canonical frontier dedup (narrow regex map + one agg)
      "q416_priority_dedup", "q417_url_canonical_dedup",
      // Gopher structural gates (one tokenize + rollup) and the degree
      // power-law fit (degree histogram + distinct-degree OLS)
      "q418_gopher_quality_rules", "q419_degree_powerlaw",
      // lexical IDF drift (one distinct explode + term-keyed agg +
      // bounded heap); q420 stays out (streaming harness, q391 rule);
      // codec quarantine report (all five decoders, one narrow pass)
      // and normalized dedup (hash-keyed winner agg)
      "q421_idf_drift", "q422_codec_quarantine_report",
      "q423_normalized_dedup",
      // minhash estimator audit (signatures + the q34 pair space) and
      // the dedup threshold sweep (one pair pass, four readouts)
      "q424_minhash_error_audit", "q425_dedup_threshold_sweep",
      // vocabulary coverage curve (one type agg + 13 conditional sums)
      // and semantic decontamination (broadcast eval set, one pass);
      // epoch water-filling (source-table windows, one corpus agg)
      "q426_vocab_coverage_curve", "q427_semantic_decontam",
      // webdataset tar shards (one shuffle to shard builders + the
      // strict round-trip)
      "q428_epoch_waterfill", "q429_webdataset_shards",
      // round-14: the composed end-to-end training-data plan (one
      // corpus pass + source-bounded stages — the q418+q423+q143+
      // q428+q429 chain as a single entry); the packing-efficiency
      // sweep (one range shuffle, four in-group folds); the shard
      // interleave (source agg + shard-bounded sort)
      "q430_training_data_plan", "q432_pack_efficiency_sweep",
      "q433_shard_interleave",
      // duplicate-class size histogram (one hash agg + bounded rollup)
      // and the cross-source LM matrix (one gram join, S^2 output)
      "q434_dup_class_histogram", "q435_source_lm_matrix",
      // the materialized chain: gates -> dedup -> tar shards; the
      // interleave discrepancy gauge (shard-bounded prefix grid)
      "q436_curated_shards", "q438_interleave_discrepancy",
      // multimodal image+caption shards (q429's shuffle + BMP codec)
      "q439_multimodal_shards",
      // round-15: the wds-shards DSv2 reader over on-disk tar shards
      // (write once cached, then the mount-back scan is timed); the
      // interleaved curriculum (per-source hash pass + shard-bounded
      // schedule join); JPEG multimodal shards (q439's shuffle + the
      // real baseline-JFIF encode/decode per doc). q441 is NOT here:
      // it serves the q72-pinned tokenizer, so its fixture guard
      // fail-louds off sf0.01 by design (the q82/q100 category).
      "q440_wds_reader", "q442_interleaved_curriculum",
      "q443_multimodal_jpeg_shards",
      // the pruned/header-only reader path and the loader-side
      // multimodal sample pairing (shards written once, cached; the
      // mount + pair scan is what's timed). q446 is NOT here: it
      // extends the q72-pinned tokenizer (fixture-pinned, like q441).
      "q444_wds_pruned_scan", "q445_wds_sample_pairing",
      // the DSv2 two-phase-commit sink: every rep re-writes the full
      // corpus in overwrite mode (truncate path) then mounts it back;
      // the curriculum-shard artifact (schedule-named shards via
      // shardColumn mode, mounted with in-shard order)
      "q447_wds_dsv2_sink", "q448_curriculum_shards",
      // shard-store compaction: mount -> renumber -> rewrite through
      // the sink, order-preserving (re-compacts every rep)
      "q451_wds_compact")
    // THIS ROUND's new entries: always timed first (a regression in the
    // newest surface must show up in its first BENCH file), before the
    // rotating remainder. Update per round. (r13's q406-q429 rotate
    // with everything else now — they sit at the TAIL of extKeys, so
    // the cursor's index into the earlier entries is undisturbed.)
    val newestKeys = Seq("q440_wds_reader",
      "q442_interleaved_curriculum", "q443_multimodal_jpeg_shards",
      "q444_wds_pruned_scan", "q445_wds_sample_pairing",
      "q447_wds_dsv2_sink", "q448_curriculum_shards",
      "q451_wds_compact")
    def fnOf(k: String) = SparkEntry.queries.getOrElse(k,
      sys.error(s"bench extended key $k missing from SparkEntry.queries"))
    // drain through the noop sink: forces full evaluation of every output
    // column (count() would let Catalyst prune unused aggregates)
    def drain(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Best-of-N per query, reps INTERLEAVED round-robin across queries:
    // the host is shared and sees periodic CPU-starvation bursts of
    // ~12-70s (3-6x slowdowns). Back-to-back reps of a ~1s query all fit
    // inside one burst — min-of-N is then pure noise; spreading each
    // query's reps apart means a burst costs each query at most one rep.
    // A crashing query surfaces as -1, not as a fast "success" timing.
    //
    // Starvation DETECTION (r6): a burst is directly observable from
    // inside the JVM: wall time inflates while process CPU time
    // doesn't, so a rep whose cpu/wall ratio is far below normal is
    // flagged, queries left with NO clean rep get extra retry rounds,
    // and the chosen min prefers clean reps.
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5")
    val reps = repsRaw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_BENCH_REPS must be an integer >= 1, got '$repsRaw'"))
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    // Extended group runs FEWER reps (default 3) under a WALL BUDGET:
    // r12's default run — 5 reps x 220 entries ~= 40+ min of query wall
    // — outran the driver window (rc 124, no official artifact). The
    // budget bounds total in-main wall; entries past it are DEFERRED
    // (named in the artifact — the no-silent-caps rule) and picked up
    // first next round via the rotation cursor.
    val extReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXT_REPS", "3").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500").toDouble
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val cleanCpuRatio = 0.75 // below this the host was starving the JVM
    // (wall seconds, cpu/wall ratio); wall = -1 marks a failed rep
    def timedRep(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      try {
        drain(fn)
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        (wall, cpu / math.max(wall, 1e-9))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e")
        (-1.0, 0.0)
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    // one group = warm-up pass + interleaved reps + starved-retry rounds
    def runGroup(group: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)],
        nReps: Int)
        : Seq[(String, Double, Double, Vector[(Double, Double)], Int)] = {
      // one warm-up pass per query: measure steady-state execution, not
      // first-call codegen/classloading (a long-lived cluster amortizes it)
      group.foreach { case (_, fn) =>
        try drain(fn) catch { case _: Throwable => () }
      }
      val measured = scala.collection.mutable.Map[String, Vector[(Double, Double)]]()
        .withDefaultValue(Vector.empty)
      (1 to nReps).foreach { _ =>
        group.foreach { case (name, fn) => measured(name) :+= timedRep(name, fn) }
      }
      def cleanOf(ts: Vector[(Double, Double)]) =
        ts.filter { case (w, r) => w >= 0 && r >= cleanCpuRatio }
      // retry rounds (still interleaved) for queries whose every rep was
      // starved or failed — capped so a permanently-loaded host terminates
      (1 to nReps).foreach { _ =>
        val unclean = group.filter { case (name, _) => cleanOf(measured(name)).isEmpty }
        unclean.foreach { case (name, fn) => measured(name) :+= timedRep(name, fn) }
      }
      group.map { case (name, _) =>
        val ts = measured(name)
        val ok = ts.filter(_._1 >= 0)
        val clean = cleanOf(ts)
        val best =
          if (clean.nonEmpty) clean.map(_._1).min
          else if (ok.nonEmpty) { // all reps starved: report, don't hide
            System.err.println(s"[bench] $name: NO clean rep after ${ts.length} tries " +
              s"(host starvation) — min is over starved reps")
            ok.map(_._1).min
          } else -1.0
        (name, best, median(ok.map(_._1)), ts, ok.length - clean.length)
      }
    }
    // SPARK_GRAFT_BENCH_ONLY=q118_triangles,q116_pagerank restricts both
    // groups — local perf iteration on one query without the full sweep
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    def keepK(ks: Seq[String]) = ks.filter(k => only.forall(_.contains(k)))

    // ---- coverage rotation cursor: extended entries not reached under
    // the budget this round run FIRST next round. The cursor persists in
    // a repo-root file (committed with the round); absent/corrupt -> 0.
    val cursorPath = java.nio.file.Paths.get("bench_cursor.txt")
    val rotating0 = extKeys.filterNot(newestKeys.contains)
    val cursor =
      (try {
        if (java.nio.file.Files.exists(cursorPath))
          new String(java.nio.file.Files.readAllBytes(cursorPath)).trim.toIntOption.getOrElse(0)
        else 0
      } catch { case _: Throwable => 0 }) match {
        case c if rotating0.nonEmpty => ((c % rotating0.size) + rotating0.size) % rotating0.size
        case _ => 0
      }
    val orderedExt = keepK(newestKeys ++ (rotating0.drop(cursor) ++ rotating0.take(cursor)))
    orderedExt.foreach(fnOf) // fail fast on a missing key, before timing

    // ---- incremental artifact emission: BENCH_local.json (full audit)
    // is rewritten and a COMPACT stdout line printed after the headline
    // group and after every extended chunk, so a driver-side timeout
    // leaves a parseable prefix instead of r12's `parsed: null`. The
    // consumer keeps only a bounded stdout tail (~2000 chars) and parses
    // the last JSON line in it — each compact line supersedes the prior.
    type Rows = Seq[(String, Double, Double, Vector[(Double, Double)], Int)]
    def obj(rs: Rows)(f: ((String, Double, Double, Vector[(Double, Double)], Int)) => String) =
      rs.map(r => s"\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    def groupJson(tag: String, rs: Rows) = {
      val qs = obj(rs)(_._2.toString)
      val medJson = obj(rs)(_._3.toString)
      val repJson = obj(rs)(_._4.map(_._1).mkString("[", ",", "]"))
      val cpuJson = obj(rs)(_._4.map(t => f"${t._2}%.2f").mkString("[", ",", "]"))
      val starvedJson = obj(rs)(_._5.toString)
      s""""queries$tag":$qs,"queries${tag}_median":$medJson,"rep_times$tag":$repJson,"rep_cpu_ratio$tag":$cpuJson,"starved_reps$tag":$starvedJson"""
    }
    def r3(d: Double) = math.rint(d * 1000) / 1000
    // bench-coverage split — every oracle-checked entry NOT in a
    // timed tier is in exactly one NAMED category (the r14 verdict
    // asked for the old "untimed" mix to be fully named):
    //   streaming_excluded — names contain "stream": MemoryStream /
    //     checkpoint-replay harnesses time fixture machinery, not
    //     operator cost (the r12 advisory);
    //   recall_twin — names contain "recall": VALUES-pinned recall
    //     gauges of a TIMED approximate entry (the approximate side
    //     carries the bench row; the twin exists to verify it);
    //   fixture_pinned — the declared list below: the compute path
    //     requires the sf0.01 fixture (requirePinnedFixture /
    //     AnnPin's guard, directly or through a cached builder like
    //     Bpe.mergesFor), so running them at the bench SF fail-louds
    //     BY DESIGN. Kept accurate by the loud subset check below —
    //     declaring an entry that later gets a bench row (or is
    //     renamed) aborts the run;
    //   cost_covered — the remainder: entries whose cost class a
    //     timed sibling already carries (scalar/rel variants, pivot/
    //     unpivot twins, VALUES-literal decode pins and the like),
    //     left without a row deliberately.
    val fixturePinned = Set(
      // ANN VALUES pins (AnnPin.pinnable with the sf0.01 guard)
      "q38_knn_lsh", "q47_ivf_ann", "q55_pq_ann", "q56_ivfpq_ann",
      "q69_opq_ann", "q252_sq8_ann", "q263_binary_ann",
      "q266_binary_index",
      // tokenizer-trained families (Bpe.mergesFor / Unigram.vocabFor /
      // WordPiece guard) and the artifacts built on them
      "q72_bpe_merges", "q72b_bpe_token_counts",
      "q82_materialize_sequences", "q94_sequence_boundaries",
      "q100_shard_manifest", "q441_tokenizer_lifecycle",
      "q446_tokenizer_extend",
      "q231_unigram_pieces", "q231b_unigram_token_counts",
      "q232_wordpiece_merges", "q232b_wordpiece_token_counts",
      // embedding-fixture VALUES pins
      "q92_semdedup", "q92_semdedup_sound", "q109_pca_project",
      "q272_mmr_rerank", "q274_semantic_clusters_ivf",
      "q276_retrieval_pipeline_mmr", "q351_retrieval_pipeline_served_mmr")
    val headlineSet = headline.map(_._1).toSet
    val notRowed = SparkEntry.queries.keySet -- extKeys.toSet -- headlineSet
    val streamingExcludedN = notRowed.count(_.contains("stream"))
    val nonStream = notRowed.filterNot(_.contains("stream"))
    val recallTwins = nonStream.filter(_.contains("recall"))
    require(fixturePinned.subsetOf(nonStream -- recallTwins),
      "bench_coverage.fixture_pinned list is stale: " +
        (fixturePinned -- (nonStream -- recallTwins)).mkString(","))
    val costCoveredN = nonStream.size - recallTwins.size - fixturePinned.size
    def coverageJson(timed: Int, deferred: Seq[String]) =
      s""""bench_coverage":{"timed":$timed,"streaming_excluded":$streamingExcludedN,""" +
        s""""recall_twin":${recallTwins.size},"fixture_pinned":${fixturePinned.size},""" +
        s""""cost_covered":$costCoveredN,"deferred":${deferred.length}}"""
    // ---- rotation-coverage proof: the committed union file carries
    // the extended keys timed by prior rounds' official runs; adding
    // this run's timed keys makes the cross-round coverage claim
    // machine-checkable ("complete" == the union covers the whole
    // extended list — the r13 verdict item #3). On completion the
    // union resets to THIS round's keys, starting the next cycle.
    val unionPath = java.nio.file.Paths.get("bench_timed_union.txt")
    val prevUnion: Set[String] =
      try {
        if (java.nio.file.Files.exists(unionPath))
          new String(java.nio.file.Files.readAllBytes(unionPath))
            .split("\\s+").filter(_.nonEmpty).toSet
        else Set.empty
      } catch { case _: Throwable => Set.empty }
    val extKeySet = extKeys.toSet
    def cumulative(extRows: Rows): Set[String] =
      (prevUnion ++ extRows.map(_._1)).intersect(extKeySet)
    def rotationJson(extRows: Rows) = {
      val cum = cumulative(extRows)
      s""""rotation":{"cursor_start":$cursor,"ext_total":${extKeys.size},"cumulative_timed":${cum.size},"complete":${cum.size == extKeySet.size}}"""
    }
    def emit(hRows: Rows, extRows: Rows, deferred: Seq[String], fin: Boolean): Unit = {
      val total = hRows.map(_._2).filter(_ >= 0).sum
      val totalMedian = hRows.map(_._3).filter(_ >= 0).sum
      val totalExt = extRows.map(_._2).filter(_ >= 0).sum
      val defJson = deferred.map("\"" + _ + "\"").mkString("[", ",", "]")
      val audit = s"""{"metric":"total","value":$total,"unit":"sec","total_median":$totalMedian,"total_ext":$totalExt,${groupJson("", hRows)},${groupJson("_ext", extRows)},${coverageJson(hRows.length + extRows.length, deferred)},${rotationJson(extRows)},"deferred_keys":$defJson,"ext_reps":$extReps,"budget_sec":$budgetSec,"final":$fin,"sf":"$sfDir"}"""
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_local.json"),
        (audit + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
      // full audit detail goes to the FILE (and one stdout line at the
      // very end); the per-chunk stdout line is the compact summary —
      // r6/r7's single giant line outgrew the consumer's tail window.
      if (fin) { println(audit); System.out.flush() }
      val qsCompact = hRows.map(r => s"\"${r._1}\":${r3(r._2)}").mkString("{", ",", "}")
      val starvedTotal = (hRows ++ extRows).map(_._5).sum
      println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","total_median":${r3(totalMedian)},"total_ext":${r3(totalExt)},"queries":$qsCompact,"n_ext":${extRows.length},${coverageJson(hRows.length + extRows.length, deferred)},${rotationJson(extRows)},"starved_reps_total":$starvedTotal,"final":$fin,"detail":"BENCH_local.json","sf":"$sfDir"}""")
      System.out.flush()
    }

    val results = runGroup(keepK(headline.map(_._1)).map(k =>
      k -> headline.toMap.apply(k)), reps)
    emit(results, Nil, orderedExt, fin = false)

    // extended group in budget-checked chunks (interleaving within a
    // chunk still spreads reps enough to ride out starvation bursts)
    val chunkSize = 10
    val extDone = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double, Vector[(Double, Double)], Int)]
    var remaining = orderedExt
    while (remaining.nonEmpty && elapsedSec < budgetSec) {
      val (chunk, rest) = remaining.splitAt(chunkSize)
      extDone ++= runGroup(chunk.map(k => k -> fnOf(k)), extReps)
      remaining = rest
      emit(results, extDone.toSeq, remaining, fin = false)
    }
    if (remaining.nonEmpty)
      System.err.println(s"[bench] budget ${budgetSec}s reached at ${r3(elapsedSec)}s — " +
        s"${remaining.length} extended entries deferred to next round: ${remaining.mkString(",")}")
    // advance the rotation cursor past the rotating entries timed this
    // round, so deferred ones lead the next round's extended group —
    // full runs only (an _ONLY-restricted local iteration must not
    // skew next round's coverage order)
    if (only.isEmpty) {
      val rotTimed = extDone.map(_._1).count(rotating0.contains)
      try java.nio.file.Files.write(cursorPath,
        (if (rotating0.isEmpty) "0" else ((cursor + rotTimed) % rotating0.size).toString)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[bench] cursor write failed: $e") }
      // persist the cross-round timed union; on cycle completion reset
      // to this round's keys so the next cycle's claim starts honest
      val cum = cumulative(extDone.toSeq)
      val nextUnion =
        if (cum.size == extKeySet.size) extDone.map(_._1).toSet.intersect(extKeySet)
        else cum
      try java.nio.file.Files.write(unionPath,
        (nextUnion.toSeq.sorted.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[bench] union write failed: $e") }
    }
    emit(results, extDone.toSeq, remaining, fin = true)
    spark.stop()
  }
}
