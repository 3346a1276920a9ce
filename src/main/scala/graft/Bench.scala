package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    ObservedMetricsLog.register(spark)
    // headline set: representative operators, timed end-to-end — the
    // round-over-round comparison series, unchanged since r3
    val headline = (graft.rel.RelQueries.all ++ graft.llm.LlmOps.all).collect {
      case (k, q) if q.headline => k -> q.fn
    }.toSeq
    // EXTENDED set: the r6/r7 operator surface (codecs, curation
    // pipeline, interval join, persisted-index probe, bloom semi-join,
    // Z-order scan, CMS, substring dedup, budget mixture) — a second
    // series so regressions in the new surface show up in BENCH files.
    // VALUES-pinned entries (recalls, BPE-derived) are excluded: their
    // fixture guards fail loud off sf0.01 by design.
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
      // this session's additions: rank fusion, A-ES weighted sampling,
      // bigram-LM scoring, per-source KL (q109/q111 are fixture-pinned)
      "q106_rrf_fusion", "q107_weighted_sample", "q108_bigram_lm",
      "q110_source_kl",
      // second continuation: streaming quantiles stays out (streaming
      // harness); q112 leakage split, fuzzy join, fixed-point pagerank,
      // SCD2 build, triangle counting, audio near-dup are all
      // sf-independent
      "q112_leakage_split", "q115_fuzzy_join", "q116_pagerank",
      "q117_scd2", "q118_triangles", "q119_audio_neardup", "q120_sessionize",
      "q121_pit_lookup", "q122_bfs_hops",
      // round-7 tail: k-core peel, secondary-sort EWMA, rolling
      // median/MAD, target encoding (q127 stays out: streaming harness)
      "q123_kcore", "q124_ewma_smooth", "q125_rolling_anomaly",
      "q126_target_encode",
      // round-8 additions: PMI collocations, incremental agg
      // maintenance, personalized pagerank, containment near-dup
      "q130_pmi_cooccur", "q131_incr_agg", "q132_ppr", "q133_containment",
      "q134_kmv_setops", "q135_markov_transitions",
      // q136 stays out: streaming harness, like q127
      // q140 stays out: streaming harness, like q127/q136
      "q137_rare_transitions", "q138_trend_ols", "q139_data_quality",
      "q141_psi_drift", "q142_series_corr", "q143_temperature_mix",
      "q144_twap", "q145_golden_record", "q146_weighted_pagerank",
      "q147_sketch_rollup", "q148_rank_normalize", "q149_winsorized_mean",
      "q150_centroid_sim", "q151_ks_drift",
      // round-8 additions: cohort matrix, graph moments, window paths,
      // weighted median, Gini, temporal reachability (q178 streaming
      // stays out: streaming harness, like q127/q136/q140)
      "q165_cohort_retention", "q168_assortativity", "q170_session_paths",
      "q173_weighted_median", "q180_gini", "q181_temporal_reach",
      // continuation: prefix-filtered join, embeddedness, widest paths,
      // decay attribution, keywords (q178/q183 stay out: streaming
      // harness / filesystem side effects)
      "q182_prefix_jaccard", "q188_embeddedness", "q189_widest_path",
      "q190_decay_attribution", "q191_doc_keywords",
      // round-8 continuation: quotient-graph SCC, bitmap rollup +
      // audience set-ops, Theil-Sen, HHI, incremental join view,
      // MG heavy hitters, HDR percentiles, two-pass median (q219
      // stays out: streaming harness; q218 has filesystem side
      // effects but delta-sized ones — included deliberately so the
      // IVM path's cost is tracked round-over-round)
      "q211_scc", "q214_bitmap_rollup", "q215_theilsen", "q216_hhi",
      "q218_incr_join", "q220_bitmap_audience",
      "q221_exact_median_twopass", "q224_mg_heavy_hitters",
      "q225_hdr_percentiles", "q229_welch_ab",
      // round-9: the GlobalRank-rewritten rank family (q180 above) —
      // tracked so the scale-safe ranking path's cost is a series
      "q184_window_ranks", "q187_funnel_gap_stats", "q228_rfm_segments",
      // round-9 continuation: retrieval eval + CDC merge (q238 stays
      // out: streaming harness, like q127/q136/q140)
      "q233_retrieval_eval", "q237_cdc_apply",
      // round-9 second continuation: log-round CC + its incremental
      // fold, SNM blocking, Fellegi-Sunter scoring, CDC history,
      // k-anonymity audit (q245 stays out: streaming harness)
      "q239_connected_components", "q240_sorted_neighborhood",
      "q241_k_anonymity", "q242_cdc_scd2", "q243_fellegi_sunter",
      "q244_incr_components",
      // round-9 third continuation: composed ER, grouped AUC, WoE,
      // generalization, skew report, MV rewrite (q252 ANN dump is
      // fixture-guarded to sf0.01; q245/q253 are streaming harnesses)
      "q246_entity_resolution", "q247_grouped_auc", "q248_woe_encode",
      "q249_generalize", "q250_skew_report", "q251_mv_rewrite",
      "q254_stratified_sample", "q255_source_overlap",
      "q256_join_elimination",
      // round-9 final stretch: FK audit, clustering coefficients,
      // CDC diff, blocking quality
      "q257_fk_audit", "q258_clustering_coeff", "q259_cdc_diff",
      "q260_blocking_quality", "q261_multipass_snm", "q262_fd_audit",
      // round-10: trained langid (train+infer), CDC schema evolution,
      // cusum on the prefix-sum decomposition (q188 already above, now
      // on the per-edge triangle machinery; q263's binary ANN dump is
      // fixture-guarded to sf0.01 like q252)
      "q264_langid_trigram", "q265_cdc_evolve",
      "q166_cusum_changepoint",
      // round-10 continuation: chunking, contrastive mining, the exact
      // mutual-kNN graph + semantic clusters, centroid outliers (q271/
      // q272 stay out: fixture-guarded to sf0.01 like q252/q263)
      "q267_chunking", "q268_hard_negatives", "q269_mutual_knn",
      "q270_semantic_clusters", "q273_centroid_outliers",
      // round-11: the composed retrieval pipeline's replayable half
      // (q274/q276 stay out: fixture-guarded to sf0.01 like q271/q272)
      "q275_retrieval_pipeline",
      // round-11 continuation: incremental cluster maintenance (exact
      // bootstrap + threshold-attach fold — the q270 cost class plus
      // the quotient fold). q278 stays out (streaming harness, the
      // q245 rule); q279 stays out: its wall is TWO exact q270 oracle
      // anchors, while the operator under test (contingency agreement)
      // is three hash aggs — benching it would time the anchors.
      "q277_clusters_delta",
      // round-11 DSIR tier: exact weights (two model builds + the
      // gram-keyed scoring joins) and the Gumbel selection on top.
      // q283 stays out (its wall is the exact anchor run twice);
      // q284 stays out (streaming harness, the q245 rule).
      "q281_dsir_weights", "q282_dsir_gumbel",
      // RM3 full loop (first pass + relevance model + weighted second
      // pass; q285 stays out — it is a strict prefix of q286's chain)
      "q286_rm3_rerank",
      // query-likelihood rankers (both benched: Dirichlet and JM share
      // the postings prep but diverge in the scoring shape)
      "q288_ql_dirichlet", "q289_ql_jm",
      // experiment/eval-stats tier: CUPED moments, the 40-replicate
      // Poisson bootstrap (the map-side-combine R-way expansion),
      // the two-pass-median MAD screen, the calibration table
      "q290_cuped", "q291_bootstrap_ci", "q292_mad_outliers",
      "q293_calibration_bins",
      // agreement + guardrail + ratio-CI companions, t-closeness,
      // Kaplan-Meier retention
      "q294_krippendorff_alpha", "q295_srm_check", "q296_delta_ratio",
      "q297_t_closeness", "q300_kaplan_meier",
      // one-pass Gram sufficient statistics; chi2 term selection;
      // log-rank survival comparison; grouped conformal thresholds
      "q301_gram_normal_eq", "q302_chi2_features",
      "q303_logrank", "q304_conformal", "q305_grouped_percentiles",
      "q306_mann_kendall", "q308_corr_matrix", "q309_spearman",
      // round-11 final stretch: the k-group rank test, the 199-rep
      // randomization family under BH (the map-side R-way expansion,
      // same cost class as q291), winsorized means over the grouped
      // selection, link prediction's wedge space, 4-round HITS
      // (q311 stays out — it is a strict subset of q312's family)
      "q310_kruskal_wallis", "q312_bh_fdr", "q313_winsorized",
      "q315_link_prediction", "q316_hits",
      // cumulative-hazard scan; exact 2^k Shapley coalition expansion;
      // scaled-integer ACF (q320 Ljung-Box rides the same acfRaw core);
      // Markov removal-effect absorption (one journey-window shuffle)
      "q317_nelson_aalen", "q318_shapley_attribution", "q319_acf",
      "q321_markov_attribution",
      // broadcast eval-gram collision audit over the documents corpus;
      // BT preference fit (one duel extraction + 10 tiny MM rounds);
      // the exact/HyperANF neighborhood-function rungs (pair-set BFS
      // vs linear register state — the 100 TB contrast measured live)
      "q322_decontamination", "q323_bradley_terry",
      "q324_neighborhood_exact", "q325_hyperanf_hll",
      // closed-form isotonic fit: one corpus agg + k^3 on 20 bins;
      // Theil-Sen robust trend (calendar-bounded pair space);
      // stratified ATE (one user agg + domain-bounded stratum scan)
      "q326_isotonic_calibration", "q327_theil_sen",
      "q328_stratified_ate", "q329_benford_audit",
      // edge peel on the shrinking co-purchase graph (triangle rider);
      // the heuristic attribution family (one journey window shuffle)
      "q331_ktruss", "q332_rule_attribution",
      // partition-quality score: two aggs over the tagged edge set;
      // OBF sequential monitor (3 snapshot aggs, boundary literals)
      "q333_modularity", "q334_group_sequential",
      // gains/lift deciles on the GlobalRank range decomposition;
      // trigram-pruned infix search (build + intersect + verify);
      // sliding exact distinct (one fact pass + 7-way bitmap merges)
      "q335_lift_table", "q336_trigram_like", "q338_sliding_distinct",
      // per-stratum risk sets + two order-pinned pools; Kendall tau-b
      "q339_logrank_stratified", "q340_kendall_tau",
      // round-12: the SERVED retrieval pipeline (persisted chunk-BM25
      // + IVF probes — q342's wall includes the per-dataset index
      // build once, then the pruned probes) and the persisted trigram
      // probe (q343; q336's wall is the per-batch posting rebuild the
      // index retires). q351 stays out: fixture-guarded to sf0.01
      // (the q272 rule); q353 stays out (streaming harness).
      "q342_retrieval_pipeline_served", "q343_trigram_index",
      // community find+judge: LPA partition + modularity report;
      // one-level Louvain local moving (2 coloring-scheduled rounds)
      "q344_lpa_modularity", "q352_louvain_move",
      // survival regression rungs: 6 Newton rounds each, one corpus
      // pass per round + domain-bounded risk-set windows
      "q345_cox_ph", "q346_cox_ph_stratified",
      // Aalen-Johansen per-cause incidence (the q300 cost class)
      "q350_competing_risks", "q365_rmst",
      // PNG decode + aHash near-dup (the q93 cost class on the real
      // format); Luhn card scrub + readability + entropy (per-row
      // expression chains over the corpus); WARC round-trip ingest
      // (q360 adds the per-member gzip cost on the same shape)
      "q347_png_neardup", "q354_pii_cards", "q355_readability",
      "q356_warc_ingest", "q357_char_entropy", "q360_warc_gz",
      "q363_gif_neardup",
      // logistic fit + the IPW chain on top (6 integer Newton rounds,
      // one corpus pass each); 2x2 DiD from one conditional agg;
      // 4-round IPF raking on domain-bounded cells
      "q348_logistic", "q349_ipw_ate", "q358_diff_in_diff",
      "q359_raking",
      // stump split gains (distinct-value windows over 3 features);
      // subsequence mining (alphabet-bounded position joins)
      "q361_split_gain", "q362_seq_patterns", "q366_zipf_fit",
      "q367_regression_discontinuity", "q368_changepoint",
      "q369_burstiness", "q370_calibration_audit", "q371_c_index",
      // round-12 continuation: classifier/causal/graph/embedding tier
      "q372_naive_bayes", "q373_psm_att", "q374_aipw_ate",
      "q375_betweenness", "q376_textrank", "q377_boosted_stumps",
      "q378_harmonic_exact", "q379_harmonic_hyperball",
      "q380_spectral_terms", "q381_iv_wald", "q382_uplift_qini",
      "q383_walk_corpus", "q384_kfold_cv_auc", "q385_logistic2",
      "q386_negative_samples", "q387_mcnemar",
      "q388_node_embedding_axis", "q389_source_valuation",
      "q390_uncertainty_batch", "q391_nb_stream_classify",
      "q392_psi_drift", "q393_label_noise", "q394_cms_join_size",
      "q395_embedding_drift", "q396_classifier_report",
      "q397_feature_shapley", "q398_psi_stream",
      "q399_more_like_this", "q400_corpus_report", "q401_ks_drift",
      "q402_cramers_v", "q403_cohens_d", "q404_mi_features",
      "q405_feature_ranking_rbo")
      // q299/q307 stay out: streaming harnesses (the q127/q245 rule)
    val extended = extKeys.map { k =>
      k -> SparkEntry.queries.getOrElse(k,
        sys.error(s"bench extended key $k missing from SparkEntry.queries"))
    }
    // drain through the noop sink: forces full evaluation of every output
    // column (count() would let Catalyst prune unused aggregates)
    def drain(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Best-of-N per query, reps INTERLEAVED round-robin across queries:
    // the host is shared and sees periodic CPU-starvation bursts of
    // ~12-70s (3-6x slowdowns). Back-to-back reps of a ~1s query all fit
    // inside one burst — min-of-N is then pure noise; spreading each
    // query's reps a full round (~10s+) apart means a burst costs each
    // query at most one rep. A crashing query surfaces as -1, not as a
    // fast "success" timing.
    //
    // Starvation DETECTION (r6): interleaving alone let r5's q34 land
    // all 5 reps inside bursts and record a phantom 4.8x regression. A
    // burst is directly observable from inside the JVM: wall time
    // inflates while process CPU time doesn't, so a rep whose
    // cpu/wall ratio is far below normal (unstarved reps of these
    // queries run >= ~1.5x; starved host windows measured ~0.17x) is
    // flagged, queries left with NO clean rep get extra retry rounds,
    // and the chosen min prefers clean reps. Medians and per-rep
    // cpu ratios are emitted so a consumer can audit the call.
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5")
    val reps = repsRaw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_BENCH_REPS must be an integer >= 1, got '$repsRaw'"))
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
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
    def runGroup(group: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)])
        : Seq[(String, Double, Double, Vector[(Double, Double)], Int)] = {
      // one warm-up pass per query: measure steady-state execution, not
      // first-call codegen/classloading (a long-lived cluster amortizes it)
      group.foreach { case (_, fn) =>
        try drain(fn) catch { case _: Throwable => () }
      }
      val measured = scala.collection.mutable.Map[String, Vector[(Double, Double)]]()
        .withDefaultValue(Vector.empty)
      (1 to reps).foreach { _ =>
        group.foreach { case (name, fn) => measured(name) :+= timedRep(name, fn) }
      }
      def cleanOf(ts: Vector[(Double, Double)]) =
        ts.filter { case (w, r) => w >= 0 && r >= cleanCpuRatio }
      // retry rounds (still interleaved) for queries whose every rep was
      // starved or failed — capped so a permanently-loaded host terminates
      (1 to reps).foreach { _ =>
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
    def keep(g: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)]) =
      g.filter { case (k, _) => only.forall(_.contains(k)) }
    val results = runGroup(keep(headline))
    val resultsExt = runGroup(keep(extended))
    def obj(rs: Seq[(String, Double, Double, Vector[(Double, Double)], Int)])(
        f: ((String, Double, Double, Vector[(Double, Double)], Int)) => String) =
      rs.map(r => s"\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    def groupJson(tag: String, rs: Seq[(String, Double, Double, Vector[(Double, Double)], Int)]) = {
      val qs = obj(rs)(_._2.toString)
      val medJson = obj(rs)(_._3.toString)
      // every rep per query (wall + cpu/wall), so the consumer can audit
      // host-starvation variance instead of trusting a lone min; -1 marks
      // a failed rep
      val repJson = obj(rs)(_._4.map(_._1).mkString("[", ",", "]"))
      val cpuJson = obj(rs)(_._4.map(t => f"${t._2}%.2f").mkString("[", ",", "]"))
      val starvedJson = obj(rs)(_._5.toString)
      s""""queries$tag":$qs,"queries${tag}_median":$medJson,"rep_times$tag":$repJson,"rep_cpu_ratio$tag":$cpuJson,"starved_reps$tag":$starvedJson"""
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalMedian = results.map(_._3).filter(_ >= 0).sum
    val totalExt = resultsExt.map(_._2).filter(_ >= 0).sum
    val audit = s"""{"metric":"total","value":$total,"unit":"sec","total_median":$totalMedian,"total_ext":$totalExt,${groupJson("", results)},${groupJson("_ext", resultsExt)},"sf":"$sfDir"}"""
    // full audit detail (per-rep walls, cpu ratios, medians, the extended
    // group) goes to a FILE plus an early stdout line; the FINAL stdout
    // line is a compact summary. The consumer keeps only a bounded tail
    // of stdout (observed: last ~2000 chars) and parses the JSON line it
    // finds there — r6/r7's single audit line outgrew that window and
    // the whole bench round parsed as null. The compact line (headline
    // per-query + group totals) stays far under the window; the audit
    // detail is in BENCH_local.json (committed per round).
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_local.json"),
      (audit + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    println(audit)
    def r3(d: Double) = math.rint(d * 1000) / 1000
    val qsCompact = results.map(r => s"\"${r._1}\":${r3(r._2)}").mkString("{", ",", "}")
    val starvedTotal = (results ++ resultsExt).map(_._5).sum
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","total_median":${r3(totalMedian)},"total_ext":${r3(totalExt)},"queries":$qsCompact,"n_ext":${resultsExt.length},"starved_reps_total":$starvedTotal,"detail":"BENCH_local.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
