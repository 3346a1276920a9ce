package graft.examples
import org.apache.spark.sql.SparkSession
/** Prints the physical plans of the scale-sensitive queries so shuffle /
  * broadcast shapes can be audited against their documented design.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q34_ngram_jaccard", "q38_knn_lsh", "q41_embed_neardup",
        "q27_date_spine", "q50_sql_ann", "q51_kmv_distinct", "q53_tfidf",
        "q60_curation_pipeline", "q63_interval_stab", "q64_sample_quantiles",
        "q67_dedup_index_probe", "q70_bloom_join", "q71_zorder_scan",
        "q73_decontaminate", "q75_sequence_pack", "q76_cms_heavy_hitters",
        "q97_line_dedup", "q98_url_domain_filter", "q99_profile",
        "q101_snapshot_diff", "q102_bm25_topk", "q103_lexical_index",
        "q106_rrf_fusion", "q107_weighted_sample", "q108_bigram_lm",
        "q110_source_kl", "q111_pca_screen_recall", "q112_leakage_split",
        "q115_fuzzy_join", "q116_pagerank", "q117_scd2", "q118_triangles",
        "q119_audio_neardup", "q120_sessionize", "q121_pit_lookup",
        "q122_bfs_hops", "q130_pmi_cooccur", "q131_incr_agg",
        "q132_ppr", "q133_containment",
        "q165_cohort_retention", "q170_session_paths", "q181_temporal_reach",
        "q182_prefix_jaccard", "q186_pareto_share", "q188_embeddedness",
        "q211_scc", "q214_bitmap_rollup", "q215_theilsen", "q216_hhi",
        "q218_incr_join", "q233_retrieval_eval", "q235_temporal_split",
        "q237_cdc_apply", "q239_connected_components",
        "q240_sorted_neighborhood", "q246_entity_resolution",
        "q255_source_overlap", "q258_clustering_coeff",
        // round-13 scale-sensitive additions
        "q406_jpeg_neardup", "q408_louvain_two_level",
        "q409_pr_curve", "q411_perplexity_filter",
        "q413_ngram_novelty", "q414_source_dup_matrix",
        "q416_priority_dedup", "q421_idf_drift",
        "q423_normalized_dedup", "q425_dedup_threshold_sweep",
        // round-14: the composed plan (one corpus pass, checkpointed
        // narrow table, source-bounded tail); the cross-source LM
        // matrix (one gram-keyed join, S^2-bounded output)
        "q430_training_data_plan", "q435_source_lm_matrix",
        // round-15: the wds-shards DSv2 scan (file-per-shard
        // partitions; the description line carries pushed filters +
        // read schema) and the curriculum (one per-source hash pass,
        // shard-bounded broadcast-joined schedule)
        "q440_wds_reader", "q442_interleaved_curriculum")
    val all = graft.SparkEntry.allQ
    names.foreach { n =>
      println(s"\n======== $n ========")
      all(n).fn(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
