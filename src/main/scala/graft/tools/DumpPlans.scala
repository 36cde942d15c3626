package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: formatted physical plans of the flagship queries at
  * sf0.001, so plan shape (pushdown, broadcast, partial agg, codegen spans)
  * is reviewable as a committed artifact, not just asserted in PlanSpec.
  * Usage: sbt "runMain graft.tools.DumpPlans [outFile]"
  */
object DumpPlans {
  val flagship: Seq[String] = Seq(
    "a1_group_sum", "p4_time_cutoff", "j1_semi_join", "j4_asof_join",
    "j5_interval_join", "d4_minhash_verified", "s1_knn_bruteforce",
    "hh1_top_terms", "t5_winnow_fingerprints", "s3_knn_ivf", "d12_dedup_incremental", "t9_subword_count",
    "s4_kmeans_refine", "x2_topk_revenue", "x3_region_revenue",
    "u3_merge_upsert",
    // round 3 additions
    "s2_knn_lsh", "d7_simhash_pairs", "d14_decontaminate",
    "pk1_sequence_pack", "fts1_bm25_rank", "j7_range_join_banded",
    "ts1_resample_ffill", "e1_label_centroids", "sk1_salted_agg",
    "x4_small_qty_revenue",
    // round 6 additions
    "s8_pq_adc_knn", "s9_ivfpq_knn", "d17_dedup_spans", "sm7_shuffle_order",
    "t13_repetition_signals", "u4_scd2_history", "u5_snapshot_diff",
    "x9_cheapest_supplier", "x10_waiting_orders",
    "x11_big_quantity_orders", "x12_dominant_suppliers",
    // round 7 additions
    "s10_ivfpq_trained", "m5_image_neardup", "t14_bpe_vocab",
    "t15_bpe_segment", "j5b_attribution_outer", "x15_pricing_summary",
    "x16_forecast_revenue", "x17_volume_shipping", "x18_nation_profit",
    "x19_late_priority_counts", "x20_promo_revenue", "x21_bracket_revenue",
    "s11_pq_trained", "s12_ivfpq_search", "d18_incremental_bucketed",
    "d19_embedding_components", "x22_returned_revenue", "x23_important_stock",
    "s13_ivfpq_residual",
    // round 8 additions (ds1 is omitted: its construction executes the
    // bucketed index build; its plan contract lives in DedupSpec)
    "ts2_resample_interp", "d11_embedding_neardup_lsh",
    "s14_ivfpq_residual_search", "sk2_salted_outer_join", "t16_bpe_batched",
    "s15_ivfpq_residual_trained", "ax4_kmv_setops", "hh3_windowed_top_values",
    "ax5_kmv_native", "ax6_windowed_distinct", "t17_bigram_nll",
    "sp1_leakage_safe_split",
    // round 9/10 additions (ds2 is omitted like ds1: constructing it
    // executes the two-batch ingest protocol; its Exchange-free plan
    // contract lives in DedupSpec. s16's five ANN method frames appear
    // through s17 + their own s2/s3/s9/s15 dumps; dq3 shows the
    // drift gate's bounded-bucket aggregation shape.)
    "sm9_importance_resample", "m7_video_neardup", "s17_ivfpq_refine",
    "dq3_distribution_drift", "s16_ann_recall",
    // round 11 additions (ds3 is omitted like ds1/ds2: constructing it
    // executes the exactly-once ingest protocol; its exchange-free serve
    // plan contract lives in AnnIndexSpec. s19's dump shows the persisted
    // bucketed members scan feeding the probe join with no index-side
    // Exchange.)
    "s18_knn_ivf_auto", "s19_ivfpq_persisted",
    // round 11 additions: ax7 shows the WindowGroupLimit-below-exchange
    // bottom-m sample; ax8 the map-side CMS matrix merge; bf1 the in-scan
    // bitmap filter ahead of the distinct exchange; s21 the window-free
    // threshold probe join; s22 the probe-side-only multi-probe fan-out.
    "ax7_kmv_quantile", "ax8_cms_counts", "bf1_bloom_prefilter",
    "s21_ivf_range", "s22_lsh_multiprobe",
    // later round-11 additions: ax9's windowed matrix agg, fn1's one-scan
    // funnel, t18's ln-kernel aggregate, t19's in-scan automaton, sm11's
    // per-stratum WindowGroupLimit, dq4's three-pass robust gate, fts2's
    // single-aggregate boolean retrieval.
    "ax9_windowed_cms", "fn1_curation_funnel", "t18_token_entropy",
    "t19_blocklist", "t20_blocklist_redact", "sm11_weighted_k_per_stratum",
    "dq4_mad_outliers", "fts2_boolean_search",
    "pk2_banded_pack", "pk3_pack_spread", "sm12_token_budget",
    "d20_neardup_multiprobe", "s23_ivfpq_deleted", "sm13_target_mix",
    "sm14_curriculum_order", "a13_moments_exact",
    // round 12: d21's three text-free hash-keyed shuffles (first-holder
    // credit reduce + doc totals + doc-keyed re-join); d23's winnow-
    // candidate join + semi-join-filtered containment verify. d22 is
    // omitted like ds1/ds2/ds3: constructing it executes the bucketed
    // index write; its exchange-free serve plan contract lives in
    // DedupSpec.
    "d21_ngram_novelty", "d23_containment_pairs", "fn2_novelty_funnel",
    "d24_cross_source_leakage", "fts3_hybrid_rrf", "t21_vocab_growth",
    // round 12 additions: t22's text-free bucket shuffles; e2's ln-kernel
    // discount metrics; fts4's in-scan slot fan-out; t23's per-group rank
    // windows. d25 is omitted like d9/d19: components checkpoint-truncate
    // the plan; ds5 executes writes like the other ds queries.
    "t22_quality_classifier", "e2_retrieval_metrics", "fts4_phrase_search",
    "t23_perplexity_buckets",
    // fts6's query-term-only postings + per-doc WindowGroupLimit argmax
    "fts6_snippets",
    // fn3's one-scan + fp-min window; dp2's single Expand cube; e3's
    // two vector-sum aggregates + label join. d26/ds7/ds8/m8/fts5/ds5/ds6
    // are omitted: components checkpoint-truncate or constructing them
    // executes index writes (the ds-series rule).
    "fn3_rejection_reasons", "dp2_curation_cube", "e3_centroid_drift",
    // ch3's native boundary kernel + map-side chunking; d27's hash-keyed
    // chunk join. d28 executes the index write (omitted, ds-series rule).
    "ch3_cdc_chunks", "d27_cdc_overlap",
    // round 13: lm1's one-scan all-orders fan-out + map-side-combined
    // count aggregate; lm2/lm3's type-keyed marginal joins + decimal
    // fixed-point tail; lm4's three-case backoff join chain + per-pair-
    // type ln + per-doc weighted sum; the two-level prefix-rank rewrites
    // of t23/sm12/sm13 show in their existing dumps (bucket-partitioned
    // windows). lm5/ds9 execute index/model writes (omitted, ds-series
    // rule — their serve plan contracts live in LmIndexSpec/PlanSpec).
    "lm1_ngram_counts", "lm2_kneser_ney", "lm3_kneser_ney_trigram",
    "lm4_kn_doc_score",
    // r1's broadcast cross-join + per-query top-k window. a14/lm6 are
    // omitted: their two-level prefix walks collect bucket counts during
    // construction (plan contracts live in ApproxOpsSpec / PlanSpec);
    // sh1/sh2 execute shard writes (ds-series rule — manifest and
    // single-file-per-shard contracts live in SamplingSpec); sm15 collects
    // bucket counts during construction (the a14/lm6 rule).
    "r1_hard_negatives",
    // d29's prefix-confined candidate join + candidate-restricted exact
    // verify — the subquadratic exact-Jaccard path d5 baselines.
    "d29_prefix_filter_pairs",
    // e4's one-scan all-orders fan-out per side + gram-keyed clip join
    // reusing the aggregation exchange — pair-local, windowless. e5
    // collapses it to (groups x orders) rows before any ln kernel call.
    // e6 runs the LCS DP as one native call per pair row. e7 is omitted:
    // its two-level rank prefix collects bucket counts during construction
    // (the a14/lm6 rule — plan contract lives in PlanSpec). e8 is e4's
    // shape over character grams (one fan-out scan per side, clip join
    // reuses the counting exchange).
    "e4_ngram_overlap", "e5_corpus_bleu", "e6_rouge_l", "e8_chrf")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PLANS.md")
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().appName("graft-plans").master("local[4]"),
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# Physical plans (generated by graft.tools.DumpPlans, sf0.001)\n\n")
    sb.append("What to look for: `PushedFilters`/`ReadSchema` on scans, " +
      "`BroadcastHashJoin` on dimension joins, paired `HashAggregate` " +
      "(partial+final), `TakeOrderedAndProject` for top-k, and whole-stage " +
      "codegen `*(n)` spans. PlanSpec asserts these; this file makes them " +
      "reviewable.\n")
    flagship.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
