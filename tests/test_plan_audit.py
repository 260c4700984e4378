"""Registry-wide plan-audit gate (r9 verdict Next #1).

Rounds 7-9 each fixed instances of the same physical anti-pattern
classes one at a time — q27's single-reducer median, q46/q65's bare
low-cardinality rank windows, the trailing corpus-sized orderBys. This
gate runs the PHYSICAL plan of every registered spec through
functions/plan_audit.py and compares against explicit whitelists, so
the classes are structurally unshippable:

C1 CartesianProduct          — never acceptable; empty whitelist.
C2 BroadcastNestedLoopJoin   — only for provably bounded broadcast
                               sides (single-row bounds/totals
                               crossJoins, ≤256-row codebooks/query
                               samples); whitelisted per spec.
C3 global Sort               — only on bounded report relations
                               (grouped histograms, |groups|-bounded
                               summaries, fixed query samples);
                               whitelisted per spec.
C4 suspicious window         — partition neither bin-conventioned nor
                               high-cardinality-keyed, not the ranks
                               histogram shape; whitelisted per spec
                               with the bounded relation named.

The whitelists assert EQUALITY with the observed findings, so a new
spec that trips a class fails until its author either restructures the
plan or consciously adds the name here with a reason — and a fixed
plan fails until its stale whitelist entry is removed.
"""

from __future__ import annotations

import pytest

from downscaledclimatedata_spark.functions.plan_audit import audit_plan
from downscaledclimatedata_spark.plans import all_specs
from tests.conftest import SF_CORRECTNESS

# Specs whose query function RUNS the computation and returns a
# materialized/constructed relation (pipeline builds, the evolution
# reader, the streaming rollup): their returned plan is a scan of the
# result, so auditing it is vacuous — and building them is the most
# expensive part of the registry. Their plan discipline is covered by
# the stage operators they compose (each separately registered and
# audited here) plus their own e2e tests.
EAGER_SPECS = {
    "dedup_semantic_iterated",
    "dedup_semantic_converged",
    "similarity_index_persist",
    "similarity_index_append",
    "similarity_index_routed",
    "similarity_index_multiprobe",
    "similarity_graph_persist",
    "pipeline_corpus_build",
    "pipeline_corpus_build_quality",
    "maintenance_read_evolved",
    "maintenance_read_renamed",
    "streaming_rollup_ivm",
    "streaming_session_windows",
    "streaming_stateful_totals",
    "streaming_tumbling_counts",
    "streaming_attribution_join",
}

# C2: every BroadcastNestedLoopJoin below broadcasts a provably bounded
# side. Families:
# - single-row bounds/total crossJoins (corpus min/max, sum, cut
#   timestamps): maintenance_cdc_apply, q24, q64, q69, q78, q79, q81,
#   q82, q85, q90, q92, q94, q96, q108, q110, prep_domain_mixture,
#   prep_epoch_*, prep_stratified_sample, prep_token_waterfill,
#   dedup_overlap_curve, dedup_signal_eval, dedup_graph_stats,
#   dedup_semantic_decon, maintenance_constraint_check,
#   maintenance_retention_plan, maintenance_zorder, text_corpus_drift,
#   text_vocab_growth, text_collocations, text_bm25_search (avgdl row)
# - ≤256-row codebooks / fixed query samples broadcast against the
#   vector corpus: every similarity_* entry (scaled_codebook caps the
#   centroid relation; query sets are fixed ≤30-row samples)
BNLJ_OK = {
    "dedup_graph_stats",
    "dedup_overlap_curve",
    "dedup_semantic_decon",
    "dedup_signal_eval",
    "maintenance_cdc_apply",
    "maintenance_constraint_check",
    "maintenance_retention_plan",
    "maintenance_zorder",
    "prep_domain_mixture",
    "prep_epoch_expand",
    "prep_epoch_schedule",
    "prep_stratified_sample",
    "prep_token_waterfill",
    "q108_peak_concurrency",
    "q110_backlog_aging",
    "q118_dormant_customers",   # broadcast global balance + horizon rows
    "q122_important_parts",     # broadcast single-row grand total
    "q24_above_average_customers",
    "q64_histogram_quantile",
    "q69_rolling_active_users",
    "q78_interval_lookup",
    "q79_bloom_join_reduction",
    "q81_pareto_frontier",
    "q82_rfm_segments",
    "q85_ab_test",
    "q90_weekday_chi2",
    "q92_scd2_asof_read",
    "q94_funnel",
    "q96_rolling_active",
    "similarity_ann_mrr",
    "similarity_ann_recall",
    "similarity_cell_purity",
    "similarity_cell_representatives",
    "similarity_cell_stats",
    "similarity_cluster_topics",
    "similarity_cosine_topk",
    "similarity_cosine_topk_float",
    "similarity_embedding_drift",
    "similarity_ivf_k256",
    "similarity_ivf_multiprobe",
    "similarity_ivf_refined",
    "similarity_ivf_topk",
    "similarity_hybrid_rrf",  # broadcast single-row query vector
    "similarity_hybrid_rrf_bm25",  # broadcast single-row query vector + stats
    "similarity_knn_recall",  # broadcast fixed ≤50-row query sample
    "similarity_semantic_recall",  # broadcast query sample + codebook
    "similarity_ivfpq_residual",
    "similarity_ivfpq_topk",
    "similarity_knn_hubness",
    "similarity_knn_triangles",
    "similarity_l2_topk",
    "similarity_label_margin",
    "similarity_mips_topk",
    "similarity_nprobe_curve",
    "similarity_ood_vectors",
    "similarity_pq_recall",
    "similarity_pq_refined",
    "similarity_prefix_recall",
    "similarity_range_search",
    "similarity_rp_topk",
    "similarity_sq8_topk",
    "text_bm25_search",
    "text_collocations",
    "text_corpus_drift",
    "text_vocab_growth",
}

# C3: every trailing global Sort below orders a BOUNDED report
# relation — grouped histograms (bucket/size/lag/day/month keys),
# |groups|-bounded summaries (per source/lang/segment/event_type),
# fixed ≤30-row query samples (similarity_* per-query reports), the
# min-freq-filtered vocabulary/phrase relations (text_rake_keywords,
# text_bloom_membership), or frontier/top-k outputs. Corpus-keyed
# (per-doc / per-user / per-order) outputs may NOT appear here — their
# sorts were removed in r9/r10 (lm_familiarity, winnow, phash_dedup,
# OOD gate, q77, q86, q91, q92, cdc_apply, quality_keep).
GLOBAL_SORT_OK = {
    "dedup_exact_histogram",
    "dedup_levenshtein",
    "dedup_lsh_bucket_histogram",
    "dedup_lsh_bucket_stats",
    "dedup_neardup_clusters",
    "dedup_overlap_curve",
    "dedup_signal_eval",
    "dedup_source_overlap",
    "maintenance_constraint_check",
    "maintenance_incremental_agg",
    "maintenance_incremental_join",
    "maintenance_table_profile",
    "prep_balanced_shards",
    "prep_epoch_schedule",
    "prep_length_profile",
    "prep_padding_report",
    "prep_pipeline",
    "prep_source_quota",
    "prep_token_waterfill",
    "q100_weekly_median",
    "q101_promo_revenue",
    "q103_salted_skew_join",
    "q104_return_rate",
    "q105_session_conversion",
    "q106_histogram_quantiles",
    "q107_quintile_migration",
    "q109_time_to_convert",
    "q110_backlog_aging",
    "q52_salted_skew_join",
    "q56_stratified_split",
    "q63_weighted_sample",
    "q70_markov_transitions",
    "q71_trimmed_mean",
    "q74_attribution",
    "q75_trending_terms",
    "q76_market_share",
    "q78_interval_lookup",
    "q79_bloom_join_reduction",
    "q80_sequence_pattern",
    "q81_pareto_frontier",
    "q82_rfm_segments",
    "q83_basket_lift",
    "q84_autocorrelation",
    "q87_churn_hazard",
    "q88_gini_concentration",
    "q89_new_vs_returning",
    "q93_top_decile_share",
    "q95_cohort_retention",
    "q96_rolling_active",
    "q97_source_concentration",
    "q98_duplicate_payments",
    "q99_gap_histogram",
    "similarity_cell_purity",
    "similarity_cell_stats",
    "similarity_cluster_topics",
    "similarity_ivf_k256",
    "similarity_ivf_refined",
    "similarity_kmeans_refine",
    "similarity_knn_classify",
    "similarity_knn_hubness",
    "similarity_label_margin",
    "similarity_norm_histogram",
    "similarity_pq_refined",
    "similarity_prefix_recall",
    "text_bloom_membership",
    "text_byte_fertility",
    "text_charset_profile",
    "text_hapax_profile",
    "text_langid_eval",
    "text_oov_rate",
    "text_rake_keywords",
}

# C4: each flagged window runs over the named BOUNDED relation.
WINDOW_OK = {
    # WindowGroupLimit rewrite: partial top-cap per source before the
    # shuffle (plan-tested in test_prep.py) — reducers see ≤tasks×cap
    "prep_source_quota",
    # windows over the |sources|-bounded Neyman/water-fill allocation
    "prep_stratified_sample",
    "prep_token_waterfill",
    # source-index windows over the |sources|-bounded distinct relation
    "prep_interleave",
    # bounded month relation (≤ months in the data)
    "q102_monthly_growth",
    # fixed-bin histogram relation (≤64 bins per event_type)
    "q106_histogram_quantiles",
    # per-(day, event_type) delta relation — |days|×|event types|
    "q75_trending_terms",
    # per-(region, year, nation) share relation
    "q76_market_share",
    # bounded generated window list (interval lookup dimension)
    "q78_interval_lookup",
    # per-n_orders histogram relation
    "q87_churn_hazard",
    # |langs|² confusion matrix
    "text_langid_eval",
    # term-count relation under the top-512 vocab cap
    "text_vocab_encode",
    # rank windows over the two TakeOrdered ≤50-row RRF shortlists
    "similarity_hybrid_rrf",
    "similarity_hybrid_rrf_bm25",
}


@pytest.fixture(scope="module")
def findings(spark):
    out = {}
    for name, spec in sorted(all_specs().items()):
        if name in EAGER_SPECS:
            continue
        out[name] = audit_plan(spec.spark(spark, SF_CORRECTNESS))
    return out


def test_eager_list_is_current(spark):
    assert EAGER_SPECS <= set(all_specs()), \
        "EAGER_SPECS names a spec that no longer exists"


def test_no_cartesian_product(findings):
    bad = {n: f.cartesian for n, f in findings.items() if f.cartesian}
    assert not bad, (
        f"CartesianProduct in {sorted(bad)} — an unbroadcast cross "
        "join is never acceptable; broadcast the bounded side or "
        "restructure")


def test_bnlj_only_where_whitelisted(findings):
    flagged = {n for n, f in findings.items() if f.bnlj}
    new = flagged - BNLJ_OK
    stale = BNLJ_OK - flagged
    assert not new, (
        f"new BroadcastNestedLoopJoin in {sorted(new)} — either the "
        "broadcast side is unbounded (restructure: equi-join, "
        "block-bucketed join, or broadcast the bounded side "
        "explicitly) or it is provably bounded (add the name to "
        "BNLJ_OK with the bounded side named)")
    assert not stale, (
        f"stale BNLJ_OK entries {sorted(stale)} — these plans no "
        "longer contain a BNLJ; remove them so the whitelist stays "
        "honest")


def test_global_sort_only_on_bounded_reports(findings):
    flagged = {n for n, f in findings.items() if f.global_sorts}
    new = flagged - GLOBAL_SORT_OK
    stale = GLOBAL_SORT_OK - flagged
    assert not new, (
        f"new global Sort in {sorted(new)} — a trailing orderBy on a "
        "corpus-keyed output is a full-range-shuffle tax (the driver "
        "hash and canon compares are order-insensitive; drop the "
        "sort), or if the output relation is bounded add the name to "
        "GLOBAL_SORT_OK with the bound named")
    assert not stale, (
        f"stale GLOBAL_SORT_OK entries {sorted(stale)} — remove them")


def test_windows_partition_scalably(findings):
    flagged = {n for n, f in findings.items() if f.flagged_windows}
    new = flagged - WINDOW_OK
    stale = WINDOW_OK - flagged
    detail = {n: findings[n].flagged_windows for n in sorted(new)}
    assert not new, (
        f"suspicious window partitioning in {detail} — partition on a "
        "bin (functions/ranks.py two-phase discipline) or a "
        "high-cardinality key, or if the relation is bounded add the "
        "name to WINDOW_OK with the bounded relation named")
    assert not stale, (
        f"stale WINDOW_OK entries {sorted(stale)} — remove them")
