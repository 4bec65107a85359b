"""Partition-count independence: the engine's determinism claims say
results never depend on the shuffle layout. Rerun representative keys
under different spark.sql.shuffle.partitions settings and require
IDENTICAL collected rows -- the property that separates deterministic
hash sampling / sketches / rank rules from accidental
partition-sensitive code (first() on unordered frames, float sum
order, nondeterministic tie-breaks)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

#: keys whose determinism story is load-bearing: hash sampling, sketch
#: registers, rank tie-breaks, prefix sums, window ordering.
KEYS = [
    "quantile_sketch_hash",
    "hll_distinct",
    "hll_sliding_distinct",
    "kmv_set_ops",
    "weighted_sample_systematic",
    "train_test_split",
    "percentile_normalize",
    "session_paths_topk",
    "zorder_layout",
    "simpson_diversity",
    "winsorized_mean",
    "funnel_time_bounded",
    "bpe_learn_merges",
    "sample_deterministic",
    "corpus_mix",
    "histogram_equi_depth",
    "top_n_per_group",
    "mode_per_group",
    # r9 additions: whitened top-k cut, probe-radius recall counts,
    # pair-cache census, merge induction + encode
    "embedding_whiten_topk",
    "ann_nprobe_sweep",
    "simhash_recall_by_tau",
    "bpe_encode_corpus",
    "source_embedding_drift",
    "dup_inflation_report",
    "hll_distinct_prod_m",
    # r10 additions: pair census, prefix-sum telemetry, greedy argmax,
    # water-fill allocation (windowed prefix + remainder distribution)
    "cross_source_ngram_overlap",
    "pack_efficiency_report",
    "mmr_diversify_topk",
    "corpus_budget_waterfill",
    # r11 additions: five greedy chains + scalar trade-off axes,
    # PQ argmin encoding + ADC rank, idf-weighted rescoring
    "mmr_lambda_sweep",
    "ann_pq_adc",
    "dedup_weighted_jaccard",
    "lsh_band_sweep",
    "pq_recall_sweep",
    "sessionize_gap_sweep",
    # trained PQ codebooks: partial-agg micro-unit means + e6 argmin
    "ann_pq_kmeans",
    # IVFADC: cell routing + residual argmin + LUT-sum ranking
    "ann_ivf_pq",
    # composite-key Lloyd sweep: micro-unit means + e6 argmin per k
    "kmeans_k_sweep",
    # bounded top-V type rank: global tie-break (cnt desc, tok asc)
    "vocab_coverage_sweep",
    # QI grouped count + grid join; left-join zero-fill determinism
    "k_anonymity_report",
    # norm-partition window count + band CASE; planted two-tier copies
    "dup_quality_report",
    # one hash pass crossed with the m grid; distinct + left-anti flag
    "bloom_fpr_sweep",
    # stacked QI aggregates + grid; left-join zero-fill determinism
    "l_diversity_report",
    # keyed running-max window over the scrambled arrival order
    "watermark_lateness_sweep",
    # full-outer fusion of two rankings + integer RRF re-rank
    "rank_fusion_rrf",
    # per-table conditional agg + stack; union of table legs
    "dq_accepted_values",
    # (query, dim)-partitioned rank over prefix-slice cosines
    "emb_dim_truncation_sweep",
    # late-r11 sweep axes: df-capped pair machinery per n, one-pass
    # register ladder, nested band layouts
    "shingle_size_sweep",
    "hll_precision_sweep",
    "simhash_band_sweep",
    # IVFADC: grid-sliced cell scans + residual-trained codebooks
    "ivfadc_nprobe_sweep",
    "ann_ivf_pq_kmeans",
    # register merge: per-bucket max across scopes, dyadic est sums
    "hll_merge_by_type",
    # order-statistics merge: per-source k-min rank + distinct union
    "kmv_merge_by_source",
    # linear merge: partial-agg cells summed cell-wise across scopes
    "cms_merge_by_source",
    # trained IVFADC probe dial: grid-sliced scored frame + index cb
    "ivfadc_trained_nprobe",
    # r13 wave 2/3: integer A-Res race + bucket-census cutoff; ordered
    # lag kernels; tie-averaged double ranks; TakeOrdered df anchors +
    # sorted collect_list; doc-grain census joins; correlated window
    # min with explicit tie-breaks; running-mean prefix quantization
    "weighted_reservoir_sample",
    "holt_winters_seasonal",
    "spearman_rho_daily",
    "vocab_df_zipf",
    "doc_idf_profile",
    "doc_boilerplate_simpson",
    "source_df_zipf",
    "page_hinkley_drift",
    "funnel_time_to_convert",
    "q2_min_cost_supplier",
    # directed rule table: three integer rationals off the pair census
    "association_rules",
]


def _run(spark, key, n_parts):
    import __spark_entry__ as entry

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        rows = entry.queries()[key](spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("key", KEYS)
def test_results_invariant_to_shuffle_partitions(spark, key):
    a = _run(spark, key, 3)
    b = _run(spark, key, 13)
    assert a == b, f"{key} depends on the shuffle partition count"
