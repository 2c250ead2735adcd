"""Degenerate-input robustness (VERDICT r2 item 4): ratio-computing ops
must not raise ANSI DIVIDE_BY_ZERO on pathological-but-valid slices.

The fixture events table is built to hit every guarded denominator at once:
  * one user with a SINGLE event        -> no inter-event gap (count(g)=0
    when it's the only user of its slice)
  * one event_type with CONSTANT value  -> sigma = mad = (vmax-vmin) = 0
  * all timestamps on WEEKDAYS          -> weekend arm empty (n1 = 0 for
    the proportion test, weekend count 0 for lift, KS group empty)

Every op under test must complete and return rows (values may legitimately
be NULL where the statistic is undefined).
"""
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import slowwave_param  # noqa: F401  (r14 slowwave)
from .conftest import SF_SMOKE

#: ops whose denominators the fixture drives to zero
GUARDED = [
    "ts_ks_two_sample",
    "ts_anomaly_zscore",
    "ts_minmax_scale",
    "ts_outlier_mad",
    "ts_weekend_lift",
    "ts_gap_survival",
    "agg_ab_proportion_test",
    "agg_anova_decomposition",
    # correlation family: Spark's built-in corr divides by sqrt(var*var)
    # inside the aggregate and crashes on constant series under ANSI;
    # these use exprs.safe_corr (covar/sd*sd with try_divide, pairwise)
    "agg_stats",
    "ts_autocorr",
    "ts_acf_multi",
    "ts_cross_corr",
    "ts_sax_symbols",
    # round-4 additions: KM terminal row (n_risk = d_events) must emit
    # exact 0.0 (never ln(0)); the backtest's forecast join is empty on
    # single-event users; both must complete on the degenerate slices
    "ts_survival_km",
    "ts_backtest_seasonal_naive",
    # replica means guard empty resamples (HAVING sum(wt)>0)
    "agg_poisson_bootstrap_ci",
    # final-wave round-4 ops with ratio/threshold denominators: must
    # complete on the constant-channel / single-event / weekday slices
    "feat_target_encode", "feat_woe_binning", "feat_calibration_ece",
    "agg_raking_ipf", "agg_diff_in_diff", "graph_neighbor_jaccard",
    "graph_hierarchy_rollup", "ts_granger_lite", "ts_dtw_pairs",
    "ts_holt_winters", "ts_wavelet_haar", "ts_max_drawdown",
    "ts_cohort_ltv_curve", "ts_load_duration_curve", "ts_pareto_front",
    "ts_oee_report", "ts_peak_over_threshold", "ts_event_synchrony",
    "sample_split_temporal", "geo_grid_neighbor_join",
    # round-5 scalable twins: the two-phase rank must survive the same
    # degenerate slices as its baseline (6-row corpus -> ntile(10) with
    # n < tiles, single-row buckets, 80% cutoff on 6 rows)
    "feat_woe_binning_scalable", "feat_gains_table_scalable",
    "feat_auc_roc_scalable", "feat_psi_drift_scalable",
    "feat_time_split_encode_scalable", "sample_split_temporal_scalable",
    # round-10 second wave: constant-value channel (sigma = 0 -> z NULL,
    # nothing clipped), single-purchase users (one demand occasion, no
    # lag), 6-row corpus under ntile(20) bins
    "ts_anomaly_sigma_clip", "ts_croston_sba", "feat_isotonic_calibration",
    "sample_weighted_reservoir",
    # round-10 third wave: <= 2 consecutive-hour pairs (n > 2 filter),
    # tiny calibration slices under the per-channel rank
    "ts_adf_lite", "agg_conformal_interval",
    # round-10 fourth wave: single-point channels (sd undefined -> z
    # NULL), < 24 joint hours (no full window)
    "pipeline_timeseries_audit", "ts_rolling_corr_pair",
    # round-10 fifth wave: 6-row corpus -> tiny/empty test slices
    "ts_backtest_champion",
    # round-10 sixth wave: all-ties var-0 NULL path, tiny commits
    "ts_mann_kendall", "sink_txn_log_snapshot",
    # round-11 wave: empty/near-empty change feeds and slices (a merge
    # where nothing matches, a vacuum over near-empty commits)
    "sink_txn_merge", "sink_txn_vacuum",
    # round-10 seventh wave: 3-click degenerate stream, empty probe side
    "dq_sequence_islands",
]


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_sf")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    # Mon 2024-01-01 .. Fri 2024-01-05, microsecond timestamps — weekday-only
    day_us = 86_400_000_000
    t0 = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
    rows = {
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [t0, t0 + day_us, t0 + 2 * day_us, t0 + 2 * day_us + 1,
               t0 + 3 * day_us, t0 + 4 * day_us],
        # user 1: single event (no gap); user 2: the rest
        "user_id": [1, 2, 2, 2, 2, 2],
        # 'flat' carries one constant value -> sigma/mad/range all zero
        "event_type": ["flat", "flat", "flat", "click", "click", "purchase"],
        "value": [7.0, 7.0, 7.0, 1.0, 2.0, 3.0],
        "props": ['{"k": 1}'] * 6,
    }
    schema = pa.schema([
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ])
    pq.write_table(pa.table(rows, schema=schema), d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("key", [slowwave_param(k) for k in GUARDED])
def test_no_divide_by_zero_on_degenerate_slices(spark, degen_dir, key):
    rows = REGISTRY[key].fn(spark, degen_dir).collect()
    assert isinstance(rows, list)  # completed without raising


@pytest.fixture(scope="module")
def empty_events_dir(tmp_path_factory):
    """A corpus whose events table has ZERO rows — global aggregates see
    count 0, every per-key frame is empty."""
    d = tmp_path_factory.mktemp("empty_events_sf")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    pq.write_table(pa.table({n: [] for n in schema.names}, schema=schema),
                   d / "events.parquet")
    return str(d)


#: global-ratio ops where an empty stream drives count(*) itself to zero
EMPTY_GUARDED = ["ts_conversion_horizons", "ts_gap_survival",
                 "ts_ks_two_sample", "agg_ab_proportion_test",
                 "ts_survival_km", "ts_backtest_seasonal_naive",
                 "ts_downsample_lttb",
                 # final-wave: global order statistics / min(ts) anchors
                 "sample_split_temporal", "ts_dtw_pairs",
                 "feat_woe_binning", "ts_wavelet_haar",
                 "ts_peak_over_threshold",
                 # round-5 twins: empty bucket-count tables must yield
                 # empty (not crashing) ranks/cutoffs
                 "sample_split_temporal_scalable",
                 "feat_woe_binning_scalable", "feat_auc_roc_scalable",
                 # round-9: the compaction pass must survive a fileless
                 # staged tree (explicit-schema read-back) and report a
                 # clean 0-row identity
                 "sink_compact_small_files",
                 # round-10 second wave: empty demand/bin/stats frames
                 "ts_croston_sba", "ts_anomaly_sigma_clip",
                 "feat_isotonic_calibration", "sample_weighted_reservoir",
                 "agg_dp_laplace_counts",
                 # round-10 third wave: zero pairs / zero calibration rows
                 "ts_adf_lite", "agg_conformal_interval",
                 # round-10 fourth wave: empty stage frames end to end
                 "pipeline_timeseries_audit", "ts_rolling_corr_pair",
                 # round-10 fifth wave: empty train/test slices
                 "ts_backtest_champion",
                 # round-10 sixth wave: zero pairs / fileless commits
                 "ts_mann_kendall", "sink_txn_log_snapshot",
                 # round-10 seventh wave: zero islands
                 "dq_sequence_islands",
                 # round-12 (ADVICE r11): MERGE/VACUUM stage counters on a
                 # fileless history must report 0, not NULL
                 "sink_txn_merge", "sink_txn_vacuum",
                 # round-12 wave: checkpoint/optimize/evolve/AS-OF over a
                 # fileless commit history
                 "sink_txn_checkpoint", "sink_txn_optimize",
                 "sink_txn_schema_evolve", "sink_txn_timetravel_ts",
                 # round-12 wave: a two-source drain over empty halves
                 # (outer twin: empty sides pin the watermark at epoch,
                 # zero null rows); zero hours -> zero pairs -> windows
                 "stream_funnel_join", "stream_funnel_join_outer",
                 "ts_rolling_corr_matrix",
                 # stats-less empty slices must stay scanned, not crash
                 "sink_txn_stats_prune",
                 # round-13 wave: an empty stream lands zero epochs /
                 # zero commits; an empty history diffs to zero change
                 # rows; zero-row z-dirs and partition dirs keep their
                 # (absent) stats safely
                 "sink_txn_stream_exactly_once", "sink_txn_changes",
                 "sink_txn_optimize_zorder", "sink_txn_partition_prune",
                 # round-13 second wave: empty per-commit feeds, a
                 # metadata-only restore of an empty history
                 "sink_txn_changes_feed", "sink_txn_restore"]


@pytest.mark.parametrize("key", [slowwave_param(k) for k in EMPTY_GUARDED])
def test_no_crash_on_empty_events(spark, empty_events_dir, key):
    rows = REGISTRY[key].fn(spark, empty_events_dir).collect()
    assert isinstance(rows, list)  # completed without raising


@pytest.fixture(scope="module")
def empty_documents_dir(tmp_path_factory):
    """A corpus whose documents table has ZERO rows — the text/dedup
    pipeline's n_docs caps, tf-idf denominators and shingle streams all
    see an empty corpus (round 5: the events-empty fixture never
    exercised the documents side)."""
    d = tmp_path_factory.mktemp("empty_docs_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64()),
    ])
    pq.write_table(pa.table({n: [] for n in schema.names}, schema=schema),
                   d / "documents.parquet")
    return str(d)


#: documents-driven ops that must survive an empty corpus (measured
#: green round 5; pinned so a future cap/denominator change can't
#: regress them)
EMPTY_DOCS_GUARDED = [
    "text_remove_boilerplate", "text_word_freq", "text_vocab_growth",
    "dedup_near_minhash", "dedup_exact_text", "sample_hash_bucket",
    "feat_hashing_vectorize", "doc_chunk_sliding", "text_line_dedup",
    "text_tfidf_topterms", "dedup_ngram_jaccard", "text_zipf_fit",
    "sample_mix_temperature", "text_lang_id", "dedup_cluster_cc",
    "text_bm25_retrieval", "mm_image_decode",
    # round-6 content-level multimodal
    "mm_phash_dedup", "mm_audio_fingerprint_dedup", "mm_video_scene_cuts",
    # round-9 additions (empty corpus -> empty model/vocab, empty packs,
    # empty budget/chunk audits; calibration sees zero docs in zero
    # deciles)
    "text_quality_model", "text_quality_calibration",
    "doc_truncate_budget_bpe", "doc_chunk_sliding_bpe",
    "doc_pack_nextfit_bpe", "stream_quality_scores",
    # round-10 second wave: zero docs -> zero windows, NULL-free output
    "text_substring_dedup",
    # round-10 fifth wave: zero blobs -> empty hash groups
    "mm_exact_blob_dedup",
    # round-12: zero docs -> zero classes, empty model, empty grid;
    # zero docs -> all-sentinel merge table, empty encode pass; the
    # calibration sees zero docs in zero deciles
    "text_langid_model", "doc_tokenize_bpe64", "text_langid_calibration",
]


@pytest.mark.parametrize("key", [slowwave_param(k) for k in EMPTY_DOCS_GUARDED])
def test_no_crash_on_empty_documents(spark, empty_documents_dir, key):
    rows = REGISTRY[key].fn(spark, empty_documents_dir).collect()
    assert isinstance(rows, list)  # completed without raising


@pytest.fixture(scope="module")
def empty_embeddings_dir(tmp_path_factory):
    """Zero vectors: k-means training, PQ codebook sampling, LSH plane
    projections and every recall eval see an empty corpus."""
    d = tmp_path_factory.mktemp("empty_emb_sf")
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ])
    pq.write_table(pa.table({n: [] for n in schema.names}, schema=schema),
                   d / "embeddings.parquet")
    return str(d)


EMPTY_EMB_GUARDED = [
    "sim_cosine_topk", "emb_quantize_int8", "sim_lsh_bucketed",
    "sim_ivf_scalable_topk", "sim_pq_topk", "sim_ivfpq_topk",
    "sim_ivf_incremental_assign", "emb_random_projection",
    "sim_matryoshka_recall", "dedup_embedding_cosine",
    # round-6 index persistence (empty corpus -> fileless parquet dirs;
    # readers pass explicit schemas)
    "sim_index_persist", "sim_ann_serve_persisted",
    # round-8 semantic dedup family (empty corpus -> empty trainer,
    # empty cells, empty drop list; the streaming twin stages two empty
    # arrival files and drains zero drops)
    "dedup_semantic_embedding", "dedup_semantic_incremental",
    "stream_semantic_ingest",
    # round-9: the two-level family additions (empty corpus -> empty
    # coarse cells, empty split counts, empty pair graph / eval row)
    "dedup_semantic_cluster_cc", "sim_twolevel_recall_eval",
    # round-10 third wave: empty signature frame -> empty candidates
    "sim_lsh_radius_search",
]


@pytest.mark.parametrize("key", [slowwave_param(k) for k in EMPTY_EMB_GUARDED])
def test_no_crash_on_empty_embeddings(spark, empty_embeddings_dir, key):
    rows = REGISTRY[key].fn(spark, empty_embeddings_dir).collect()
    assert isinstance(rows, list)  # completed without raising
