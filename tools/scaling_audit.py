"""10x scaling audit (VERDICT r3 item #8).

Builds a deterministic "sf1" corpus — 10x the sf0.1 events/documents/
embeddings — under ``.scratch/sf1``, then times the SCALE.md heavy-op set
at sf0.1 and sf1 and prints per-op wall times and the measured scaling
exponent  e = log10(t_sf1 / t_sf0.1)  (e = 1 is perfectly linear; fixed
per-job overhead deflates e at these sizes, so e slightly below 1 is
expected for linear ops).

Replication is DISJOINT by construction, so 10x means 10x more entities,
not 10x denser duplicates:

- events: 10 clones; user_id/event_id offset per clone (10x users, same
  per-user density/timestamps — the distribution shape scales, hot-key
  structure does not sharpen artificially).
- documents: every token suffixed with the clone id -> clone vocabularies
  are disjoint; the planted near-dup structure repeats per clone instead
  of collapsing into cross-clone duplicate clusters.
- embeddings: vectors np.roll'ed by clone -> norms preserved, directions
  decorrelated across clones. CAVEAT (measured round 9): the roll wraps
  at the 64-dim boundary, so at --clones 100 the clones 64-99 EXACTLY
  duplicate clones 0-35 (cos = 1.0) — the 100x corpus carries ~72k true
  duplicate pairs. The 10x default is unaffected (rolls 0-9); the
  audit100 semantic pin embraces the wrap (it verifies the dedup pass
  FINDS those pairs and nothing else), and the ANN recall pins compare
  against brute-force truth on the same corpus, so they stay fair.

Usage:  python tools/scaling_audit.py              # full audit (~minutes)
        python tools/scaling_audit.py --gen        # only (re)build sf1
        python tools/scaling_audit.py op1 op2 ...  # audit only these ops
"""
from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: --clones N picks the replication factor (default 10 -> ".scratch/sf1";
#: 100 -> ".scratch/sf10") — exponents are normalized by log10(CLONES), so
#: a 100x run measures the same e on a decade-wider lever arm.
CLONES = (int(sys.argv[sys.argv.index("--clones") + 1])
          if "--clones" in sys.argv else 10)
SF1 = os.path.join(REPO, ".scratch", f"sf{CLONES // 10}")

#: The heavy-op set (SCALE.md), grouped by the table that scales.
OPS = [
    # events-driven
    "ts_sessionize", "ts_sessionize_bucketed", "ts_resample_1h",
    "join_asof_backward", "agg_hhi_concentration", "ts_window_features",
    "ts_survival_km", "ts_backtest_seasonal_naive", "ts_downsample_lttb",
    # documents-driven
    "dedup_exact_text", "text_word_freq", "text_tfidf_topterms",
    "dedup_ngram_jaccard", "dedup_near_minhash", "dedup_cluster_cc",
    "text_decontaminate",
    # embeddings-driven
    "sim_cosine_topk", "sim_ivf_topk", "sim_ivf_scalable_topk",
    "sim_lsh_bucketed", "emb_quantize_int8", "sim_pq_topk",
    "sim_doc_retrieval",
    # late-round-4 additions (events / documents / embeddings; the
    # lineitem-driven agg_triangle_count is excluded — the audit corpus
    # does not scale lineitem, so its exponent would be meaningless)
    "ts_theil_sen", "ts_ewma_timedecay", "agg_poisson_bootstrap_ci",
    "agg_cms_heavy_hitters", "agg_sample_quantile_bounds",
    "doc_pack_nextfit", "sample_mix_temperature",
    "emb_pca_power_iteration",
    # final-session additions (events / documents)
    "sample_negative_pairs", "sample_split_temporal",
    "graph_neighbor_jaccard", "dedup_lsh_tuning_curve",
    "text_bm25_retrieval", "sim_hybrid_rrf", "doc_chunk_sliding",
    "ts_holt_winters", "ts_wavelet_haar", "ts_max_drawdown",
    "ts_cohort_ltv_curve", "ts_load_duration_curve", "ts_pareto_front",
    "geo_grid_neighbor_join", "graph_hierarchy_rollup",
    "ts_event_synchrony", "sim_mmr_diversify", "text_bpe_lite",
    "emb_random_projection", "sim_jl_ndcg_eval", "ts_anomaly_seasonal_mad",
    "agg_propensity_stratified", "ts_session_paths", "feat_auc_roc",
    "text_ngram_novelty", "feat_psi_drift", "ts_peak_over_threshold",
    "dq_referential_integrity", "ts_granger_lite", "ts_interrupted_series",
    # round-5 additions: composed ANN stack, incremental ingest, the
    # scale-safe rank/quantile twins, and the cleaning/monitoring ops
    "sim_ivfpq_topk", "sim_ivf_incremental_assign",
    "text_remove_boilerplate", "dq_load_anomaly",
    "feat_woe_binning_scalable", "feat_gains_table_scalable",
    "feat_auc_roc_scalable", "sample_split_temporal_scalable",
    "win_ntile_scalable", "win_range_numeric_scalable",
    "win_rank_dense_scalable",
    # round-7 second-wave additions (events / documents; the
    # lineitem-driven graph_copurchase_triangles is excluded for the
    # same reason as agg_triangle_count — lineitem does not scale here)
    "ts_markov_transitions", "ts_retention_triangle", "ts_ohlc_hourly",
    "ts_trend_seasonal_residual", "ts_interarrival_stats",
    "feat_pit_features", "cdc_apply_changes", "text_prefix_dedup",
    # round-7 first/third-wave additions (events-driven)
    "ts_acf_lags", "ts_changepoint_sse", "text_rake_keywords",
    "sample_reservoir_per_key", "ts_bollinger_breach", "ts_rsi_sma",
    "ts_anomaly_mad", "ts_active_streaks", "ts_pop_hourly",
    "text_readability",
    # round-7 fourth-wave additions (events / embeddings)
    "ts_stochastic_osc", "ts_dow_hod_heatmap", "ts_range_vol_daily",
    "ts_channel_corr_matrix", "ts_behavior_shift_days",
    "sample_walkforward_cv", "emb_dim_variance_prune",
    # round-7 fifth-wave additions (events / documents; the
    # lineitem-driven dq_pk_uniqueness / graph_label_propagation are
    # excluded — lineitem does not scale in this corpus)
    "ts_runs_test", "ts_seasonal_strength", "doc_truncate_budget",
    # round-8 additions (embeddings / documents / events / orders)
    "dedup_semantic_embedding", "dedup_semantic_incremental",
    "sample_domain_mix", "ts_ljung_box", "dq_benford_check",
    # round-9 additions (documents / events / embeddings)
    "text_quality_model", "doc_truncate_budget_bpe",
    "doc_chunk_sliding_bpe", "sink_compact_small_files",
    "doc_pack_nextfit_bpe", "text_quality_calibration",
    "dedup_semantic_cluster_cc", "sim_twolevel_recall_eval",
    # round-10 second-wave additions (documents / events)
    "text_substring_dedup", "sample_weighted_reservoir",
    "ts_croston_sba", "ts_anomaly_sigma_clip",
    "feat_isotonic_calibration",
    # round-10 third-wave additions (events / embeddings; the
    # lineitem-driven graph_bfs_layers is excluded — lineitem does not
    # scale in this corpus)
    "ts_adf_lite", "agg_conformal_interval", "sim_lsh_radius_search",
    # round-10 fourth-wave additions (events)
    "pipeline_timeseries_audit", "ts_rolling_corr_pair",
    # round-10 fifth-wave additions (documents / events)
    "mm_exact_blob_dedup", "ts_backtest_champion",
    # round-10 sixth-wave additions (events)
    "ts_mann_kendall", "sink_txn_log_snapshot",
    # round-10 seventh-wave addition (events)
    "dq_sequence_islands",
]

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def build_corpus(clones: int, out_dir: str, src: str = SF01) -> None:
    """Build the deterministic ``clones``x audit corpus under ``out_dir``
    (disjoint replication — see module docstring). Importable so the
    recall-pin tests (tests/test_ivf.py) build the SAME corpora the
    audit measures, instead of a private variant."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t not in ("events", "documents", "embeddings",
                     "orders", "customer"):
            shutil.copy(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")

    SF01_, SF1_, CLONES_ = src, out_dir, clones  # keep body below verbatim
    return _build_body(SF01_, SF1_, CLONES_)


def build_sf1() -> None:
    build_corpus(CLONES, SF1)


def _build_body(SF01: str, SF1: str, CLONES: int) -> None:
    ev = pq.read_table(f"{SF01}/events.parquet")
    uid_span = pc.max(ev["user_id"]).as_py() + 1
    eid_span = pc.max(ev["event_id"]).as_py() + 1

    # orders/customer scale WITH the cloned users (custkey lives in the
    # same id space as user_id), so user-keyed event⋈order ops (as-of,
    # interval joins) measure honestly instead of joining clones against
    # nothing.
    orders = pq.read_table(f"{SF01}/orders.parquet")
    okey_span = pc.max(orders["o_orderkey"]).as_py() + 1
    parts = []
    for i in range(CLONES):
        c = orders
        c = c.set_column(c.schema.get_field_index("o_custkey"), "o_custkey",
                         pc.add(orders["o_custkey"], i * uid_span))
        c = c.set_column(c.schema.get_field_index("o_orderkey"),
                         "o_orderkey",
                         pc.add(orders["o_orderkey"], i * okey_span))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), f"{SF1}/orders.parquet")

    cust = pq.read_table(f"{SF01}/customer.parquet")
    parts = []
    for i in range(CLONES):
        c = cust.set_column(cust.schema.get_field_index("c_custkey"),
                            "c_custkey",
                            pc.add(cust["c_custkey"], i * uid_span))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), f"{SF1}/customer.parquet")
    parts = []
    for i in range(CLONES):
        c = ev
        c = c.set_column(c.schema.get_field_index("user_id"), "user_id",
                         pc.add(ev["user_id"], i * uid_span))
        c = c.set_column(c.schema.get_field_index("event_id"), "event_id",
                         pc.add(ev["event_id"], i * eid_span))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), f"{SF1}/events.parquet")

    doc = pq.read_table(f"{SF01}/documents.parquet")
    did_span = pc.max(doc["doc_id"]).as_py() + 1
    texts = doc["text"].to_pylist()
    parts = []
    for i in range(CLONES):
        suf = f"c{i}"
        new_texts = [" ".join(tok + suf for tok in s.split(" "))
                     for s in texts]
        parts.append(pa.table({
            "doc_id": pc.add(doc["doc_id"], i * did_span),
            "text": pa.array(new_texts, type=pa.string()),
            "lang": doc["lang"], "source": doc["source"],
            "n_chars": pa.array([len(s) for s in new_texts],
                                type=pa.int64()),
        }))
    pq.write_table(pa.concat_tables(parts), f"{SF1}/documents.parquet")

    emb = pq.read_table(f"{SF01}/embeddings.parquet")
    vid_span = pc.max(emb["vec_id"]).as_py() + 1
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    parts = []
    for i in range(CLONES):
        rolled = np.roll(vecs, i, axis=1)
        parts.append(pa.table({
            "vec_id": pc.add(emb["vec_id"], i * vid_span),
            "embedding": pa.array(rolled.tolist(),
                                  type=pa.list_(pa.float32())),
            "label": emb["label"],
        }))
    pq.write_table(pa.concat_tables(parts), f"{SF1}/embeddings.parquet")
    print(f"built {SF1}: events x{CLONES}, documents x{CLONES}, "
          f"embeddings x{CLONES}")


def _reset_semantic_memo() -> None:
    """Drop the per-(appId, sf_dir) semantic index memo (round 9) so
    every timed run pays the FULL build+pairs cost — without this the
    sf0.1 min-of-2 would measure a warm serve-only pass against a cold
    build+serve pass at sf1 and inflate the exponent artificially."""
    from industry_big_data_time_sequence_process_spark.operators import (
        similarity as S)
    with S._SEMDEDUP_LOCK:
        evicted = [S._SEMDEDUP_CACHE.pop(k)
                   for k in list(S._SEMDEDUP_CACHE)]
    for val in evicted:
        for f in (val if isinstance(val, tuple) else (val,)):
            try:
                f.unpersist(blocking=False)
            except Exception:
                pass


def time_op(fn, spark, sf_dir: str, runs: int, key: str = "") -> float:
    best = math.inf
    for _ in range(runs):
        if key.startswith("dedup_semantic"):
            _reset_semantic_memo()
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        best = min(best, time.monotonic() - t0)
    return best


def semantic_pair_volume(spark, sf_dir: str, occ: int) -> dict:
    """Candidate-volume measurement for the r9 two-level semantic index:
    (single-level Σ|cell|², two-level Σ|sub-cell|², max sub-cell) at
    ``occ`` — the quantity VERDICT r8 #1's done-criterion bounds. Run
    via ``--semantic-pairs``; results recorded in SCALE.md."""
    from pyspark.sql import functions as F

    from industry_big_data_time_sequence_process_spark.operators import (
        similarity as S)
    from industry_big_data_time_sequence_process_spark.sources.io import load

    e = load(spark, sf_dir, "embeddings")
    cells = S._ivf_cells_scalable(e).cache()
    s1 = (cells.groupBy("cid").count()
               .agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0])
    sub, _sc = S._twolevel_from_cells(cells, occ)
    r = (sub.groupBy("cid", "scid").count()
            .agg(F.sum(F.col("count") * F.col("count")).alias("s2"),
                 F.max("count").alias("mx")).collect()[0])
    sub.unpersist()
    cells.unpersist()
    return {"n": e.count(), "occ": occ, "single_sum_sq": int(s1),
            "two_level_sum_sq": int(r["s2"]), "max_subcell": int(r["mx"])}


def main() -> None:
    if not os.path.exists(f"{SF1}/embeddings.parquet") or "--gen" in sys.argv:
        build_sf1()
    if "--gen" in sys.argv:
        return

    from industry_big_data_time_sequence_process_spark.registry import REGISTRY
    from industry_big_data_time_sequence_process_spark.session import get_session

    spark = get_session()
    # warm the JVM/codegen before timing
    REGISTRY["ts_resample_1h"].fn(spark, SF01).count()

    argv = sys.argv[1:]
    if "--clones" in argv:
        i = argv.index("--clones"); argv = argv[:i] + argv[i + 2:]

    if "--semantic-pairs" in argv:
        occ = 8  # split-engaged at both scales (see SCALE.md round 9)
        out = {}
        for tag, d in (("sf0.1", SF01), ("sf1", SF1)):
            out[tag] = semantic_pair_volume(spark, d, occ)
            print(tag, out[tag], flush=True)
        e_two = math.log10(out["sf1"]["two_level_sum_sq"]
                           / out["sf0.1"]["two_level_sum_sq"]) \
            / math.log10(CLONES)
        e_one = math.log10(out["sf1"]["single_sum_sq"]
                           / out["sf0.1"]["single_sum_sq"]) \
            / math.log10(CLONES)
        print(json.dumps({"pair_volume": out,
                          "exponent_two_level": round(e_two, 2),
                          "exponent_single_level": round(e_one, 2)}))
        return

    chosen = [a for a in argv if not a.startswith("--")]
    results = {}
    for key in (chosen or OPS):
        fn = REGISTRY[key].fn
        t01 = time_op(fn, spark, SF01, runs=2, key=key)
        t1 = time_op(fn, spark, SF1, runs=1, key=key)
        exp = math.log10(t1 / t01) / math.log10(CLONES)
        results[key] = {"sf0.1_s": round(t01, 3), "sf1_s": round(t1, 3),
                        "exponent": round(exp, 2)}
        flag = "  <-- SUPER-LINEAR" if exp > 1.15 else ""
        print(f"{key:28s} sf0.1={t01:7.2f}s  sf1={t1:8.2f}s  "
              f"e={exp:5.2f}{flag}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
