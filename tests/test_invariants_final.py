"""Algebraic invariants of the final-wave round-4 operators — properties
the oracle parity can't express (it pins values; these pin the SHAPE a
consumer relies on: monotonicity, bounds, margin identities)."""
from collections import defaultdict

import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2


def _rows(spark, key):
    return REGISTRY[key].fn(spark, SF_T2).collect()


def test_granger_extra_regressor_never_hurts(spark):
    """Exact OLS: adding A_{t-1} cannot reduce R² (up to the 1e-9
    fixed-point flooring of the moment sums)."""
    rows = _rows(spark, "ts_granger_lite")
    assert rows
    for r in rows:
        if r["r2_base"] is not None and r["r2_full"] is not None:
            assert r["r2_full"] >= r["r2_base"] - 1e-5, (
                f"{r['cause']}->{r['effect']}: R² dropped with an "
                f"extra regressor")


def test_ipf_column_margins_match_target(spark):
    """After the final column-scaling round, every isodow's total weight
    must equal n_all / n_days exactly (that's what the last scaling
    enforced); row margins are within IPF convergence distance."""
    rows = _rows(spark, "agg_raking_ipf")
    assert rows
    n_all = sum(r["n_raw"] for r in rows)
    days = {r["isodow"] for r in rows}
    target = n_all / len(days)
    col_tot = defaultdict(float)
    for r in rows:
        col_tot[r["isodow"]] += r["weight_total"]
    for d, w in col_tot.items():
        assert abs(w - target) < 1e-3, f"isodow {d}: {w} != {target}"


def test_oee_factor_bounds(spark):
    """Each OEE factor lies in (0, 1]; the OEE is their product, so it
    can't exceed any single factor."""
    rows = _rows(spark, "ts_oee_report")
    assert rows
    for r in rows:
        for f in ("availability", "performance"):
            assert 0.0 < r[f] <= 1.0 + 1e-9, f"{r['event_type']}.{f}"
        # quality is 0 by definition for the all-error channel
        assert 0.0 <= r["quality"] <= 1.0 + 1e-9
        m = min(r["availability"], r["performance"], r["quality"])
        assert r["oee"] <= m + 1e-6


def test_pot_exceedance_stats_sane(spark):
    """~5% of each channel exceeds its P95 threshold; mean excess is
    strictly positive."""
    rows = _rows(spark, "ts_peak_over_threshold")
    assert rows
    for r in rows:
        assert r["n_exc"] > 0
        assert r["mean_excess"] > 0.0


def test_ece_bounds(spark):
    """Per-bin gaps and the total ECE live in [0, 1]; the ECE is the
    frequency-weighted mean gap, so it can't exceed the max gap."""
    rows = _rows(spark, "feat_calibration_ece")
    assert rows
    max_gap = max(r["gap"] for r in rows)
    for r in rows:
        assert 0.0 <= r["gap"] <= 1.0
        assert 0.0 <= r["ece"] <= max_gap + 1e-6


@pytest.mark.slowwave
def test_mmr_first_pick_is_cosine_top1(spark):
    """With nothing picked yet, MMR's k=1 selection IS the plain cosine
    argmax — the diversity penalty only exists from k=2 on."""
    mmr = {(r["q_vec_id"], r["k"]): r["vec_id"]
           for r in _rows(spark, "sim_mmr_diversify")}
    top = {r["q_vec_id"]: r["doc_id"]
           for r in _rows(spark, "sim_doc_retrieval") if r["rnk"] == 1}
    for q in {k[0] for k in mmr}:
        if q in top:
            assert mmr[(q, 1)] == top[q], f"query {q}: k=1 != cosine top1"


@pytest.mark.slowwave
def test_mmr_picks_distinct_per_query(spark):
    rows = _rows(spark, "sim_mmr_diversify")
    per_q = defaultdict(list)
    for r in rows:
        per_q[r["q_vec_id"]].append(r["vec_id"])
    for q, picks in per_q.items():
        assert len(picks) == len(set(picks)) == 5, f"query {q}"


def test_drawdown_nonnegative_and_bounded(spark):
    """Max drawdown is >= 0 and cannot exceed the user's cumulative
    range; trough timestamp exists whenever drawdown > 0."""
    rows = _rows(spark, "ts_max_drawdown")
    assert rows
    for r in rows:
        assert r["max_drawdown"] >= 0.0
        assert r["trough_ts"] is not None


def test_load_duration_curve_monotone(spark):
    """The curve is non-increasing in pct within each channel, starts at
    the channel max."""
    per = defaultdict(list)
    for r in _rows(spark, "ts_load_duration_curve"):
        per[r["event_type"]].append((r["pct"], r["load_at_pct"]))
    assert per
    for t, pts in per.items():
        pts.sort()
        assert pts[0][0] == 0, f"{t}: curve must start at pct=0"
        loads = [v for _, v in pts]
        assert all(a >= b for a, b in zip(loads, loads[1:])), (
            f"{t}: curve not non-increasing")


def test_pareto_front_is_mutually_nondominated(spark):
    """No skyline point may dominate another on (value, t_us) within a
    channel — the defining property, checked pairwise on the (small)
    front itself."""
    per = defaultdict(list)
    for r in _rows(spark, "ts_pareto_front"):
        per[r["event_type"]].append((r["value"], r["t_us"]))
    assert per
    for t, pts in per.items():
        for i, (v1, t1) in enumerate(pts):
            for v2, t2 in pts[i + 1:]:
                dominates = ((v1 >= v2 and t1 >= t2 and (v1 > v2 or t1 > t2))
                             or (v2 >= v1 and t2 >= t1
                                 and (v2 > v1 or t2 > t1)))
                assert not dominates, f"{t}: dominated point on the front"


def test_bpe_merges_never_lengthen(spark):
    """Every segmentation has n_units <= n_chars, and joining the units
    back (dropping spaces) reproduces the token exactly."""
    rows = _rows(spark, "text_bpe_lite")
    assert rows
    assert any(r["n_units"] < r["n_chars"] for r in rows), (
        "no merge fired on the top-20 tokens — merge table broken")
    for r in rows:
        assert r["n_units"] <= r["n_chars"]
        assert r["seg"].replace(" ", "") == r["token"]


def test_wavelet_level1_reconstructs_pairs(spark):
    """Haar identity: for a complete (even-indexed) pair, a+d = x_even
    and a-d = x_odd. Verified per channel on hours 0 and 1 against the
    raw hourly means recomputed here."""
    import pyspark.sql.functions as F
    from industry_big_data_time_sequence_process_spark.sources.io import load

    coefs = {(r["event_type"], r["level"], r["k"], r["coef_type"]):
             r["coef"] for r in _rows(spark, "ts_wavelet_haar")}
    ev = load(spark, SF_T2, "events")
    t0 = ev.agg(F.min(F.unix_micros("ts")).alias("t0"))
    hourly = (ev.crossJoin(F.broadcast(t0))
                .withColumn("h", F.floor(
                    (F.unix_micros("ts") - F.col("t0")) / 3_600_000_000)
                    .cast("long"))
                .filter(F.col("h") < 2)
                .groupBy("event_type", "h")
                .agg((F.sum(F.col("value").cast("decimal(18,2)"))
                       .cast("double") / F.count("*")).alias("v"))
                .collect())
    x = {(r["event_type"], r["h"]): r["v"] for r in hourly}
    checked = 0
    for (t, h0), v0 in x.items():
        if h0 != 0 or (t, 1) not in x:
            continue
        d = coefs.get((t, 1, 0, "detail"))
        if d is None:
            continue
        v1 = x[(t, 1)]
        a = (v0 + v1) / 2
        # coef is floored onto the 1e-6 grid -> tolerance 2e-6
        assert abs((a - d) - v1) < 2e-6 or abs(d - (v0 - v1) / 2) < 2e-6
        checked += 1
    assert checked > 0, "no complete level-1 pair found to check"
