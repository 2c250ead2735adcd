"""Semantic tests for the seventh round-7 wave (SURVEY.md §2.24) — beyond
oracle parity: hand-recomputed SRM chi-square / MDE / KS statistics,
Lorenz-curve invariants, seasonal-impute provenance on a hand-built
spine, STL-residual flag recomputation, and class-balance ground truth."""
import hashlib
import math

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    relational, sampling, timeseries,
)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def _utc_literal(*ymd):
    """A UTC calendar instant rendered the way PySpark renders collected
    timestamps (naive, in the PROCESS timezone) — so comparisons against
    collected values hold on non-UTC machines too."""
    import calendar
    import datetime as _dt
    return _dt.datetime.fromtimestamp(
        calendar.timegm(_dt.datetime(*ymd).timetuple()))


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _events(spark):
    return (load(spark, SF_T2, "events")
            .select("user_id", "event_id", "ts",
                    (F.col("value").cast("decimal(18,2)") * 100)
                    .cast("long").alias("cents"))
            .collect())


def test_srm_recompute(spark):
    row = relational.agg_srm_check(spark, SF_T2).first()
    users = {r["user_id"] for r in _events(spark)}
    n0 = sum(1 for u in users if _h32(str(u)) % 2 == 0)
    n1 = len(users) - n0
    chi2 = (n0 - n1) ** 2 / len(users)
    assert (row["n_users"], row["n_control"], row["n_treat"]) \
        == (len(users), n0, n1)
    assert abs(row["chi2"] - round(chi2, 6)) < 1e-9
    assert row["srm_flag"] == int(chi2 > 3.841459)


def test_power_mde_recompute(spark):
    row = relational.agg_ab_power_mde(spark, SF_T2).first()
    cut = _utc_literal(2024, 1, 16)
    per = {}
    for r in _events(spark):
        per[r["user_id"]] = per.get(r["user_id"], 0) \
            + (r["cents"] if r["ts"] >= cut else 0)
    arms = {0: [], 1: []}
    for u, y in per.items():
        arms[_h32(str(u)) % 2].append(y)
    n0, n1 = len(arms[0]), len(arms[1])
    ss = sum(sum(v * v for v in ys) - sum(ys) ** 2 / len(ys)
             for ys in arms.values())
    s2 = ss / (n0 + n1 - 2)
    mde = (1.959964 + 0.841621) * math.sqrt(s2 * (1 / n0 + 1 / n1))
    mean0 = sum(arms[0]) / n0
    assert (row["n_control"], row["n_treat"]) == (n0, n1)
    assert abs(row["mean_control"] - round(mean0 / 100, 6)) < 1e-6
    assert abs(row["mde_abs"] - round(mde / 100, 6)) < 1e-6
    assert abs(row["mde_rel"] - round(mde / mean0, 6)) < 1e-6
    # an MDE is a positive effect size; relative MDE is a fraction of
    # the control mean
    assert row["mde_abs"] > 0 and row["mde_rel"] > 0


def test_ks_recompute(spark):
    row = relational.agg_ks_two_sample(spark, SF_T2).first()
    cut = _utc_literal(2024, 1, 16)
    pre = sorted(r["cents"] for r in _events(spark) if r["ts"] < cut)
    post = sorted(r["cents"] for r in _events(spark) if r["ts"] >= cut)
    grid = sorted(set(pre) | set(post))
    import bisect
    d = max(abs(bisect.bisect_right(pre, v) / len(pre)
                - bisect.bisect_right(post, v) / len(post))
            for v in grid)
    assert (row["n_pre"], row["n_post"]) == (len(pre), len(post))
    assert abs(row["ks_stat"] - round(d, 6)) < 1e-9
    assert 0.0 <= row["ks_stat"] <= 1.0


def test_lorenz_curve_invariants(spark):
    rows = sorted(relational.agg_lorenz_deciles(spark, SF_T2).collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # equal-count bins (within 1 for non-divisible user counts)
    counts = [r["n_users"] for r in rows]
    assert max(counts) - min(counts) <= 1
    # Lorenz curve: cumulative share is nondecreasing, convex-ish
    # (later deciles add more), and ends at exactly 1
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-9
    incr = [b - a for a, b in zip([0.0] + shares, shares)]
    assert all(b >= a - 1e-9 for a, b in zip(incr, incr[1:]))
    # hand recomputation of the full curve
    per = {}
    for r in _events(spark):
        per[r["user_id"]] = per.get(r["user_id"], 0) + r["cents"]
    ranked = sorted(per.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    want = {}
    for i, (_u, c) in enumerate(ranked):
        d = i * 10 // n + 1
        nu, s = want.get(d, (0, 0))
        want[d] = (nu + 1, s + c)
    tot = sum(s for _n, s in want.values())
    cum = 0
    for r in rows:
        nu, s = want[r["decile"]]
        cum += s
        assert r["n_users"] == nu
        assert abs(r["decile_value"] - round(s / 100, 6)) < 1e-9
        assert abs(r["cum_share"] - round(cum / tot, 6)) < 1e-9


def test_impute_seasonal_provenance(spark):
    df = timeseries.ts_impute_seasonal(spark, SF_T2).cache()
    try:
        # pick the user with the most imputed buckets
        uid = (df.groupBy("user_id")
                 .agg(F.sum("imputed").alias("k"))
                 .orderBy(F.desc("k"), "user_id").first()["user_id"])
        rows = {r["bucket"]: r for r in
                df.filter(F.col("user_id") == uid).collect()}
        # hand-build the hourly series for that user
        ev = [r for r in _events(spark) if r["user_id"] == uid]
        hourly = {}
        for r in ev:
            h = int(r["ts"].timestamp()) // 3600
            hourly.setdefault(h, []).append(r["cents"])
        # mirror the engine's float op order: dollars first, then /count
        mfx = {h: math.floor(sum(v) / 100 / len(v) * 10000)
               for h, v in hourly.items()}
        h0, h1 = min(mfx), max(mfx)
        # spine is contiguous over the observed span
        assert len(rows) == h1 - h0 + 1
        hod = {}
        for h, v in mfx.items():
            hod.setdefault(h % 24, []).append(v)
        hodm = {k: math.floor(sum(v) / len(v)) for k, v in hod.items()}
        gm = math.floor(sum(mfx.values()) / len(mfx))
        import datetime
        for h in range(h0, h1 + 1):
            b = datetime.datetime.fromtimestamp(h * 3600)
            r = rows[b]
            if h in mfx:
                assert (r["imputed"], r["source"]) == (0, "obs")
                assert abs(r["value"] - round(mfx[h] / 10000, 6)) < 1e-9
            elif h % 24 in hodm:
                assert (r["imputed"], r["source"]) == (1, "hod")
                assert abs(r["value"]
                           - round(hodm[h % 24] / 10000, 6)) < 1e-9
            else:
                assert (r["imputed"], r["source"]) == (1, "mean")
                assert abs(r["value"] - round(gm / 10000, 6)) < 1e-9
        assert any(r["imputed"] == 1 for r in rows.values())
    finally:
        df.unpersist()


def test_stl_residual_flags_match_decomposition(spark):
    """Every flagged bucket must be >3 sigma of the residual series the
    decomposition op itself reports, and vice versa (n>=24 channels)."""
    anom = {(r["user_id"], r["bucket"]): r for r in
            timeseries.ts_anomaly_stl_residual(spark, SF_T2).collect()}
    dec = timeseries.ts_trend_seasonal_residual(spark, SF_T2).collect()
    by_user = {}
    for r in dec:
        # recover the exact fx-grid residual from the rounded double
        by_user.setdefault(r["user_id"], []).append(
            (r["bucket"], round(r["residual"] * 10000)))
    want = set()
    for u, rows in by_user.items():
        if len(rows) < 24:
            continue
        vals = [v for _b, v in rows]
        mu = sum(vals) / len(vals)
        var = sum(v * v for v in vals) / len(vals) - mu * mu
        if var <= 0:
            continue
        sd = math.sqrt(var)
        for b, v in rows:
            if abs(v - mu) > 3 * sd:
                want.add((u, b))
                assert abs(anom[(u, b)]["res_z"]
                           - round((v - mu) / sd, 6)) < 1e-6
    assert set(anom) == want
    assert all(abs(r["res_z"]) > 3 for r in anom.values())


def test_class_balance_ground_truth(spark):
    df = sampling.sample_class_balance(spark, SF_T2).cache()
    try:
        counts = {r["event_type"]: r["n"] for r in
                  df.groupBy("event_type").agg(F.count("*").alias("n"))
                    .collect()}
        ev = load(spark, SF_T2, "events") \
            .select("event_id", "event_type").collect()
        full = {}
        for r in ev:
            full.setdefault(r["event_type"], []).append(r["event_id"])
        m = min(len(v) for v in full.values())
        # every class balanced to exactly the min class count
        assert set(counts) == set(full)
        assert all(c == m for c in counts.values())
        # the kept set is the hash-order head of each class
        want = {}
        for t, ids in full.items():
            want[t] = set(sorted(ids, key=lambda i: (_h32(str(i)), i))[:m])
        got = {}
        for r in df.collect():
            got.setdefault(r["event_type"], set()).add(r["event_id"])
            assert 1 <= r["rn"] <= m
        assert got == want
    finally:
        df.unpersist()
