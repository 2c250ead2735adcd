"""Semantic tests for the eighth round-7 wave (SURVEY.md §2.25) — beyond
oracle parity: stickiness identities, Durbin–Levinson recomputation,
a full by-hand R/S replication, and cross-field audit ground truth."""
import math
from decimal import ROUND_HALF_UP, Decimal


def _round6(x: float) -> float:
    """Engine-faithful round(,6): Spark's round() is HALF_UP over
    BigDecimal.valueOf(double) — the SHORTEST decimal repr — so ties use
    repr(x), not the exact binary expansion (and not Python's half-even
    round)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    relational, timeseries,
)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def _hourly(spark, uid):
    """Per-hour fx means for one user, recomputed independently."""
    ev = (load(spark, SF_T2, "events")
          .filter(F.col("user_id") == uid)
          .select("ts", (F.col("value").cast("decimal(18,2)") * 100)
                  .cast("long").alias("cents")).collect())
    per = {}
    for r in ev:
        h = int(r["ts"].timestamp()) // 3600
        per.setdefault(h, []).append(r["cents"])
    # mirror the engine's float op ORDER exactly: the decimal dollar sum
    # casts to double FIRST, then divides by the count, then scales
    return {h: math.floor(sum(v) / 100 / len(v) * 10000)
            for h, v in sorted(per.items())}


def test_stickiness_identities_and_recompute(spark):
    rows = timeseries.ts_dau_wau_stickiness(spark, SF_T2).collect()
    assert rows
    for r in rows:
        # DAU is a subset of the trailing-7-day actives
        assert 0 < r["dau"] <= r["wau"]
        want = round(r["dau"] / r["wau"], 6)
        assert abs(r["stickiness"] - want) < 1e-9
        # NOTE: 1/7 is NOT a floor — a quiet day after six busy ones
        # can push DAU/WAU arbitrarily low; only the <= 1 bound holds
        assert r["stickiness"] <= 1.0
    # one day recomputed by hand
    import datetime
    act = (load(spark, SF_T2, "events")
           .select("user_id", F.date_trunc("day", "ts").alias("d"))
           .distinct().collect())
    by_day = {}
    for r in act:
        by_day.setdefault(r["d"], set()).add(r["user_id"])
    day = sorted(by_day)[len(by_day) // 2]
    wau_users = set()
    for k in range(7):
        wau_users |= by_day.get(day - datetime.timedelta(days=k), set())
    got = {r["window_day"]: r for r in rows}[day]
    assert (got["dau"], got["wau"]) == (len(by_day[day]), len(wau_users))


def _pair_r(series, lag):
    xs, ys = [], []
    for h, x in series.items():
        if h + lag in series:
            xs.append(x)
            ys.append(series[h + lag])
    n = len(xs)
    if n < 2:
        return None, n
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None, n
    return (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)), n


def test_pacf2_durbin_levinson_recompute(spark):
    df = timeseries.ts_pacf2(spark, SF_T2)
    rows = {r["user_id"]: r for r in df.collect()}
    uids = sorted(rows)[:3]
    for uid in uids:
        series = _hourly(spark, uid)
        r1, n1 = _pair_r(series, 1)
        r2, n2 = _pair_r(series, 2)
        got = rows[uid]
        assert (got["n1"], got["n2"]) == (n1, n2)
        if r1 is not None:
            assert abs(got["pacf1"] - round(r1, 6)) < 1e-9
        if r1 is not None and r2 is not None and 1 - r1 * r1 > 0:
            want = (r2 - r1 * r1) / (1 - r1 * r1)
            assert abs(got["pacf2"] - round(want, 6)) < 1e-9


def test_hurst_rs_full_replication_one_user(spark):
    df = timeseries.ts_hurst_rs(spark, SF_T2)
    row = df.orderBy(F.desc("n_blocks_8"), "user_id").first()
    series = list(_hourly(spark, row["user_id"]).values())
    means = {}
    for s in (8, 16, 32):
        fxs = []
        for b in range(len(series) // s):
            blk = series[b * s:(b + 1) * s]
            tot = sum(blk)
            d = [s * x - tot for x in blk]
            zk, z = [], 0
            for v in d:
                z += v
                zk.append(z)
            sd2 = sum(v * v for v in d)
            if sd2 <= 0:
                continue
            rs = (max(zk) - min(zk)) * math.sqrt(s) / math.sqrt(sd2)
            fxs.append(math.floor(rs * 1_000_000))
        if fxs:
            means[s] = sum(fxs) / len(fxs) / 1_000_000
            nb = {8: "n_blocks_8", 16: "n_blocks_16",
                  32: "n_blocks_32"}[s]
            assert row[nb] == len(fxs)
            col = {8: "rs8", 16: "rs16", 32: "rs32"}[s]
            assert abs(row[col] - _round6(means[s])) < 1e-9
    if 8 in means and 32 in means and means[8] > 0 and means[32] > 0:
        want = (math.log(means[32]) - math.log(means[8])) \
            / 1.3862943611198906
        assert abs(row["hurst"] - _round6(want)) < 1e-6


def test_hurst_plausible_range(spark):
    df = timeseries.ts_hurst_rs(spark, SF_T2).where(
        F.col("hurst").isNotNull()).cache()
    try:
        assert df.count() > 0
        # R/S means grow with block size in EXPECTATION (per-series
        # reversals are legitimate sampling noise on few blocks), and
        # the estimator stays in a sane band for non-degenerate data
        means = df.agg(F.avg("rs8").alias("m8"),
                       F.avg("rs32").alias("m32")).first()
        assert means["m32"] > means["m8"]
        bad = df.filter((F.col("hurst") < -0.5)
                        | (F.col("hurst") > 1.5)).count()
        assert bad == 0
    finally:
        df.unpersist()


def test_cross_field_ground_truth(spark):
    rows = {r["rule"]: r for r in
            relational.dq_cross_field(spark, SF_T2).collect()}
    assert len(rows) == 5
    li_n = load(spark, SF_T2, "lineitem").count()
    # the synthetic corpus genuinely ships lines before their order
    # date — the audit must surface it, and nothing else
    ship = rows["lineitem_ship_on_or_after_order"]
    assert ship["n_checked"] == li_n
    assert ship["n_violations"] > 0 and ship["passed"] == 0
    li = load(spark, SF_T2, "lineitem").select("l_orderkey", "l_shipdate")
    od = load(spark, SF_T2, "orders").select("o_orderkey", "o_orderdate")
    want = (li.join(od, li["l_orderkey"] == od["o_orderkey"])
              .filter(F.col("l_shipdate") < F.col("o_orderdate")).count())
    assert ship["n_violations"] == want
    for rule in ("lineitem_discount_in_unit_range",
                 "lineitem_positive_amounts",
                 "orders_totalprice_positive", "events_value_positive"):
        assert rows[rule]["n_violations"] == 0
        assert rows[rule]["passed"] == 1
        assert rows[rule]["violation_rate"] == 0.0
