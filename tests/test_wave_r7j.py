"""Semantic tests for the tenth round-7 wave (SURVEY.md §2.27) — beyond
oracle parity: a by-hand median-rank-regression replication and
capability-index identities."""
import math

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    relational, timeseries,
)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def test_weibull_recompute_one_user(spark):
    df = timeseries.ts_weibull_shape(spark, SF_T2)
    rows = {r["user_id"]: r for r in df.collect()}
    assert rows
    # inter-arrival CDF position grows with the gap, so the fitted
    # slope is positive for every unit
    assert all(r["beta"] > 0 for r in rows.values())
    assert all(r["n_gaps"] >= 8 for r in rows.values())
    uid = max(rows, key=lambda u: rows[u]["n_gaps"])
    ev = (load(spark, SF_T2, "events")
          .filter((F.col("user_id") == uid)
                  & (F.col("event_type") == "error"))
          .select("ts", "event_id").orderBy("ts", "event_id").collect())
    ts = [(r["ts"], r["event_id"]) for r in ev]
    gaps = []
    for a, b in zip(ts, ts[1:]):
        g = round((b[0] - a[0]).total_seconds() * 1_000_000)
        if g > 0:
            gaps.append(g)
    n = len(gaps)
    assert rows[uid]["n_gaps"] == n
    pts = []
    for i, g in enumerate(sorted(gaps), start=1):
        fr = (i - 0.3) / (n + 0.4)
        pts.append((math.floor(math.log(float(g)) * 1e9),
                    math.floor(math.log(-math.log(1 - fr)) * 1e9)))
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sw = sum(w for _, w in pts)
    sxx = sum(x * x for x, _ in pts)
    sxw = sum(x * w for x, w in pts)
    beta = (m * sxw - sx * sw) / (m * sxx - sx * sx)
    # Python libm vs JVM log can differ by 1 ulp at a floor boundary —
    # compare with a tolerance, not exact round(6)
    assert abs(rows[uid]["beta"] - beta) < 1e-3


def test_cpk_identities_and_recompute(spark):
    got = {r["user_id"]: r for r in
           relational.agg_capability_cpk(spark, SF_T2).collect()}
    assert got
    for r in got.values():
        # Cpk is the centering-penalized Cp: never larger
        assert r["cpk"] <= r["cp"] + 1e-9
        assert r["sigma"] > 0
        # within-spec means positive Cpk on this corpus (values 0..500)
        assert r["cpk"] > 0
    uid = sorted(got)[0]
    vals = [r["value"] for r in
            load(spark, SF_T2, "events")
            .filter(F.col("user_id") == uid).select("value").collect()]
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (len(vals) - 1))
    r = got[uid]
    assert r["n"] == len(vals)
    assert abs(r["mu"] - mu) < 1e-4 and abs(r["sigma"] - sd) < 1e-4
    assert abs(r["cp"] - 500 / (6 * sd)) < 1e-3
    assert abs(r["cpk"] - min(500 - mu, mu) / (3 * sd)) < 1e-3
