"""Semantic tests for the sixth round-7 wave (SURVEY.md §2.23) — beyond
oracle parity: hand-recomputed Pearson/CUPED moments, Adamic–Adar score
recomputation with the hub cap, assortativity bounds against an
independently built edge list, and accepted-values ground truth."""
import math

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    features, relational,
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


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    varp = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if varp <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(varp)


def _per_user_xy(spark, cut=None):
    """Per-user exact-cents aggregates recomputed independently."""
    ev = (load(spark, SF_T2, "events")
          .select("user_id", "ts", "event_type",
                  (F.col("value").cast("decimal(18,2)") * 100)
                  .cast("long").alias("cents"))
          .collect())
    per = {}
    for r in ev:
        per.setdefault(r["user_id"], []).append(r)
    return per


def test_correlation_matrix_recompute(spark):
    df = features.feat_correlation_matrix(spark, SF_T2)
    rows = {(r["metric_a"], r["metric_b"]): r for r in df.collect()}
    # upper triangle of 4 metrics = 6 pairs, metric_a < metric_b
    assert len(rows) == 6
    assert all(a < b for a, b in rows)
    assert all(abs(r["pearson_r"]) <= 1.0 for r in rows.values()
               if r["pearson_r"] is not None)
    # recompute one pair by hand on exact integers
    per = _per_user_xy(spark)
    xs = [len(evs) for evs in per.values()]                       # n_events
    ys = [sum(1 for e in evs if e["event_type"] == "purchase")
          for evs in per.values()]                                # n_purchases
    want = _pearson(xs, ys)
    got = rows[("n_events", "n_purchases")]
    assert got["n_users"] == len(per)
    assert abs(got["pearson_r"] - round(want, 6)) < 1e-9


def test_cuped_recompute(spark):
    df = relational.agg_cuped_adjustment(spark, SF_T2)
    row = df.first()
    cut = _utc_literal(2024, 1, 16)
    per = _per_user_xy(spark)
    xs = [sum(e["cents"] for e in evs if e["ts"] < cut)
          for evs in per.values()]
    ys = [sum(e["cents"] for e in evs if e["ts"] >= cut)
          for evs in per.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho = _pearson(xs, ys)
    assert row["n_users"] == n
    assert abs(row["theta"] - round(theta, 6)) < 1e-9
    assert abs(row["var_reduction"] - round(rho * rho, 6)) < 1e-9
    # CUPED variance reduction is a squared correlation: [0, 1]
    assert 0.0 <= row["var_reduction"] <= 1.0


def _co_purchase_incidence(spark):
    li = (load(spark, SF_T2, "lineitem")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p"))
          .distinct().collect())
    by_order = {}
    for r in li:
        by_order.setdefault(r["o"], set()).add(r["p"])
    return by_order


def test_adamic_adar_recompute(spark):
    df = relational.graph_adamic_adar(spark, SF_T2)
    got = {(r["pa"], r["pb"]): r for r in df.collect()}
    assert all(a < b for a, b in got)
    by_order = _co_purchase_incidence(spark)
    want = {}
    for parts in by_order.values():
        deg = len(parts)
        if deg < 2 or deg > relational._AA_MAX_ORDER_DEG:
            continue
        ps = sorted(parts)
        w = 1.0 / math.log(deg)
        for i, pa in enumerate(ps):
            for pb in ps[i + 1:]:
                k = (pa, pb)
                cnt, s = want.get(k, (0, 0.0))
                want[k] = (cnt + 1, s + w)
    want = {k: v for k, v in want.items() if v[0] >= 2}
    assert set(got) == set(want)
    for k, (cnt, s) in want.items():
        assert got[k]["n_common"] == cnt
        assert abs(got[k]["aa_score"] - round(s, 6)) < 1e-9


def test_assortativity_bounds_and_edges(spark):
    row = relational.graph_degree_assortativity(spark, SF_T2).first()
    # independently build the support>=2 edge set
    by_order = _co_purchase_incidence(spark)
    pair_w = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, pa in enumerate(ps):
            for pb in ps[i + 1:]:
                pair_w[(pa, pb)] = pair_w.get((pa, pb), 0) + 1
    edges = [k for k, w in pair_w.items() if w >= 2]
    assert row["n_edges"] == len(edges)
    if row["assortativity"] is not None:
        assert -1.0 <= row["assortativity"] <= 1.0
    # degree-weighted mean endpoint degree recomputation
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    mean = sum(deg[a] + deg[b] for a, b in edges) / (2 * len(edges))
    assert abs(row["mean_deg"] - round(mean, 6)) < 1e-9


def test_accepted_values_ground_truth(spark):
    df = relational.dq_accepted_values(spark, SF_T2).cache()
    try:
        rows = df.collect()
        # the driver corpus is clean: every observed value is in-domain
        assert all(r["is_expected"] == 1 for r in rows)
        # per audited column, the counts partition the table exactly
        by_col = {}
        for r in rows:
            k = (r["table_name"], r["column_name"])
            by_col[k] = by_col.get(k, 0) + r["n"]
        for (t, _c), total in by_col.items():
            assert total == load(spark, SF_T2, t).count(), t
        # domain membership matches the declared config
        domains = {(t, c): set(v) for t, c, v in relational._DQ_DOMAINS}
        assert {(r["table_name"], r["column_name"]) for r in rows} \
            == set(domains)
        for r in rows:
            assert (r["value"] in domains[(r["table_name"],
                                           r["column_name"])]) \
                == bool(r["is_expected"])
    finally:
        df.unpersist()


def test_accepted_values_flags_unknown(spark):
    """An out-of-domain value must surface with is_expected=0 — proven on
    a corpus clone with one corrupted enum row."""
    docs = load(spark, SF_T2, "documents")
    bad = docs.limit(1).withColumn("lang", F.lit("xx"))
    patched = docs.unionByName(bad)
    import industry_big_data_time_sequence_process_spark.operators.relational as R
    orig_load = R.load

    def fake_load(sp, sf, t):
        return patched if t == "documents" else orig_load(sp, sf, t)

    R.load = fake_load
    try:
        rows = relational.dq_accepted_values(spark, SF_T2).collect()
    finally:
        R.load = orig_load
    flagged = [r for r in rows if r["is_expected"] == 0]
    assert len(flagged) == 1
    assert (flagged[0]["table_name"], flagged[0]["value"]) \
        == ("documents", "xx")
    assert flagged[0]["n"] == 1
