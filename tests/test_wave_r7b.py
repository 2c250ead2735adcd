"""Semantic tests for the second round-7 wave (SURVEY.md §2.19) — beyond
oracle parity: probability-mass and cohort invariants, OHLC ordering,
decomposition reconstruction, point-in-time leakage recomputation, CDC
replay semantics, and planted-structure checks for the co-purchase
triangle census and prefix dedup."""
import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    features, relational, text, timeseries,
)
from industry_big_data_time_sequence_process_spark.sources.io import (
    TABLES, load,
)

from .conftest import SF_T2


def test_markov_probability_mass_and_pair_count(spark):
    rows = timeseries.ts_markov_transitions(spark, SF_T2).collect()
    by_from = {}
    total = 0
    for r in rows:
        by_from.setdefault(r["from_type"], 0.0)
        by_from[r["from_type"]] += r["prob"]
        total += r["n_transitions"]
    # per-row rounding to 6dp -> mass within 5e-6 * rows of 1
    for ft, mass in by_from.items():
        assert abs(mass - 1.0) < 1e-4, (ft, mass)
    ev = load(spark, SF_T2, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users  # each channel emits n-1 pairs


def test_retention_triangle_invariants(spark):
    rows = timeseries.ts_retention_triangle(spark, SF_T2).collect()
    assert rows
    day0 = [r for r in rows if r["day_offset"] == 0]
    for r in day0:
        # everyone is active on their own first day
        assert r["n_active"] == r["cohort_size"]
        assert r["retention_pct"] == 1.0
    for r in rows:
        assert 0 < r["n_active"] <= r["cohort_size"]
        assert r["day_offset"] >= 0
    n_users = load(spark, SF_T2, "events") \
        .select("user_id").distinct().count()
    assert sum(r["cohort_size"] for r in day0) == n_users


def test_ohlc_ordering_and_mass(spark):
    df = timeseries.ts_ohlc_hourly(spark, SF_T2)
    bad = df.filter(
        (F.col("low") > F.col("open")) | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
        | (F.col("low") > F.col("high"))).count()
    assert bad == 0
    n_ticks = df.agg(F.sum("n_ticks")).collect()[0][0]
    assert n_ticks == load(spark, SF_T2, "events").count()


def test_decomposition_reconstructs_value(spark):
    rows = timeseries.ts_trend_seasonal_residual(spark, SF_T2).collect()
    assert rows
    for r in rows:
        # exact on the fx grid; three independent 6dp roundings -> 2e-6
        assert abs(r["value"] - (r["trend"] + r["seasonal"]
                                 + r["residual"])) < 2e-6, r


def test_interarrival_counts_and_bounds(spark):
    stats = {r["user_id"]: r for r in
             timeseries.ts_interarrival_stats(spark, SF_T2).collect()}
    per_user = {r["user_id"]: r["n"] for r in
                load(spark, SF_T2, "events").groupBy("user_id")
                .agg(F.count("*").alias("n")).collect()}
    for uid, n in per_user.items():
        if n < 2:
            assert uid not in stats
            continue
        r = stats[uid]
        assert r["n_gaps"] == n - 1
        assert r["max_gap_s"] >= r["mean_gap_s"] > 0
        if r["cv_gap"] is not None:
            assert r["cv_gap"] >= 0


def test_pit_features_no_leakage(spark):
    """Recompute three channels' label features from raw history: the
    windowed one-pass answer must equal the per-label strictly-before
    recomputation exactly."""
    labels = features.feat_pit_features(spark, SF_T2)
    uids = [r["user_id"] for r in
            labels.select("user_id").distinct().limit(3).collect()]
    ev = {u: sorted(
        load(spark, SF_T2, "events").filter(F.col("user_id") == u)
        .select("event_id", "ts", "event_type", "value").collect(),
        key=lambda r: (r["ts"], r["event_id"])) for u in uids}
    got = labels.filter(F.col("user_id").isin(uids)).collect()
    assert got
    for r in got:
        hist = [e for e in ev[r["user_id"]]
                if (e["ts"], e["event_id"])
                < (r["label_ts"], r["label_event_id"])]
        assert r["prior_n"] == len(hist)
        want_sum = round(sum(round(e["value"], 2) for e in hist), 2)
        assert abs(r["prior_sum"] - want_sum) < 1e-9
        assert r["prior_errors"] == sum(
            1 for e in hist if e["event_type"] == "error")


def test_cdc_replay_semantics(spark):
    snap = {r["user_id"]: r for r in
            relational.cdc_apply_changes(spark, SF_T2).collect()}
    ev = load(spark, SF_T2, "events") \
        .select("user_id", "ts", "event_id", "event_type", "value") \
        .collect()
    last = {}
    n_ch, n_del = {}, {}
    for e in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        last[e["user_id"]] = e
        n_ch[e["user_id"]] = n_ch.get(e["user_id"], 0) + 1
        if e["event_type"] == "error":
            n_del[e["user_id"]] = n_del.get(e["user_id"], 0) + 1
    for uid, e in last.items():
        if e["event_type"] == "error":
            assert uid not in snap  # deleted keys vanish
        else:
            r = snap[uid]
            assert abs(r["current_value"] - round(e["value"], 2)) < 1e-9
            assert r["last_change_ts"] == e["ts"]
            assert r["n_changes"] == n_ch[uid]
            assert r["n_deletes"] == n_del.get(uid, 0)
    assert set(snap) == {u for u, e in last.items()
                         if e["event_type"] != "error"}


@pytest.fixture(scope="module")
def planted_graph_dir(tmp_path_factory):
    """Lineitem corpus with KNOWN co-purchase structure: parts 1,2,3
    pairwise co-occur in two orders (one triangle, 3 edges); parts
    4-5 and 5-6 each co-occur twice (2 edges, no 4-6 edge, so no
    second triangle); a 7-8 pair co-occurs ONCE (below the support
    floor, must not appear)."""
    import shutil

    d = tmp_path_factory.mktemp("planted_graph")
    for t in TABLES:
        if t != "lineitem":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    orders_parts = [
        (1, [1, 2, 3]), (2, [1, 2, 3]),
        (3, [4, 5]), (4, [4, 5]), (5, [5, 6]), (6, [5, 6]),
        (7, [7, 8]),
    ]
    rows = []
    ln = 1
    for o, parts in orders_parts:
        for i, p in enumerate(parts):
            rows.append((o, p, 1, i + 1))
            ln += 1
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
        "l_extendedprice": pa.array([10.0] * len(rows), pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array(
            [datetime.datetime(2024, 1, 1)] * len(rows),
            pa.timestamp("us")),
    })
    pq.write_table(tbl, d / "lineitem.parquet")
    return str(d)


def test_triangles_planted_structure(spark, planted_graph_dir):
    r = relational.graph_copurchase_triangles(
        spark, planted_graph_dir).collect()[0]
    assert r["n_edges"] == 5       # 12,13,23,45,56 — 78 pruned
    assert r["n_nodes"] == 6       # parts 7,8 never reach the edge set
    assert r["n_triangles"] == 1   # exactly the planted 1-2-3
    # deg = {1:2,2:2,3:2,4:1,5:2,6:1} -> sum d(d-1) = 8 -> wedges = 4
    assert r["global_clustering"] == round(3 * 1 / 4, 6)


@pytest.fixture(scope="module")
def planted_prefix_dir(tmp_path_factory):
    """Documents corpus with a planted templated family: three docs
    sharing an identical 200+ char opening but different tails (and
    lengths), plus one doc whose prefix diverges at char 150."""
    import shutil

    d = tmp_path_factory.mktemp("planted_prefix")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    opening = ("breaking news update " * 12)[:210]  # > 200 chars shared
    texts = [
        opening + " tail alpha",
        opening + " tail beta and quite a lot more trailing content",
        opening,
        opening[:150] + "DIVERGED " + opening[159:] + " tail gamma",
    ]
    tbl = pa.table({
        "doc_id": pa.array([900001, 900002, 900003, 900004], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["synthetic"] * 4, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_prefix_dedup_planted_family(spark, planted_prefix_dir):
    rows = text.text_prefix_dedup(spark, planted_prefix_dir).collect()
    fam = [r for r in rows if r["keep_doc_id"] in
           (900001, 900002, 900003, 900004)]
    assert len(fam) == 1            # one templated family found
    assert fam[0]["n_docs"] == 3    # the diverged doc is NOT grouped
    assert fam[0]["keep_doc_id"] == 900002  # longest doc wins
