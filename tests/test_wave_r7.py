"""Semantic tests for the round-7 wave (SURVEY.md §2.18) — beyond the
oracle parity every key already gets: planted-structure sensitivity for
the changepoint, the reservoir-size contract, entropy bounds, ACF
self-consistency, and RAKE phrase well-formedness."""
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import SF_T2


@pytest.fixture(scope="module")
def step_dir(tmp_path_factory):
    """Events corpus with a PLANTED step change: one synthetic user
    (id 9000) whose hourly level jumps 10 -> 50 exactly at hour 48 of
    96; the changepoint op must recover that split hour and show a
    large SSE reduction."""
    import datetime
    import shutil

    d = tmp_path_factory.mktemp("step_events")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 10_000_000
    for h in range(96):
        level = 10.0 if h < 48 else 50.0
        for k in range(3):  # 3 events per hour, tiny deterministic wiggle
            rows.append({
                "event_id": eid,
                "ts": base + datetime.timedelta(hours=h, minutes=7 * k),
                "user_id": 9000,
                "event_type": "view",
                "value": level + 0.25 * k,
                "props": '{"k": 1}',
            })
            eid += 1
    tbl = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows],
                               pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
        "props": pa.array([r["props"] for r in rows], pa.string()),
    })
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def test_changepoint_recovers_planted_step(spark, step_dir):
    rows = {r["user_id"]: r for r in
            REGISTRY["ts_changepoint_sse"].fn(spark, step_dir).collect()}
    r = rows[9000]
    # the best split is the last hour of the low regime (split AFTER h)
    assert r["cp_bucket"].hour == 23 and r["cp_bucket"].day == 2, r
    assert r["n_points"] == 96
    # splitting at the step removes almost all variance
    assert r["sse_split"] < 0.05 * r["sse_total"], r


def test_reservoir_exact_size_and_determinism(spark):
    rows = REGISTRY["sample_reservoir_per_key"].fn(spark, SF_T2).collect()
    by_u = {}
    for r in rows:
        by_u.setdefault(r["user_id"], []).append(r)
    assert by_u
    for u, rs in by_u.items():
        assert len(rs) <= 5
        assert sorted(r["draw_rank"] for r in rs) == list(
            range(1, len(rs) + 1))
    again = {(r["user_id"], r["event_id"], r["draw_rank"])
             for r in REGISTRY["sample_reservoir_per_key"]
             .fn(spark, SF_T2).collect()}
    assert again == {(r["user_id"], r["event_id"], r["draw_rank"])
                     for r in rows}   # rerun-stable


def test_entropy_bounds_and_mode_consistency(spark):
    ent = {r["user_id"]: r for r in
           REGISTRY["agg_entropy_by_key"].fn(spark, SF_T2).collect()}
    for r in ent.values():
        assert 0.0 <= r["type_entropy"] <= math.log(r["n_types"]) + 1e-9
    mode = {r["user_id"]: r for r in
            REGISTRY["agg_mode_deterministic"].fn(spark, SF_T2).collect()}
    # single-type users must have zero entropy; multi-type positive
    for u, r in ent.items():
        if r["n_types"] == 1:
            assert r["type_entropy"] == 0.0


def test_acf_lag_bounds_and_peak_hourly_strictness(spark):
    rows = REGISTRY["ts_acf_lags"].fn(spark, SF_T2).collect()
    assert rows
    for r in rows:
        if r["acf"] is not None:
            assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
    peaks = REGISTRY["ts_peak_hourly"].fn(spark, SF_T2).collect()
    for p in peaks:
        assert p["rise_fx"] > 0 and p["fall_fx"] > 0


def test_rake_phrases_wellformed(spark):
    rows = REGISTRY["text_rake_keywords"].fn(spark, SF_T2).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))
        for r in rs:
            assert len(r["phrase"].split(" ")) == r["n_words"]
            assert r["rake_score"] >= r["n_words"] - 1e-9  # deg/freq >= 1
