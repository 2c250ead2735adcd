"""Round-10 fifth wave semantics (SURVEY.md §2.34):

- `mm_exact_blob_dedup`: planted byte-identical blobs dedup to the
  min-id keeper with exact copy counts; byte-distinct near-identical
  text does NOT collapse (that's the content-level ops' job);
- `ts_backtest_champion`: on engineered channels the right challenger
  wins — hour-of-day profile on a seasonal channel, naive-last on a
  random walk — and the noise channel never crowns the walk-forecast.
"""
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .test_wave_r10b import T0, _corpus
from .test_wave_r10c import HOUR_US, _h32


@pytest.fixture(scope="module")
def blob_corpus(tmp_path_factory):
    texts = [
        "alpha beta gamma",     # 1: identical bytes ...
        "alpha beta gamma",     # 2: ... to doc 1
        "alpha beta gamma",     # 3: ... and doc 1 again
        "Alpha beta gamma",     # 4: case differs -> different bytes
        "delta epsilon",        # 5: unique
    ]
    docs = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": texts,
        "lang": ["en"] * 5,
        "source": ["test"] * 5,
        "n_chars": [len(t) for t in texts],
    }
    return _corpus(tmp_path_factory, "blob_corpus", documents=docs)


def test_blob_dedup_planted(spark, blob_corpus):
    rows = {r["doc_id"]: r for r in
            REGISTRY["mm_exact_blob_dedup"].fn(spark, blob_corpus)
            .collect()}
    assert len(rows) == 5
    for i in (1, 2, 3):
        assert rows[i]["keep_id"] == 1 and rows[i]["n_copies"] == 3
    assert rows[1]["is_drop"] == 0
    assert rows[2]["is_drop"] == 1 and rows[3]["is_drop"] == 1
    # byte-level dedup is strictly byte-level: the case variant stays
    assert rows[4]["n_copies"] == 1 and rows[4]["is_drop"] == 0
    assert rows[5]["n_copies"] == 1


@pytest.fixture(scope="module")
def regime_corpus(tmp_path_factory):
    """Three 720-hour channels, one event per hour: 'season' has a
    strong hour-of-day cycle, 'walk' is an integer-cents random walk
    (seed w4 — the test_wave_r10c unit-root fixture), 'noise' is white
    noise around 50."""
    rows = []
    for i in range(720):
        v = 100 + 50 * math.sin(2 * math.pi * (i % 24) / 24) \
            + ((_h32(f"a:{i}") % 100) - 49.5) / 100
        rows.append((1000 + i, T0 + i * HOUR_US, 1, "season",
                     round(v, 2)))
    cents = 50000
    for i in range(720):
        cents += round(((_h32(f"w4:{i}") % 16) - 7.5) / 7.5 * 100)
        rows.append((3000 + i, T0 + i * HOUR_US, 2, "walk", cents / 100.0))
    for i in range(720):
        rows.append((5000 + i, T0 + i * HOUR_US, 3, "noise",
                     50.0 + ((_h32(f"st:{i}") % 16) - 7.5)))
    events = {
        "event_id": [r[0] for r in rows],
        "ts": [r[1] for r in rows],
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": ["{}"] * len(rows),
    }
    return _corpus(tmp_path_factory, "regime_corpus", events=events)


def test_backtest_champion_picks_the_right_model(spark, regime_corpus):
    rows = {r["event_type"]: r for r in
            REGISTRY["ts_backtest_champion"].fn(spark, regime_corpus)
            .collect()}
    assert rows["season"]["champion"] == "seasonal_hod"
    # the seasonal profile is an order of magnitude better there
    assert rows["season"]["mae_hod"] * 10 < rows["season"]["mae_naive"]
    assert rows["walk"]["champion"] == "naive_last"
    assert rows["walk"]["mae_naive"] < rows["walk"]["mae_mean"]
    # white noise: a level forecast (mean or the hod profile, which
    # estimates the same level per bucket) must beat chasing the walk
    assert rows["noise"]["champion"] != "naive_last"
    # split accounting: 720 hours -> 576 train / 144 test per channel
    for r in rows.values():
        assert (r["n_train"], r["n_test"]) == (576, 144)


def test_backtest_champion_runs_on_corpus(spark):
    from .conftest import SF_T2
    out = REGISTRY["ts_backtest_champion"].fn(spark, SF_T2).collect()
    assert len(out) == 5
    for r in out:
        for c in ("mae_naive", "mae_mean", "mae_hod"):
            assert r[c] is not None and r[c] >= 0
        assert r["champion"] in ("naive_last", "seasonal_hod",
                                 "global_mean")
