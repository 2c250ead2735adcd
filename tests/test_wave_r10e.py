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
    # round 11: 'osc' is a pure sine with a 10-hour period — NOT a
    # divisor-of-24 cycle, so the hod profile averages it away, and any
    # sine satisfies the exact AR(2) x_t = 2cos(w)x_{t-1} - x_{t-2};
    # only the Yule-Walker challenger can track it
    for i in range(720):
        v = 80 + 40 * math.sin(2 * math.pi * i / 10)
        rows.append((7000 + i, T0 + i * HOUR_US, 4, "osc", round(v, 2)))
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
    # ... and it also beats rolling AR2, which amplifies the per-hour
    # noise through its ~(1, |phi1|, |phi2|) error combination while
    # the profile averages noise over 30 train samples per bucket
    assert rows["season"]["mae_hod"] < rows["season"]["mae_ar2"]
    # random walk (round 11): rolling one-step AR2 fits phi1 ~ 1 and
    # tracks the level, rightfully dethroning STATIC naive-last (which
    # pays the full drift over the 144-hour test horizon); static
    # naive remains the best of the static recipes
    assert rows["walk"]["champion"] == "yule_walker_ar2"
    assert rows["walk"]["mae_ar2"] * 5 < rows["walk"]["mae_naive"]
    assert rows["walk"]["mae_naive"] < rows["walk"]["mae_mean"]
    # off-24h oscillator (round 11): hod/mean/naive all average the
    # sine away (~25 MAE); AR2 recovers x_t = 2cos(w)x_{t-1} - x_{t-2}
    # and is two orders of magnitude better
    assert rows["osc"]["champion"] == "yule_walker_ar2"
    assert rows["osc"]["mae_ar2"] * 10 < min(
        rows["osc"]["mae_naive"], rows["osc"]["mae_mean"],
        rows["osc"]["mae_hod"])
    # white noise: a level forecast (mean or the hod profile, which
    # estimates the same level per bucket) must beat chasing the walk
    assert rows["noise"]["champion"] != "naive_last"
    # split accounting: 720 hours -> 576 train / 144 test per channel
    for r in rows.values():
        assert (r["n_train"], r["n_test"]) == (576, 144)


def test_ar2_fit_recovers_planted_dynamics(spark, regime_corpus):
    """ts_ar2_forecast on the engineered channels: the Yule-Walker fit
    recovers the generating coefficients — 'osc' (pure sine, period 10)
    must fit phi1 ~ 2cos(2*pi/10), phi2 ~ -1; 'walk' (unit root) must
    fit phi1 + phi2 ~ 1; 'noise' must fit phi ~ 0."""
    rows = {r["event_type"]: r for r in
            REGISTRY["ts_ar2_forecast"].fn(spark, regime_corpus)
            .collect()}
    osc = rows["osc"]
    assert abs(osc["phi1"] - 2 * math.cos(2 * math.pi / 10)) < 0.01
    assert abs(osc["phi2"] + 1.0) < 0.01
    assert osc["n_hours"] == 720 and osc["n_lag1_pairs"] == 719
    walk = rows["walk"]
    assert abs(walk["phi1"] + walk["phi2"] - 1.0) < 0.05
    noise = rows["noise"]
    assert abs(noise["phi1"]) < 0.05 and abs(noise["phi2"]) < 0.05
    # the one-step forecast exists and is near the oscillator's range
    assert osc["forecast_next"] is not None
    assert 40 <= osc["forecast_next"] <= 120


def test_backtest_champion_runs_on_corpus(spark):
    from .conftest import SF_T2
    out = REGISTRY["ts_backtest_champion"].fn(spark, SF_T2).collect()
    assert len(out) == 5
    for r in out:
        for c in ("mae_naive", "mae_mean", "mae_hod", "mae_ar2"):
            assert r[c] is not None and r[c] >= 0
        assert r["champion"] in ("naive_last", "seasonal_hod",
                                 "global_mean", "yule_walker_ar2")
