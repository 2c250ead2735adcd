"""Semantic tests for the third round-7 wave (SURVEY.md §2.20) — beyond
oracle parity: warm-up NULL contracts for the indicator windows, breach/
band consistency, robust-anomaly invariants, gaps-and-islands mass
checks, period-over-period algebra, readability band
thresholds, freshness-lag anchoring, and the streaming OHLC twin's
batch-equality + genuinely-multi-batch sink."""
import os

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    relational, streaming, text, timeseries,
)
from industry_big_data_time_sequence_process_spark.operators.sources_sinks \
    import SCRATCH
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def test_bollinger_warmup_nulls_and_breach_consistency(spark):
    df = timeseries.ts_bollinger_breach(spark, SF_T2).cache()
    try:
        # exactly min(19, n_user) warm-up rows per user carry NULL bands
        per_user = dict(load(spark, SF_T2, "events").groupBy("user_id")
                        .count().collect())
        nulls = dict(df.filter(F.col("band_mean").isNull())
                       .groupBy("user_id").count().collect())
        for u, n in per_user.items():
            assert nulls.get(u, 0) == min(19, n), (u, n, nulls.get(u))
        # breach flag agrees with the emitted bands (rounded bands can
        # disagree at the 6th decimal; re-derive on the rounded columns
        # only for clear margins)
        bad = df.filter(
            F.col("breach").isNotNull()
            & (((F.col("value") > F.col("band_upper") + 1e-5)
                & (F.col("breach") != 1))
               | ((F.col("value") < F.col("band_lower") - 1e-5)
                  & (F.col("breach") != -1)))).count()
        assert bad == 0
        assert df.filter(F.col("band_upper") < F.col("band_lower")) \
                 .count() == 0
    finally:
        df.unpersist()


def test_rsi_bounds_and_warmup(spark):
    df = timeseries.ts_rsi_sma(spark, SF_T2).cache()
    try:
        assert df.filter((F.col("rsi") < 0) | (F.col("rsi") > 100)) \
                 .count() == 0
        # delta frame has n-1 rows per user; first 13 of them are warm-up
        per_user = dict(load(spark, SF_T2, "events").groupBy("user_id")
                        .count().collect())
        rows = dict(df.groupBy("user_id").count().collect())
        for u, n in per_user.items():
            assert rows.get(u, 0) == max(0, n - 1), (u, n)
    finally:
        df.unpersist()


def test_mad_flags_are_a_subset_and_null_contract(spark):
    df = timeseries.ts_anomaly_mad(spark, SF_T2).cache()
    try:
        n_rows = df.count()
        assert n_rows == load(spark, SF_T2, "events").count()
        # a NULL score exactly when the flag is NULL (zero-MAD channel)
        assert df.filter(F.col("robust_z").isNull()
                         != F.col("is_anomaly").isNull()).count() == 0
        flagged = df.filter(F.col("is_anomaly") == 1)
        assert flagged.filter(F.abs("robust_z") <= 3.5).count() == 0
        # the robust screen must not flag everything
        assert flagged.count() < n_rows * 0.2
    finally:
        df.unpersist()


def test_active_streaks_mass(spark):
    df = timeseries.ts_active_streaks(spark, SF_T2).cache()
    try:
        ev = load(spark, SF_T2, "events")
        n_users = ev.select("user_id").distinct().count()
        assert df.count() == n_users  # one row per channel
        n_days = ev.select("user_id", F.to_date("ts")).distinct().count()
        got = df.agg(F.sum("n_active_days")).collect()[0][0]
        assert got == n_days
        assert df.filter(F.col("longest_streak")
                         > F.col("n_active_days")).count() == 0
        assert df.filter(F.col("n_streaks") < 1).count() == 0
    finally:
        df.unpersist()


def test_pop_hourly_algebra(spark):
    df = timeseries.ts_pop_hourly(spark, SF_T2).cache()
    try:
        assert df.count() > 0
        # delta == value - prev_value on the shared 1e-4 grid
        bad = df.filter(
            F.abs(F.col("delta")
                  - (F.col("value") - F.col("prev_value"))) > 1e-9).count()
        assert bad == 0
        assert df.filter(F.col("pct_change").isNull()
                         & (F.col("prev_value") != 0)).count() == 0
    finally:
        df.unpersist()


def test_readability_bands_match_thresholds(spark):
    df = text.text_readability(spark, SF_T2).cache()
    try:
        assert df.count() > 0
        # the rounded score re-derives the band except within 1e-4 of a
        # threshold (round-boundary rows are checked by the oracle)
        bad = df.filter(
            ((F.col("flesch") >= 60 + 1e-3) & (F.col("band") != "easy"))
            | ((F.col("flesch") < 30 - 1e-3) & (F.col("band") != "hard"))
        ).count()
        assert bad == 0
        assert df.filter(F.col("n_words") <= 0).count() == 0
    finally:
        df.unpersist()


def test_freshness_lag_anchoring(spark):
    rows = relational.dq_freshness_lag(spark, SF_T2).collect()
    assert rows
    lags = [r["lag_minutes"] for r in rows]
    assert min(lags) == 0          # the newest source anchors the clock
    assert all(l >= 0 for l in lags)
    for r in rows:
        assert r["is_stale"] == (1 if r["lag_minutes"] > 60 else 0)


def test_stream_ohlc_equals_batch_and_is_multibatch(spark):
    got = {tuple(r) for r in
           streaming.stream_ohlc_bars(spark, SF_T2).collect()}
    want = {tuple(r) for r in
            timeseries.ts_ohlc_hourly(spark, SF_T2).collect()}
    assert got == want
    # the sink really saw three disjoint micro-batches, not one
    out = os.path.join(SCRATCH, "stream",
                       spark.sparkContext.applicationId,
                       "stream_ohlc_bars", "out")
    batches = [d for d in os.listdir(out) if d.startswith("batch_id=")]
    assert len(batches) == 3, batches
