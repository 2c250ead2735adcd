"""Semantic tests for the fourth round-7 wave (SURVEY.md §2.21) — beyond
oracle parity: oscillator warm-up/bounds contracts, heatmap mass checks,
a hand recomputation of the daily range volatility, correlation-matrix
shape invariants, behavioral-shift recomputation, variance-prune rank
permutation, walk-forward leakage audits, and the streaming heavy-hitter
twin's batch equality + genuinely-multi-batch sink."""
import math
import os

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    sampling, similarity, streaming, timeseries,
)
from industry_big_data_time_sequence_process_spark.operators.sources_sinks \
    import SCRATCH
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def test_stochastic_bounds_and_warmup(spark):
    df = timeseries.ts_stochastic_osc(spark, SF_T2).cache()
    try:
        assert df.filter((F.col("pct_k") < 0) | (F.col("pct_k") > 100)) \
                 .count() == 0
        assert df.filter((F.col("pct_d") < 0) | (F.col("pct_d") > 100)) \
                 .count() == 0
        # row count preserved; at least the first 13 ticks per user are
        # NULL %K (flat full windows may add more)
        per_user = dict(load(spark, SF_T2, "events").groupBy("user_id")
                        .count().collect())
        rows = dict(df.groupBy("user_id").count().collect())
        nulls = dict(df.filter(F.col("pct_k").isNull())
                       .groupBy("user_id").count().collect())
        for u, n in per_user.items():
            assert rows.get(u, 0) == n
            assert nulls.get(u, 0) >= min(13, n)
        # %D only exists where %K does (it averages 3 non-NULL %K rows)
        assert df.filter(F.col("pct_d").isNotNull()
                         & F.col("pct_k").isNull()).count() == 0
    finally:
        df.unpersist()


def test_dow_hod_heatmap_mass(spark):
    df = timeseries.ts_dow_hod_heatmap(spark, SF_T2).cache()
    try:
        total = load(spark, SF_T2, "events").count()
        assert df.agg(F.sum("n_events")).collect()[0][0] == total
        # per-type shares sum to 1 (within rounding of the 6dp cells)
        for r in df.groupBy("event_type").agg(F.sum("share").alias("s")) \
                   .collect():
            assert abs(r["s"] - 1.0) < 1e-3, r
        assert df.filter((F.col("dow") < 1) | (F.col("dow") > 7)
                         | (F.col("hod") < 0) | (F.col("hod") > 23)) \
                 .count() == 0
    finally:
        df.unpersist()


def test_range_vol_daily_recompute_one_group(spark):
    df = timeseries.ts_range_vol_daily(spark, SF_T2)
    row = df.orderBy(F.col("n_bars").desc(), "user_id", "day").first()
    ev = (load(spark, SF_T2, "events")
          .filter((F.col("user_id") == row["user_id"])
                  & (F.to_date("ts") == row["day"]))
          .withColumn("v100", (F.col("value").cast("decimal(18,2)")
                               * 100).cast("long"))
          .groupBy(F.date_trunc("hour", "ts").alias("h"))
          .agg(F.count("*").alias("n_t"), F.max("v100").alias("hi"),
               F.min("v100").alias("lo"))
          .filter(F.col("n_t") >= 2).collect())
    assert len(ev) == row["n_bars"]
    srq = sum((b["hi"] - b["lo"]) ** 2 for b in ev)
    expect = math.sqrt(srq / (4 * 0.6931471805599453 * len(ev))) / 100
    assert abs(row["range_vol"] - expect) < 1e-5


def test_channel_corr_matrix_shape(spark):
    df = timeseries.ts_channel_corr_matrix(spark, SF_T2).cache()
    try:
        types = [r[0] for r in load(spark, SF_T2, "events")
                 .select("event_type").distinct().collect()]
        k = len(types)
        assert df.count() == k * (k - 1) // 2
        assert df.filter(F.col("type_a") >= F.col("type_b")).count() == 0
        assert df.filter((F.col("corr") < -1) | (F.col("corr") > 1)) \
                 .count() == 0
    finally:
        df.unpersist()


def test_behavior_shift_recompute_one_day(spark):
    df = timeseries.ts_behavior_shift_days(spark, SF_T2)
    row = df.orderBy(F.col("l1_score").desc(), "user_id", "day").first()
    ev = load(spark, SF_T2, "events").filter(
        F.col("user_id") == row["user_id"])
    cu = {r[0]: r[1] for r in ev.groupBy("event_type").count().collect()}
    nu = sum(cu.values())
    cd = {r[0]: r[1] for r in ev.filter(F.to_date("ts") == row["day"])
                                .groupBy("event_type").count().collect()}
    nd = sum(cd.values())
    l1 = sum(abs(cd.get(t, 0) / nd - c / nu) for t, c in cu.items())
    assert row["n_day"] == nd
    assert abs(row["l1_score"] - l1) < 1e-5
    assert row["shifted"] == int(l1 > 0.5)


def test_dim_variance_prune_rank_permutation(spark):
    df = similarity.emb_dim_variance_prune(spark, SF_T2).cache()
    try:
        rows = df.collect()
        dims = sorted(r["dim"] for r in rows)
        assert dims == list(range(1, len(rows) + 1))
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1))
        assert sum(r["kept"] for r in rows) == min(16, len(rows))
        assert all(r["variance"] >= 0 for r in rows)
        # kept set = the 16 best ranks
        assert all(r["kept"] == int(r["rank"] <= 16) for r in rows)
    finally:
        df.unpersist()


def test_walkforward_cv_leakage_and_monotonicity(spark):
    rows = {r["fold"]: r for r in
            sampling.sample_walkforward_cv(spark, SF_T2).collect()}
    assert sorted(rows) == [1, 2, 3]
    total = load(spark, SF_T2, "events").count()
    for k, r in rows.items():
        assert r["no_leak"] == 1
        assert r["train_rows"] > 0 and r["test_rows"] > 0
        assert r["train_rows"] + r["test_rows"] <= total
        assert r["train_end_day"] < r["test_start_day"]
        assert r["test_start_day"] <= r["test_end_day"]
    # expanding window: later folds train on strictly more history
    assert rows[1]["train_rows"] < rows[2]["train_rows"] \
        < rows[3]["train_rows"]


def test_stream_heavy_hitters_matches_batch_and_multibatch(spark):
    df = streaming.stream_heavy_hitters(spark, SF_T2)
    got = [(r["user_id"], r["n_events"], r["rank"]) for r in
           df.orderBy("rank").collect()]
    ev = load(spark, SF_T2, "events")
    want = [(r["user_id"], r["n"], i + 1) for i, r in enumerate(
        ev.groupBy("user_id").agg(F.count("*").alias("n"))
          .orderBy(F.col("n").desc(), "user_id").limit(20).collect())]
    assert got == want
    # the sink really held 3 disjoint batch partials
    out = os.path.join(SCRATCH, "stream",
                       spark.sparkContext.applicationId,
                       "stream_heavy_hitters", "out")
    batches = sorted(d for d in os.listdir(out)
                     if d.startswith("batch_id="))
    assert len(batches) == 3
