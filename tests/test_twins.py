"""Cross-implementation twin checks (SURVEY.md §5.3): independently-built
operators over the same data must agree — streaming vs batch, UDTF vs
built-in windowed SQL, pandas paths vs closed forms."""
from collections import Counter

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    streaming, timeseries, udfs,
)
from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def test_udtf_sessions_twin(spark):
    """UDTF sessionizer == windowed-cumsum sessionizer (per-user session
    count and per-session event-count multisets)."""
    built_in = timeseries.ts_sessionize(spark, SF_T2) \
        .select("user_id", "n_events").collect()
    via_udtf = udfs.udtf_sessions(spark, SF_T2) \
        .select("user_id", "n_events").collect()
    assert Counter(map(tuple, built_in)) == Counter(map(tuple, via_udtf))


def test_stream_tumbling_twin(spark):
    """Drained stream window counts == batch groupBy over the same file."""
    streamed = streaming.stream_tumbling_counts(spark, SF_T2).collect()
    ev = load(spark, SF_T2, "events")
    batch = (ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
               .agg(F.count("*").alias("n"),
                    F.round(F.avg("value"), 6).alias("avg_value"))
               .select(F.col("w.start").alias("window_start"),
                       "event_type", "n", "avg_value").collect())
    assert Counter(map(tuple, streamed)) == Counter(map(tuple, batch))


def test_stream_watermark_late_semantics(spark):
    """Append-mode watermark run (events staged 3x, one copy per
    micro-batch): every emitted window appears exactly once, at exactly
    2x the single-copy count — copies 0+1 aggregate (the watermark's
    filter takes effect one batch late, measured Spark 4.1.2 behavior),
    copy 2 is fully dropped as late, closed windows never re-emit.
    Without the watermark the multiplicity would be 3x."""
    out = streaming.stream_watermark_late(spark, SF_T2).collect()
    starts = [r["window_start"] for r in out]
    assert len(starts) == len(set(starts)), "window emitted more than once"
    assert len(starts) > 0, "no windows emitted"

    ev = load(spark, SF_T2, "events")
    batch = {r["ws"]: r["n"] for r in ev.groupBy(
        F.window("ts", "10 minutes").start.alias("ws"))
        .agg(F.count("*").alias("n")).collect()}
    for r in out:
        assert r["n"] == 2 * batch[r["window_start"]], (
            f"window {r['window_start']}: expected 2x single-copy count, "
            f"got {r['n']} vs single {batch[r['window_start']]}")


def test_stream_stateful_state_carries(spark):
    """transformWithStateInPandas: with events staged twice, each user's
    second emitted row must show exactly double the single-copy totals —
    proof the ValueState survived the micro-batch boundary."""
    out = streaming.stream_stateful_running(spark, SF_T2).collect()
    ev = load(spark, SF_T2, "events")
    single = {r["user_id"]: r["n"] for r in
              ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["n_so_far"])
    assert set(by_user) == set(single)
    for uid, ns in by_user.items():
        assert sorted(ns) == [single[uid], 2 * single[uid]], (
            f"user {uid}: expected [{single[uid]}, {2*single[uid]}], "
            f"got {sorted(ns)}")


def test_ewma_first_value(spark):
    """EWMA(adjust=False) must start at each user's first value."""
    ev = load(spark, SF_T2, "events")
    first = {r["user_id"]: round(r["v"], 6) for r in ev
             .withColumn("rn", F.row_number().over(
                 __import__("pyspark.sql.window", fromlist=["Window"])
                 .Window.partitionBy("user_id").orderBy("ts", "event_id")))
             .filter("rn = 1").select("user_id", F.col("value").alias("v"))
             .collect()}
    ewma = timeseries.ts_ewma(spark, SF_T2)
    ev_ids = ev.select("user_id", "event_id", "ts")
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window \
        .partitionBy("user_id").orderBy("ts", "event_id")
    first_ewma = {r["user_id"]: r["ewma"] for r in ewma.join(
        ev_ids.withColumn("rn", F.row_number().over(w)).filter("rn = 1"),
        ["user_id", "event_id"]).collect()}
    assert first_ewma == first


def test_stream_stateful_on_rocksdb_provider(spark):
    """The 100 TB state-store posture is now STRUCTURAL: the op pins the
    RocksDB provider for its query (transformWithStateInPandas requires
    it; the legacy fallback gets the same pin). Assert (a) two runs emit
    identical rows (deterministic under the pinned provider), and (b)
    the pin is scoped — the session-level provider conf is untouched
    afterwards."""
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    first = streaming.stream_stateful_running(spark, SF_T2).collect()
    second = streaming.stream_stateful_running(spark, SF_T2).collect()
    assert Counter(map(tuple, first)) == Counter(map(tuple, second))
    assert spark.conf.get(key, None) == before, "provider pin leaked"


def test_stateful_modern_api_plan_builds(spark):
    """The transformWithStateInPandas implementation must stay real,
    buildable code even where its protobuf-speaking runner can't execute
    (this container): the logical plan constructs and analyzes with the
    documented output schema. The capability probe decides execution;
    enabling the modern path is an environment change, not a code
    change."""
    ev = streaming._events_stream(spark, SF_T2, "tws_plan_probe")
    df = streaming._stateful_running_tws(ev)
    assert [f.name for f in df.schema.fields] == \
        ["user_id", "n_so_far", "sum_so_far"]
    # and the probe tells the truth about this environment
    try:
        from google.protobuf import descriptor  # noqa: F401
        have_proto = True
    except ImportError:
        have_proto = False
    assert streaming.tws_available() == have_proto


def test_interpolate_sql_twin(spark):
    """The pure-SQL lerp (union + ignorenulls windows) must reproduce the
    pandas grouped-map interpolation EXACTLY: `_interp_pdf` now mirrors
    the SQL twin's closed form (integer-µs fractions, identical op
    order), so both paths — and the shared DuckDB oracle — are
    bit-identical, not merely within a rounding ulp (the pre-round-4
    pandas path interpolated on a float-ns axis and flipped the 6th
    decimal on 13 of 105k rows at sf0.01)."""
    via_pandas = {(r["user_id"], r["grid_ts"]): r["value_interp"]
                  for r in timeseries.ts_interpolate_linear(spark, SF_T2)
                  .collect()}
    via_sql = {(r["user_id"], r["grid_ts"]): r["value_interp"]
               for r in timeseries.ts_interpolate_sql(spark, SF_T2)
               .collect()}
    assert via_pandas.keys() == via_sql.keys(), "grid mismatch"
    diverging = {k for k in via_pandas if via_pandas[k] != via_sql[k]}
    assert not diverging, (
        f"interpolated values diverge on {len(diverging)} grid points, "
        f"e.g. {sorted(diverging)[:3]}")


def test_stream_cusum_equals_batch(spark):
    """The streaming CUSUM summary must agree with the batch recursion
    on everything the batch op exposes: per-user event count, alarm
    count, and first alarm id (integer state on both sides, so equality
    is exact, not approximate)."""
    from pyspark.sql import functions as F

    from industry_big_data_time_sequence_process_spark.operators import streaming as st

    stream = {r["user_id"]: (r["n_events"], r["n_alarms"],
                             r["first_alarm_event_id"])
              for r in st.stream_cusum_alarms(spark, SF_T2).collect()}
    batch = {r["user_id"]: (r["n"], r["a"], r["f"])
             for r in timeseries.ts_cusum_changepoint(spark, SF_T2)
             .groupBy("user_id")
             .agg(F.count("*").alias("n"),
                  F.sum("alarm").alias("a"),
                  F.min(F.when(F.col("alarm") == 1, F.col("event_id")))
                   .alias("f"))
             .collect()}
    assert stream == batch


def test_sessionize_tws_twin(spark):
    """Timer-based transformWithState sessionizer == legacy
    applyInPandasWithState timeout sessionizer, row for row: both drain
    the same (user, start, end, n_events) session set over the same
    two-micro-batch staging, so the legacy->modern API migration is a
    verified equivalence (VERDICT r6 #4 follow-through)."""
    modern = Counter(map(tuple, streaming.stream_sessionize_tws(
        spark, SF_T2).collect()))
    legacy = Counter(map(tuple, streaming.stream_sessionize_timeout(
        spark, SF_T2).collect()))
    assert modern == legacy
    assert sum(modern.values()) > 0


def test_stream_semantic_ingest_equals_batch(spark):
    """The streamed SemDeDup ingest drop list == the batch incremental
    op row for row (both exact-oracled against the same SQL, but the
    twin pin survives an oracle edit): two micro-batches compose to the
    batch-global answer because keepers are static and each arrival
    lands in exactly one batch."""
    stream = Counter(map(tuple, streaming.stream_semantic_ingest(
        spark, SF_T2).collect()))
    batch = Counter(map(tuple, REGISTRY["dedup_semantic_incremental"]
                        .fn(spark, SF_T2).collect()))
    assert stream == batch
    assert sum(stream.values()) > 0
