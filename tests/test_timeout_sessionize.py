"""stream_sessionize_timeout: both emission paths must actually fire
(the exact VALUES are covered by its DuckDB oracle in
test_oracle_parity; this pins the MECHANISM so a regression that, say,
stops timers from firing but happens to keep values equal on some
corpus cannot slip through)."""
from pyspark.sql import Window, functions as F

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2


def test_both_emission_paths_fire(spark):
    out = REGISTRY["stream_sessionize_timeout"].fn(spark, SF_T2)
    w = Window.partitionBy("user_id")
    tagged = out.withColumn("is_user_last",
                            (F.col("session_end")
                             == F.max("session_end").over(w)).cast("int"))
    counts = {r["is_user_last"]: r["n"] for r in
              tagged.groupBy("is_user_last").agg(F.count("*").alias("n"))
              .collect()}
    # a user's LAST emitted session can only have come from a fired
    # event-time timer (no later event existed to split it); earlier
    # sessions can only have come from gap-split-on-arrival
    assert counts.get(1, 0) > 0, "timer path never fired"
    assert counts.get(0, 0) > 0, "gap-split path never fired"


def test_open_sessions_never_emit(spark):
    """Sessions still open against the final watermark must be withheld
    (append-mode contract): every emitted end clears max(ts) - delay OR
    the user has a later session."""
    from industry_big_data_time_sequence_process_spark.sources.io import load

    out = REGISTRY["stream_sessionize_timeout"].fn(spark, SF_T2)
    mx = load(spark, SF_T2, "events").agg(
        F.max(F.unix_micros("ts")).alias("m")).first().m
    wm = mx - 10 * 60 * 1_000_000
    w = Window.partitionBy("user_id")
    bad = (out.withColumn("last_end", F.max("session_end").over(w))
              .filter((F.unix_micros("session_end") > wm)
                      & (F.col("session_end") == F.col("last_end")))
              .count())
    assert bad == 0, f"{bad} still-open sessions leaked into the output"
