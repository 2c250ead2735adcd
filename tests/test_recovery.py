"""Streaming failure-recovery proof (VERDICT r4 #3): stop a stateful
query after >=1 committed batch, restart it from the SAME checkpoint,
and assert the final state/sink equals the batch answer exactly — no
duplicates, no loss.

Two failure modes are exercised, because exactly-once resume has two
halves:

1. **State survival** (``test_stateful_state_survives_restart``): the
   per-user running totals carried in the RocksDB state store must
   survive a query stop + process-internal restart — if state were
   lost, the post-restart batch would re-emit 1x totals instead of the
   cumulative 2x rows.
2. **Sink replay idempotence**
   (``test_foreachbatch_replay_after_crash_before_commit``): a crash
   BETWEEN the foreachBatch sink write and the checkpoint commit makes
   Spark re-run that batch with the SAME batch_id on restart; the
   recipe pinned in ``operators/streaming.py`` (one overwritten
   parquet subdir per batch_id) must absorb the replay without
   duplicating rows. The crash is simulated deterministically by
   deleting the last ``commits/<N>`` checkpoint entry — the on-disk
   state a real crash at that point leaves behind.
"""
import os
import shutil

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators.sources_sinks import (
    SCRATCH,
)
from industry_big_data_time_sequence_process_spark.operators.streaming import (
    _ROCKSDB_PROVIDER, _stateful_running_legacy, _stateful_running_tws,
    tws_available,
)
from industry_big_data_time_sequence_process_spark.sources.io import (
    configure, decode_events_ts, events_read_schema, load,
)

from .conftest import SF_T2

BASE = os.path.join(SCRATCH, "stream", "recovery")


def _stage(indir: str, sf_dir: str, idx: int) -> None:
    """Drop one more copy of events.parquet into the stream source dir
    (distinct mtimes -> deterministic file->micro-batch assignment,
    same discipline as operators/streaming.py:_events_stream)."""
    src = f"{sf_dir.rstrip('/')}/events.parquet"
    dst = os.path.join(indir, f"events_{idx}.parquet")
    shutil.copy(src, dst)
    os.utime(dst, (1_700_000_000 + idx, 1_700_000_000 + idx))


def _open_stream(spark, indir: str, sf_dir: str):
    configure(spark)
    raw = (spark.readStream.schema(events_read_schema(sf_dir))
                .option("maxFilesPerTrigger", 1).parquet(indir))
    return decode_events_ts(raw, sf_dir)


def _sink_by_batch(out: str):
    def write_batch(bdf, bid: int) -> None:
        bdf.write.mode("overwrite").parquet(
            os.path.join(out, f"batch_id={bid}"))
    return write_batch


def _drain_to_sink(df, ckpt: str, out: str, mode: str) -> None:
    q = (df.writeStream.foreachBatch(_sink_by_batch(out))
           .outputMode(mode)
           .option("checkpointLocation", ckpt)
           .trigger(availableNow=True).start())
    q.awaitTermination()
    q.stop()


def test_stateful_state_survives_restart(spark):
    base = os.path.join(BASE, "state")
    shutil.rmtree(base, ignore_errors=True)
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    os.makedirs(indir)

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
    try:
        # run 1: one staged file -> batch 0 commits, then the query stops
        # (the "crash": no process survives a query object)
        _stage(indir, SF_T2, 0)
        ev = _open_stream(spark, indir, SF_T2)
        dd = (_stateful_running_tws(ev) if tws_available()
              else _stateful_running_legacy(ev))
        _drain_to_sink(dd, ckpt, out, "append")

        n_commits = len([f for f in os.listdir(os.path.join(ckpt, "commits"))
                         if not f.startswith(".")])
        assert n_commits >= 1, "no batch committed before the stop"

        # run 2: new data arrives; a FRESH query resumes from the SAME
        # checkpoint — per-user totals must continue from RocksDB state
        _stage(indir, SF_T2, 1)
        ev2 = _open_stream(spark, indir, SF_T2)
        dd2 = (_stateful_running_tws(ev2) if tws_available()
               else _stateful_running_legacy(ev2))
        _drain_to_sink(dd2, ckpt, out, "append")
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)

    got = sorted(
        tuple(r) for r in spark.read.option("basePath", out).parquet(out)
        .select("user_id", "n_so_far", "sum_so_far").collect())

    # batch twin: each user at exactly 1x and 2x its single-copy
    # aggregate (decimal-exact cents, same arithmetic as the state)
    agg = (load(spark, SF_T2, "events")
           .groupBy("user_id")
           .agg(F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("s")))
    k = F.explode(F.array(F.lit(1), F.lit(2))).alias("k")
    want = sorted(
        tuple(r) for r in agg.select("user_id", "n", "s", k)
        .select("user_id", (F.col("k") * F.col("n")).alias("n_so_far"),
                (F.col("k") * F.col("s")).cast("double")
                .alias("sum_so_far")).collect())

    assert got == want, (
        f"restart lost or duplicated state: {len(got)} rows vs "
        f"{len(want)} expected; first diff: "
        f"{next((a, b) for a, b in zip(got, want) if a != b)}")


def test_foreachbatch_replay_after_crash_before_commit(spark):
    base = os.path.join(BASE, "replay")
    shutil.rmtree(base, ignore_errors=True)
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    os.makedirs(indir)

    _stage(indir, SF_T2, 0)
    _stage(indir, SF_T2, 1)
    ev = _open_stream(spark, indir, SF_T2)
    rows = ev.select("event_id", "user_id", "value")
    _drain_to_sink(rows, ckpt, out, "append")

    commits = os.path.join(ckpt, "commits")
    done = sorted(f for f in os.listdir(commits) if not f.startswith("."))
    assert len(done) == 2, f"expected 2 committed batches, got {done}"

    # crash window: the sink write for the last batch landed, but its
    # commit record did not — exactly what deleting it leaves behind
    # (the local filesystem's hidden .crc shadow must go with it, or the
    # checksum fs refuses the re-write on restart)
    os.remove(os.path.join(commits, done[-1]))
    crc = os.path.join(commits, f".{done[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # restart: Spark replays the uncommitted batch (same batch_id) into
    # the foreachBatch sink; the per-batch_id overwrite absorbs it
    ev2 = _open_stream(spark, indir, SF_T2)
    _drain_to_sink(ev2.select("event_id", "user_id", "value"),
                   ckpt, out, "append")

    n_events = load(spark, SF_T2, "events").count()
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == 2 * n_events, "replay duplicated or lost rows"
    per_batch = {r["batch_id"]: r["n"] for r in
                 back.groupBy("batch_id").agg(F.count("*").alias("n"))
                 .collect()}
    assert per_batch == {0: n_events, 1: n_events}, per_batch
    # and not just counts: the replayed batch carries the same rows
    dup = (back.groupBy("batch_id", "event_id")
               .agg(F.count("*").alias("c")).filter("c > 1").count())
    assert dup == 0, "duplicate events inside a batch after replay"


def test_tws_state_survives_restart(spark):
    """VERDICT r7 #7: the MODERN stateful path — transformWithState
    (`_sessionize_timeout_tws`: ValueState + registered event-time
    timers on RocksDB) — must survive a kill + resume mid-stream. The
    corpus is split at a timestamp chosen so at least one session SPANS
    the split (events < 30-min gap apart on both sides): run 1 drains
    only the first half and stops; run 2 resumes the SAME checkpoint
    with the second half staged. The spanning session can only emerge
    merged if the open-session ValueState and its registered timer
    round-tripped through RocksDB across the query incarnations. The
    final session set must equal an UNINTERRUPTED run over the same two
    files byte-for-byte."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pandas as pd

    from industry_big_data_time_sequence_process_spark.operators.streaming import (
        _sessionize_timeout_tws,
    )

    if not tws_available():
        import pytest
        pytest.skip("transformWithState needs protobuf on workers")

    #: a mid-corpus instant splitting user 128's two events 99 s apart —
    #: probed from the sf0.01 corpus; one session provably spans it
    split = "2024-01-15 01:28:32.790081"

    def stage(indir: str, halves: list[int]) -> None:
        t = pq.read_table(f"{SF_T2}/events.parquet")
        s = pa.scalar(pd.Timestamp(split),
                      type=t.schema.field("ts").type)
        parts = [t.filter(pc.less_equal(t["ts"], s)),
                 t.filter(pc.greater(t["ts"], s))]
        os.makedirs(indir, exist_ok=True)
        for i in halves:
            dst = os.path.join(indir, f"events_{i}.parquet")
            pq.write_table(parts[i], dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    def run(indir: str, ckpt: str, out: str) -> None:
        ev = _open_stream(spark, indir, SF_T2)
        _drain_to_sink(_sessionize_timeout_tws(ev), ckpt, out, "append")

    def sessions(out: str) -> list[tuple]:
        return sorted(tuple(r) for r in
                      spark.read.option("basePath", out).parquet(out)
                      .select("user_id", "start_us", "end_us", "n_events")
                      .collect())

    base = os.path.join(BASE, "tws")
    shutil.rmtree(base, ignore_errors=True)

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
    try:
        # killed-and-resumed: half 0, stop, half 1, resume same ckpt
        indir = os.path.join(base, "in")
        ckpt, out = os.path.join(base, "ckpt"), os.path.join(base, "out")
        stage(indir, [0])
        run(indir, ckpt, out)
        commits = os.path.join(ckpt, "commits")
        assert len([f for f in os.listdir(commits)
                    if not f.startswith(".")]) >= 1, "no committed batch"
        stage(indir, [1])
        run(indir, ckpt, out)

        # uninterrupted reference: both halves, one query incarnation
        indir2 = os.path.join(base, "in2")
        ckpt2, out2 = os.path.join(base, "ckpt2"), os.path.join(base, "out2")
        stage(indir2, [0, 1])
        run(indir2, ckpt2, out2)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)

    got, want = sessions(out), sessions(out2)
    assert got == want, (
        f"TWS restart diverged from the uninterrupted run: "
        f"{len(got)} vs {len(want)} rows; first diff "
        f"{next(((a, b) for a, b in zip(got, want) if a != b), None)}")
    # the state-crossing proof: >= 1 emitted session STARTS before the
    # split and ENDS after it — impossible unless the open-session
    # ValueState survived the kill
    split_us = int(pd.Timestamp(split).value // 1000)
    spanning = [s for s in got if s[1] <= split_us < s[2]]
    assert spanning, "no session spans the kill point — test corpus bug"
