"""Property-based tests (SURVEY.md §5.3): algebraic invariants of the
core API transforms over Hypothesis-generated literal DataFrames.

Examples are kept small (Py4J round-trips dominate) but adversarial:
duplicate timestamps, single-row keys, all-in-one-session gaps, nulls.
"""
import datetime

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Row, functions as F

from industry_big_data_time_sequence_process_spark import api

BASE = datetime.datetime(2024, 1, 1)

# (user_id, minutes-offset, value) event streams
events_strategy = st.lists(
    st.tuples(st.integers(0, 2),
              st.integers(0, 10_000),
              st.integers(-100, 100)),
    min_size=1, max_size=25,
)

SET = settings(max_examples=15, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def _events_df(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_id=i, ts=BASE + datetime.timedelta(minutes=m),
             value=float(v))
         for i, (u, m, v) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp, value double",
    )


@given(rows=events_strategy)
@SET
def test_sessionize_partitions_exactly(spark, rows):
    """Sessionization is a partition of the input: no row lost or duped,
    session ids contiguous from 1 per user, and consecutive rows in one
    session are <= gap apart while session boundaries are > gap."""
    df = _events_df(spark, rows)
    out = api.sessionize(df, "user_id", "ts", gap_minutes=30,
                         tiebreak="event_id").collect()
    assert len(out) == len(rows)
    assert sorted(r["event_id"] for r in out) == sorted(range(len(rows)))
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for seq in by_user.values():
        assert seq[0]["session_seq"] == 1
        for a, b in zip(seq, seq[1:]):
            gap = (b["ts"] - a["ts"]).total_seconds()
            if b["session_seq"] == a["session_seq"]:
                assert gap <= 30 * 60
            else:
                assert b["session_seq"] == a["session_seq"] + 1
                assert gap > 30 * 60


@given(rows=events_strategy,
       orders=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
                       min_size=0, max_size=10))
@SET
def test_asof_backward_invariants(spark, rows, orders):
    """As-of backward join: every left row survives exactly once; the
    attached right ts is the max right ts <= left ts for that key (None
    iff no such right row)."""
    left = _events_df(spark, rows)
    right = spark.createDataFrame(
        [Row(user_id=u, o_ts=BASE + datetime.timedelta(minutes=m),
             o_val=float(i))
         for i, (u, m) in enumerate(sorted(set(orders)))],
        "user_id long, o_ts timestamp, o_val double",
    )
    out = api.asof_join_backward(left, right, key="user_id", left_ts="ts",
                                 right_ts="o_ts", value_cols=["o_val"]).collect()
    assert sorted(r["event_id"] for r in out) == sorted(range(len(rows)))
    rights = {}
    for u, m in set(orders):
        rights.setdefault(u, []).append(BASE + datetime.timedelta(minutes=m))
    for r in out:
        eligible = [t for t in rights.get(r["user_id"], []) if t <= r["ts"]]
        expect = max(eligible) if eligible else None
        assert r["o_ts"] == expect, (r, expect)


@given(rows=events_strategy, k=st.integers(1, 4))
@SET
def test_topk_per_group_is_prefix_of_sort(spark, rows, k):
    """topk_per_group == the first k rows of each group's total order."""
    df = _events_df(spark, rows)
    out = api.topk_per_group(df, ["user_id"],
                             [F.col("value").desc(), F.col("event_id")],
                             k=k).collect()
    full = sorted(
        ((r[0], i, float(r[2])) for i, r in enumerate(rows)),
        key=lambda t: (t[0], -t[2], t[1]))
    expect = {}
    for u, eid, v in full:
        expect.setdefault(u, [])
        if len(expect[u]) < k:
            expect[u].append(eid)
    got = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["rnk"])):
        got.setdefault(r["user_id"], []).append(r["event_id"])
    assert got == expect


@given(rows=events_strategy)
@SET
def test_dedup_latest_idempotent(spark, rows):
    """dedup keeps exactly one row per key and is idempotent."""
    df = _events_df(spark, rows)
    order = [F.col("ts").desc(), F.col("event_id").desc()]
    once = api.dedup_latest(df, ["user_id"], order)
    twice = api.dedup_latest(once, ["user_id"], order)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    users = {u for u, _, _ in rows}
    assert len(a) == len(users)


@given(rows=st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 100),
              st.one_of(st.none(), st.integers(-5, 5))),
    min_size=1, max_size=20))
@SET
def test_forward_fill_carries_last_non_null(spark, rows):
    """forward_fill equals the pure-python scan of the same ordering."""
    df = spark.createDataFrame(
        [Row(user_id=u, event_id=i, ts=BASE + datetime.timedelta(minutes=m),
             v=(float(x) if x is not None else None))
         for i, (u, m, x) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp, v double",
    )
    out = api.forward_fill(df, "user_id", "ts", "v", "v_filled",
                           tiebreak="event_id").collect()
    expect = {}
    last = {}
    for i, (u, m, x) in sorted(enumerate(rows),
                               key=lambda t: (t[1][0], t[1][1], t[0])):
        if x is not None:
            last[u] = float(x)
        expect[i] = last.get(u)
    for r in out:
        assert r["v_filled"] == expect[r["event_id"]]


@given(rows=events_strategy,
       orders=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
                       min_size=0, max_size=10))
@SET
def test_asof_forward_invariants(spark, rows, orders):
    """As-of forward join: every left row survives exactly once; the
    attached right ts is the MIN right ts >= left ts for that key
    (inclusive at equality), None iff no such right row."""
    left = _events_df(spark, rows)
    right = spark.createDataFrame(
        [Row(user_id=u, o_ts=BASE + datetime.timedelta(minutes=m),
             o_val=float(i))
         for i, (u, m) in enumerate(sorted(set(orders)))],
        "user_id long, o_ts timestamp, o_val double",
    )
    out = api.asof_join_forward(left, right, key="user_id", left_ts="ts",
                                right_ts="o_ts", value_cols=["o_val"]).collect()
    assert sorted(r["event_id"] for r in out) == sorted(range(len(rows)))
    rights = {}
    for u, m in set(orders):
        rights.setdefault(u, []).append(BASE + datetime.timedelta(minutes=m))
    for r in out:
        eligible = [t for t in rights.get(r["user_id"], []) if t >= r["ts"]]
        expect = min(eligible) if eligible else None
        assert r["o_ts"] == expect, (r, expect)


def test_session_native_boundary_semantics(spark):
    """Boundary semantics, pinned empirically (Spark 4.1.2): a gap of
    EXACTLY 30 min MERGES under BOTH ts_sessionize (strictly-greater
    split rule) and native session_window — and a gap one microsecond
    over splits both. The ts_session_native oracle encodes exactly this."""
    us = datetime.timedelta(microseconds=1)
    for extra, want_sessions in [(datetime.timedelta(0), 1), (us, 2)]:
        df = spark.createDataFrame(
            [Row(user_id=1, event_id=0, ts=BASE, value=1.0),
             Row(user_id=1, event_id=1,
                 ts=BASE + datetime.timedelta(minutes=30) + extra,
                 value=1.0)],
            "user_id long, event_id long, ts timestamp, value double",
        )
        tagged = api.sessionize(df, "user_id", "ts", gap_minutes=30,
                                tiebreak="event_id").collect()
        assert len({r["session_seq"] for r in tagged}) == want_sessions
        native = (df.groupBy("user_id",
                             F.session_window("ts", "30 minutes").alias("w"))
                    .count().collect())
        assert len(native) == want_sessions, (extra, native)


def test_containment_dominates_jaccard(spark):
    """Set identity: |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| on every emitted
    pair, and both scores live in (0, 1]. Also: every jaccard>=0.5 pair
    (the symmetric near-dup class) must appear in the containment>=0.8
    output ONLY if its containment clears the bar — i.e. the two ops
    disagree exactly on the pairs where the shorter doc is swallowed by
    the longer one."""
    from industry_big_data_time_sequence_process_spark.registry import REGISTRY

    from .conftest import SF_T2

    rows = REGISTRY["dedup_containment"].fn(spark, SF_T2).collect()
    assert rows, "containment output empty on the planted-dup corpus"
    for r in rows:
        assert 0.0 < r["jaccard"] <= r["containment"] <= 1.0, r


def test_incremental_minhash_is_the_crossing_slice(spark):
    """dedup_incremental_minhash (batch = doc_id%4==3 vs corpus) must
    emit exactly dedup_near_minhash's pairs that CROSS the batch
    boundary, re-oriented as (new_doc, dup_of) — the incremental path
    may not invent pairs the full self-join can't see, nor drop any
    crossing pair (identical band signatures on both paths)."""
    from industry_big_data_time_sequence_process_spark.registry import REGISTRY

    from .conftest import SF_T2

    full = {(r["doc1"], r["doc2"])
            for r in REGISTRY["dedup_near_minhash"].fn(spark, SF_T2)
            .collect()}
    crossing = {p for p in full if (p[0] % 4 == 3) != (p[1] % 4 == 3)}
    inc = {tuple(sorted((r["new_doc"], r["dup_of"])))
           for r in REGISTRY["dedup_incremental_minhash"].fn(spark, SF_T2)
           .collect()}
    assert inc == crossing, (inc ^ crossing)


# ---- round 5: two-phase rank primitives vs unpartitioned windows ------

ranked_rows = st.lists(
    st.tuples(st.integers(0, 2),          # group
              st.integers(-50, 50)),      # value (heavy duplicates)
    min_size=1, max_size=25,
)


def _rank_df(spark, rows):
    return spark.createDataFrame(
        [Row(g=g, id=i, v=float(v)) for i, (g, v) in enumerate(rows)],
        "g long, id long, v double")


@given(rows=ranked_rows, k=st.integers(1, 5))
@SET
def test_bucketed_ntile_matches_sql_ntile(spark, rows, k):
    """Exact ntile arithmetic from (rank, n) must equal SQL ntile for
    ANY (n, k) pair — including n < k, heavy value duplicates, and
    negative values (negative floor buckets)."""
    from pyspark.sql import Window
    df = _rank_df(spark, rows)
    want = df.withColumn(
        "t", F.ntile(k).over(Window.orderBy("v", "id"))) \
        .select("id", "t")
    got = api.bucketed_ntile(
        df, F.floor(F.col("v") / 7).cast("long"),
        [F.col("v"), F.col("id")], k, tile_name="t").select("id", "t")
    assert sorted(map(tuple, want.collect())) == \
        sorted(map(tuple, got.collect()))


@given(rows=ranked_rows)
@SET
def test_grouped_bucketed_rank_matches_window(spark, rows):
    from pyspark.sql import Window
    df = _rank_df(spark, rows)
    want = df.withColumn(
        "r", F.row_number().over(
            Window.partitionBy("g").orderBy("v", "id"))) \
        .select("g", "id", "r")
    got = api.bucketed_global_rank(
        df, F.floor(F.col("v") / 7).cast("long"),
        [F.col("v"), F.col("id")], rank_name="r",
        group_cols=["g"]).select("g", "id", "r")
    assert sorted(map(tuple, want.collect())) == \
        sorted(map(tuple, got.collect()))


@given(rows=ranked_rows, frac=st.sampled_from([0.25, 0.5, 0.8, 0.95]))
@SET
def test_bucketed_order_statistic_matches_rank_pick(spark, rows, frac):
    """The two-phase cutoff must pick exactly the floor(frac*n)-th row
    (or nothing when that index is 0)."""
    from pyspark.sql import Window
    df = _rank_df(spark, rows)
    n = len(rows)
    want_k = int(frac * n)
    got = api.bucketed_order_statistic(
        df, F.floor(F.col("v") / 7).cast("long"),
        [F.col("v"), F.col("id")], frac).select("id").collect()
    if want_k == 0:
        assert got == []
    else:
        want = (df.withColumn("r", F.row_number().over(
                    Window.orderBy("v", "id")))
                  .filter(F.col("r") == want_k).select("id").first())
        assert len(got) == 1 and got[0].id == want.id


# ---- round-10: pure-decoder round-trip properties (no Spark needed) --------
#
# The three in-repo container readers (purewav, purey4m — purepng has
# its own filter-type goldens in tests/test_multimodal.py) must invert
# a stdlib-built encoder EXACTLY for every geometry/sample combination:
# integer samples in, the same integers out, no float anywhere.

import io as _io
import struct as _struct


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    rate=st.integers(1, 192_000),
    extra_chunk=st.booleans(),
)
@settings(max_examples=50, deadline=None)
def test_purewav_roundtrip_exact(samples, rate, extra_chunk):
    from industry_big_data_time_sequence_process_spark.operators import (
        purewav)

    frames = _struct.pack(f"<{len(samples)}h", *samples)
    fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:       # container noise must not reach the samples
        chunks += b"LIST" + _struct.pack("<I", 6) + b"INFOxy"
    chunks += b"data" + _struct.pack("<I", len(frames)) + frames
    if len(frames) % 2:
        chunks += b"\x00"
    blob = (b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE"
            + chunks)
    clip = purewav.open(_io.BytesIO(blob))
    assert clip.samples() == samples
    assert clip.sample_rate == rate and clip.n_samples == len(samples)
    assert list(clip.mono_u8()) == [((s >> 8) + 128) & 0xFF
                                    for s in samples]


@given(
    w=st.integers(1, 16), h=st.integers(1, 16),
    planes=st.lists(st.lists(st.integers(0, 255), min_size=1),
                    min_size=1, max_size=6),
)
@settings(max_examples=50, deadline=None)
def test_purey4m_roundtrip_exact(w, h, planes):
    from industry_big_data_time_sequence_process_spark.operators import (
        purey4m)

    ysz = w * h
    frames = [bytes((p[i % len(p)] for i in range(ysz))) for p in planes]
    blob = f"YUV4MPEG2 W{w} H{h} F30:1 Cmono\n".encode() + b"".join(
        b"FRAME\n" + f for f in frames)
    clip = purey4m.open(_io.BytesIO(blob))
    assert clip.size == (w, h) and clip.n_frames == len(frames)
    for i, f in enumerate(frames):
        assert clip.frame_luma(i) == f           # exact integer plane
    assert clip.luma_sigs() == [sum(f) * 1000 // ysz for f in frames]
