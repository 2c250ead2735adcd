"""Round-12 stream-stream funnel join: late/on-time emission pins.

`stream_funnel_join`'s registered drain stages time-ordered halves, so
no input row is ever behind the watermark and the result is exactly the
batch bounded-range join (exact-oracled in tests/test_oracle_parity.py).
THESE pins drive the SAME `_funnel_join` over a planted OUT-OF-ORDER
corpus to prove the semantics the corpus path cannot exercise —
measured, not assumed (the first cut of this pin assumed input-side
late filtering; Spark actually joins every input row against state and
evicts state only at END of batch, so the real guarantee is one batch
weaker):

- a purchase arriving TWO batches behind the watermark finds its
  matching click's state already evicted — the pair exists in the
  batch answer but does not emit (the documented stream-stream join
  late-data guarantee: rows later than watermark + range allowance
  may or may not match, and once state is gone they cannot);
- an on-time cross-batch pair (click buffered from batch 0, purchase
  in batch 1) emits from buffered join STATE;
- an on-time within-batch pair emits as usual.
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.operators.streaming import (  # noqa: E501
    _drain,
    _funnel_join,
)
from industry_big_data_time_sequence_process_spark.sources.io import (
    decode_events_ts,
    events_read_schema,
)

from .test_wave_r10b import _EVENT_SCHEMA, T0

H_US = 3_600_000_000
M_US = 60_000_000

#: planted rows: key -> (event_id, ts, user_id, event_type), clock =
#: "hh:mm after T0". Timeline of the drain (measured via
#: recentProgress): batch 0 joins {A, C, W1} x {P0, W2} with watermark
#: still 0 and emits A<->P0; the watermark then advances to 13:50
#: (max 14:00 - 10 min). Batch 1 joins inputs {B} x {P1, P2} against
#: the batch-0 state and emits B<->P1 (within-batch) + C<->P2
#: (cross-batch, from buffered click state); at END of batch 1 Spark
#: evicts click state older than watermark - 1 h range allowance =
#: 12:50 — A@10:00 goes. Batch 2 delivers the straggler PL@10:05
#: (u1, in A's 1-h funnel window): its partner's state is gone, so
#: the pair the batch answer contains never emits.
_ROWS = {
    "A": (1, T0 + 10 * H_US, 1, "click"),
    "C": (3, T0 + 13 * H_US + 30 * M_US, 99, "click"),
    "W1": (4, T0 + 14 * H_US, 777, "click"),
    "B": (2, T0 + 14 * H_US + 10 * M_US, 2, "click"),
    "P0": (10, T0 + 10 * H_US + 20 * M_US, 1, "purchase"),
    "W2": (14, T0 + 14 * H_US, 888, "purchase"),
    "PL": (11, T0 + 10 * H_US + 5 * M_US, 1, "purchase"),
    "P1": (12, T0 + 14 * H_US + 20 * M_US, 2, "purchase"),
    "P2": (13, T0 + 13 * H_US + 55 * M_US, 99, "purchase"),
}

#: micro-batch file plan (3 files per source; clicks file2 is empty to
#: keep the two sources' triggers aligned).
_FILES = {"click": (["A", "C", "W1"], ["B"], []),
          "purchase": (["P0", "W2"], ["P1", "P2"], ["PL"])}


def _tbl(keys):
    rs = [_ROWS[k] for k in keys]
    return pa.table({
        "event_id": [r[0] for r in rs],
        "ts": pa.array([r[1] for r in rs], pa.timestamp("us")),
        "user_id": [r[2] for r in rs],
        "event_type": [r[3] for r in rs],
        "value": [1.0] * len(rs),
        "props": ["{}"] * len(rs),
    }, schema=_EVENT_SCHEMA)


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel_late")
    # full planted corpus: schema probe + the batch-twin answer
    pq.write_table(_tbl(list(_ROWS)), d / "events.parquet")
    for src, batches in _FILES.items():
        indir = d / f"in_{src}"
        indir.mkdir()
        for i, keys in enumerate(batches):
            f = indir / f"{src}_{i}.parquet"
            pq.write_table(_tbl(keys), f)
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    return d


def test_funnel_join_late_drop_and_cross_batch_state(spark, staged):
    sf_dir = str(staged)

    def src(name):
        raw = (spark.readStream.schema(events_read_schema(sf_dir))
                    .option("maxFilesPerTrigger", 1)
                    .parquet(str(staged / f"in_{name}")))
        return decode_events_ts(raw, sf_dir)

    joined = _funnel_join(src("click"), src("purchase"))
    out = _drain(spark, "funnel_late_pin", joined, "append")
    got = {(r["click_id"], r["purchase_id"]) for r in out.collect()}

    # batch answer over the same planted rows: the full bounded-range join
    ev = spark.read.schema(events_read_schema(sf_dir)) \
        .parquet(str(staged / "events.parquet"))
    c = ev.filter("event_type = 'click'") \
          .selectExpr("event_id AS click_id", "user_id AS cu", "ts AS ct")
    p = ev.filter("event_type = 'purchase'") \
          .selectExpr("event_id AS purchase_id", "user_id AS pu",
                      "ts AS pt")
    batch = {(r["click_id"], r["purchase_id"])
             for r in c.join(p, (c.cu == p.pu) & (p.pt > c.ct)
                             & (p.pt <= c.ct + F.expr("INTERVAL 1 HOUR")))
                       .collect()}

    late_pair = (1, 11)                  # A <-> PL: A's state evicted a
    #                                      batch before PL straggled in
    assert late_pair in batch            # the batch answer HAS it...
    assert got == batch - {late_pair}    # ...streaming can no longer emit it
    assert (3, 13) in got                # cross-batch: C buffered from
    #                                      batch 0 joins P2 in batch 1
    assert (2, 12) in got                # within-batch on-time pair


# F import at module scope keeps the test body readable
from pyspark.sql import functions as F  # noqa: E402


def test_funnel_join_outer_emits_only_closed_abandonments(spark,
                                                          staged,
                                                          tmp_path_factory):
    """Left-outer twin on a plant with one genuinely abandoned funnel:
    U@09:00 (u555, no purchases) emits its NULL row — its 1-h window
    closed long before the final watermark (14:00) — while W1@14:00
    (also unmatched) does NOT: its window is still open when the stream
    ends, so the engine cannot yet know the funnel was abandoned. The
    late-straggler pair stays impossible (state evicted), and matched
    pairs are unchanged from the inner pin."""
    d = tmp_path_factory.mktemp("funnel_outer")
    rows = dict(_ROWS)
    rows["U"] = (5, T0 + 9 * H_US, 555, "click")
    files = {"click": (["A", "C", "W1", "U"], ["B"], []),
             "purchase": (["P0", "W2"], ["P1", "P2"], ["PL"])}

    def tbl(keys):
        rs = [rows[k] for k in keys]
        return pa.table({
            "event_id": [r[0] for r in rs],
            "ts": pa.array([r[1] for r in rs], pa.timestamp("us")),
            "user_id": [r[2] for r in rs],
            "event_type": [r[3] for r in rs],
            "value": [1.0] * len(rs),
            "props": ["{}"] * len(rs),
        }, schema=_EVENT_SCHEMA)

    pq.write_table(tbl(list(rows)), d / "events.parquet")
    for src, batches in files.items():
        indir = d / f"in_{src}"
        indir.mkdir()
        for i, keys in enumerate(batches):
            f = indir / f"{src}_{i}.parquet"
            pq.write_table(tbl(keys), f)
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    sf_dir = str(d)

    def src(name):
        raw = (spark.readStream.schema(events_read_schema(sf_dir))
                    .option("maxFilesPerTrigger", 1)
                    .parquet(str(d / f"in_{name}")))
        return decode_events_ts(raw, sf_dir)

    joined = _funnel_join(src("click"), src("purchase"), how="left_outer")
    out = _drain(spark, "funnel_outer_pin", joined, "append")
    got = {(r["click_id"], r["purchase_id"]) for r in out.collect()}
    assert got == {(1, 10), (2, 12), (3, 13), (5, None)}
