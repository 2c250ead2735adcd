"""Hot-key-safe two-phase sessionize (VERDICT r3 item #2).

``ts_sessionize`` windows on user_id alone; a window partition cannot be
AQE-split, so a mega-user is a single-task OOM hazard at 100x. The
``ts_sessionize_bucketed`` twin bounds the window partition to (user, day)
and merges across day boundaries over local-session rows. These tests pin:

- exact row-set equality with ``ts_sessionize`` on the stock corpus AND on
  a corpus where ONE user owns ~50% of all events;
- the two-shuffle plan shape (phase-1 exchange keyed on (user_id, bucket) —
  the hot-key split — and the phase-2 exchange on user_id over sessions);
- cross-engine parity with its own DuckDB oracle on the skewed corpus;
- a wall-clock bound in the spirit of tests/test_skew.py.
"""
import re
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import SF_T2
from .parity import assert_parity, canon_rows

HOT_SHARE = 0.50
TIME_CAP_S = 120.0


@pytest.fixture(scope="module")
def hot50_dir(tmp_path_factory):
    """The busiest sf0.01 user cloned (fresh event_ids, same timestamps)
    until it owns ~50% of all events."""
    d = tmp_path_factory.mktemp("hot50_sf")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    ev = pq.read_table(f"{SF_T2}/events.parquet")
    counts = ev.group_by("user_id").aggregate([("user_id", "count")])
    hot_idx = pc.index(counts["user_id_count"],
                       pc.max(counts["user_id_count"])).as_py()
    hot_user = counts["user_id"][hot_idx].as_py()
    hot = ev.filter(pc.equal(ev["user_id"], hot_user))
    n, h = ev.num_rows, hot.num_rows
    k = max(1, -(-int(HOT_SHARE * n - h) // int((1 - HOT_SHARE) * h)))
    next_id = pc.max(ev["event_id"]).as_py() + 1
    clones = []
    for i in range(k):
        c = hot.set_column(
            hot.schema.get_field_index("event_id"), "event_id",
            pc.add(pa.array(range(hot.num_rows), type=pa.int64()),
                   next_id + i * h))
        clones.append(c)
    skewed = pa.concat_tables([ev, *clones])
    pq.write_table(skewed, d / "events.parquet")
    return str(d)


def _rows(df):
    return canon_rows(list(df.columns), [tuple(r) for r in df.collect()])


def _assert_equal_to_plain(spark, sf_dir):
    plain = REGISTRY["ts_sessionize"].fn(spark, sf_dir)
    bucketed = REGISTRY["ts_sessionize_bucketed"].fn(spark, sf_dir)
    cols_p, rows_p = _rows(plain)
    cols_b, rows_b = _rows(bucketed)
    assert cols_p == cols_b
    assert len(rows_p) == len(rows_b)
    diffs = [(a, b) for a, b in zip(rows_p, rows_b) if a != b]
    assert not diffs, f"{len(diffs)} differing rows; first: {diffs[0]}"


def test_equal_to_plain_sessionize_stock(spark):
    _assert_equal_to_plain(spark, SF_T2)


def test_equal_to_plain_sessionize_hot50(spark, hot50_dir):
    t0 = time.monotonic()
    _assert_equal_to_plain(spark, hot50_dir)
    assert time.monotonic() - t0 < TIME_CAP_S


def test_oracle_parity_under_hot50(spark, hot50_dir):
    op = REGISTRY["ts_sessionize_bucketed"]
    assert_parity(spark, op.fn, op.oracle, hot50_dir,
                  key="ts_sessionize_bucketed@hot50")


def test_two_phase_plan_shape(spark):
    df = REGISTRY["ts_sessionize_bucketed"].fn(spark, SF_T2)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"))
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) == 2, f"expected 2 shuffles, got: {exchanges}"
    # the event-level (phase 1) exchange must include the bucket key —
    # that IS the hot-key split; only the session-level exchange may key
    # on user_id alone
    assert any("bucket" in e for e in exchanges), exchanges
