"""Skew drill (SURVEY.md §4, VERDICT r1 item 6): the flagship single-shuffle
paths — sessionize and the union+window as-of join — must stay correct,
keep their plan shape, and stay time-bounded when one user is a hot key.

We clone the busiest sf0.01 user until it owns ~30% of all events (fresh
unique event_ids, original timestamps), write the skewed table next to
copies of the other tables, and run the SAME registry ops + DuckDB oracles
against that directory. This pins the 100 TB hazard the plan tests alone
can't see: a hot hash-partition key.
"""
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import SF_T2
from .parity import assert_parity
from .test_plans import _plan

HOT_SHARE = 0.30
#: generous absolute ceiling — unskewed sf0.01 runs take ~1-3 s; a skew
#: blow-up (range explosion, single straggler partition at 100x) would
#: overshoot this by an order of magnitude, while CI jitter will not.
TIME_CAP_S = 120.0


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewed_sf")
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
    # replicate k times so hot/(n + k*h) >= HOT_SHARE
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
    assert skewed.num_rows * HOT_SHARE <= (k + 1) * h
    pq.write_table(skewed, d / "events.parquet")
    return str(d)


def test_skew_fixture_is_actually_skewed(skew_dir):
    ev = pq.read_table(f"{skew_dir}/events.parquet")
    counts = ev.group_by("user_id").aggregate([("user_id", "count")])
    top = pc.max(counts["user_id_count"]).as_py()
    assert top / ev.num_rows >= HOT_SHARE * 0.95
    # event_ids must stay unique (sessionize tiebreak + asof determinism)
    assert pc.count_distinct(ev["event_id"]).as_py() == ev.num_rows


def test_session_has_aqe_skew_handling(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_sessionize_correct_and_single_shuffle_under_skew(spark, skew_dir):
    op = REGISTRY["ts_sessionize"]
    # build the plan ON the skewed dir (ADVICE r2: a string .replace only
    # edits the rendered text, never re-plans against the skewed data)
    df = op.fn(spark, skew_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"))
    import re
    n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
    assert n_ex == 1, f"sessionize lost its single-shuffle shape: {n_ex}"
    t0 = time.monotonic()
    assert_parity(spark, op.fn, op.oracle, skew_dir, key="ts_sessionize@skew")
    assert time.monotonic() - t0 < TIME_CAP_S


def test_asof_backward_correct_and_no_explosion_under_skew(spark, skew_dir):
    op = REGISTRY["join_asof_backward"]
    df = op.fn(spark, skew_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"))
    assert "NestedLoop" not in plan, "asof degenerated to a range explosion"
    t0 = time.monotonic()
    assert_parity(spark, op.fn, op.oracle, skew_dir,
                  key="join_asof_backward@skew")
    assert time.monotonic() - t0 < TIME_CAP_S
