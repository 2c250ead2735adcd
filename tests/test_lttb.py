"""ts_downsample_lttb value-parity on a fixture that actually downsamples.

The driver corpus never exercises LTTB's interesting branch: at sf0.01 the
busiest user has 86 events <= the 100-point budget, so every series passes
through whole (and the registry oracle check reduces to identity). This
fixture clones each user's events 4x with disjoint time shifts, pushing
most users past 100 points — the bucket/centroid/argmax recursion then
runs for real, and the DuckDB recursive-CTE oracle must reproduce the
pandas picks bit-for-bit.
"""
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.operators import timeseries
from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import SF_T2
from .parity import assert_parity

#: clones per original row (total 5x) — lifts ~86-event users to ~430.
_CLONES = 4


@pytest.fixture(scope="module")
def lttb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lttb_sf")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    ev = pq.read_table(f"{SF_T2}/events.parquet")
    n = ev.num_rows
    next_id = pc.max(ev["event_id"]).as_py() + 1
    parts = [ev]
    for k in range(1, _CLONES + 1):
        # shift by k * (1h + 1s): distinct instants, same value shape
        shifted = ev.set_column(
            ev.schema.get_field_index("ts"), "ts",
            pc.add(ev["ts"], pa.scalar(k * 3_601_000_000, type=pa.duration("us"))))
        shifted = shifted.set_column(
            shifted.schema.get_field_index("event_id"), "event_id",
            pc.add(pa.array(range(n), type=pa.int64()),
                   next_id + (k - 1) * n))
        parts.append(shifted)
    pq.write_table(pa.concat_tables(parts), d / "events.parquet")
    return str(d)


def test_lttb_parity_on_downsampling_fixture(spark, lttb_dir):
    o = REGISTRY["ts_downsample_lttb"]
    assert_parity(spark, o.fn, o.oracle, lttb_dir, key="ts_downsample_lttb")


def test_lttb_budget_and_endpoints(spark, lttb_dir):
    """Every series over the budget is cut to exactly 100 points and
    keeps its first and last observation (the LTTB invariants)."""
    out = timeseries.ts_downsample_lttb(spark, lttb_dir)
    kept = {r["user_id"]: r["cnt"]
            for r in out.groupBy("user_id").count()
                        .withColumnRenamed("count", "cnt").collect()}
    ev = pq.read_table(f"{lttb_dir}/events.parquet")
    counts = ev.group_by("user_id").aggregate([("event_id", "count")])
    orig = {u.as_py(): c.as_py()
            for u, c in zip(counts["user_id"], counts["event_id_count"])}
    over = [u for u, c in orig.items() if c > 100]
    assert over, "fixture failed to produce any over-budget series"
    for u in over:
        assert kept[u] == 100, f"user {u}: kept {kept[u]} != 100"
    for u, c in orig.items():
        if c <= 100:
            assert kept[u] == c, f"small series truncated: {u}"
