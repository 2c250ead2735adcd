"""The data-drift tripwire, exercised (VERDICT r2 'what's missing' #2).

Round 2's silent failure mode: the driver re-typed events.ts between
rounds and the decode produced 1970 timestamps for a full round with zero
test signal. The loader now (a) probes the footer and branches, and
(b) asserts decoded years are plausible. This test proves the tripwire
FIRES: a corpus whose footer type lies about the unit (plain int64
carrying epoch-µs values — indistinguishable from ns by type alone) must
raise loudly in ``load()``, not return 1970 rows."""
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.sources.io import (
    events_ts_kind, load,
)
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def lying_unit_dir(tmp_path_factory):
    """events.ts as PLAIN int64 holding epoch-MICROsecond values: the
    footer can only say 'int64', the ns-decode divides by 1000, and every
    row lands in 1970 — exactly the round-2 corruption, reconstructed."""
    d = tmp_path_factory.mktemp("lying_unit_sf")
    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    t0_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "ts": pa.array([t0_us, t0_us + 1_000_000, t0_us + 2_000_000],
                       type=pa.int64()),
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "event_type": pa.array(["click"] * 3, type=pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
        "props": pa.array(['{"k": 1}'] * 3, type=pa.string()),
    })
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def test_footer_probe_classifies_current_corpus(spark):
    assert events_ts_kind(SF_SMOKE) == "timestamp"


def test_lying_unit_corpus_fails_loudly(spark, lying_unit_dir):
    assert events_ts_kind(lying_unit_dir) == "int64_ns"
    with pytest.raises(AssertionError, match="decode branch is wrong"):
        load(spark, lying_unit_dir, "events").collect()


def test_sane_corpus_passes_probe(spark):
    # the probe must not reject the real corpus (and runs at most once
    # per directory, so repeated loads stay cheap)
    assert load(spark, SF_SMOKE, "events").limit(1).count() == 1
