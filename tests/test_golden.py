"""Golden-file snapshots (SURVEY.md §5.3) for deterministic rows-only
operators (no SQL oracle). Snapshots live in tests/golden/ at sf0.001;
delete a file and re-run to regenerate after an intentional change."""
import os

import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_SMOKE

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

#: rows-only ops that are value-deterministic (excludes limit_n - which is
#: nondeterministic by contract - and the streaming ops covered by
#: test_twins.py micro-batch assertions).
GOLDEN_KEYS = ["ts_ewma", "ts_interpolate_linear", "agg_approx_distinct",
               "ts_downsample_lttb", "ts_cusum_changepoint",
               "agg_approx_percentile"]


def _snapshot(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        ",".join("NULL" if v is None else str(v) for v in
                 (row[c] for c in cols))
        for row in df.collect()
    )
    return "\n".join([",".join(cols)] + rows) + "\n"


@pytest.mark.parametrize("key", GOLDEN_KEYS)
def test_golden(spark, key):
    snap = _snapshot(REGISTRY[key].fn(spark, SF_SMOKE))
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{key}.csv")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(snap)
        pytest.skip(f"golden file created: {path}")
    with open(path) as f:
        expect = f.read()
    assert snap == expect, f"[{key}] output diverged from golden snapshot"
