"""Golden-file snapshots (SURVEY.md §5.3) for deterministic rows-only
operators (no SQL oracle). Snapshots live in tests/golden/ at sf0.001;
delete a file and re-run to regenerate after an intentional change.

The driver regenerates /root/testdata with a fresh seed each round, so every
snapshot is keyed to a fingerprint of the input parquet bytes (first line).
A fingerprint mismatch means the data changed — the stale snapshot is
rewritten and the test skips; only a same-data divergence (a real code
regression) fails."""
import glob
import hashlib
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


def _data_fingerprint() -> str:
    h = hashlib.md5()
    for p in sorted(glob.glob(os.path.join(SF_SMOKE, "*.parquet"))):
        h.update(os.path.basename(p).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _snapshot(df, fingerprint: str) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        ",".join("NULL" if v is None else str(v) for v in
                 (row[c] for c in cols))
        for row in df.collect()
    )
    return "\n".join([f"#data:{fingerprint}", ",".join(cols)] + rows) + "\n"


@pytest.mark.parametrize("key", GOLDEN_KEYS)
def test_golden(spark, key):
    fp = _data_fingerprint()
    snap = _snapshot(REGISTRY[key].fn(spark, SF_SMOKE), fp)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{key}.csv")
    if os.path.exists(path):
        with open(path) as f:
            expect = f.read()
        if expect.startswith(f"#data:{fp}\n"):
            assert snap == expect, \
                f"[{key}] output diverged from golden snapshot"
            return
        reason = "input data regenerated (fingerprint changed)"
    else:
        reason = "golden file created"
    with open(path, "w") as f:
        f.write(snap)
    pytest.skip(f"{reason}: {path}")
