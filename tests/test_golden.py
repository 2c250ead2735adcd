"""Golden-file snapshots (SURVEY.md §5.3) for deterministic rows-only
operators (no SQL oracle). Snapshots live in tests/golden/ at sf0.001.

The driver regenerates /root/testdata with a fresh seed each round, so every
snapshot is keyed to a fingerprint of the input parquet bytes (first line).
A fingerprint mismatch means the data changed — but regeneration is NOT
automatic (round-2 post-mortem: auto-heal silently pinned a corrupted decode
as "golden"). Rewriting now requires an explicit ``GOLDEN_REGEN=1`` env
opt-in, and every candidate snapshot must pass cheap invariants first
(non-empty; no pre-2000 timestamps — the corpus is generated 1992+/2024+ and
a 1970 value means a decode bug, not new data)."""
import glob
import hashlib
import os
import re

import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_SMOKE

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

#: rows-only ops that are value-deterministic (excludes limit_n - which is
#: nondeterministic by contract - and the streaming ops covered by
#: test_twins.py micro-batch assertions). Round 4 moved ts_ewma,
#: ts_interpolate_linear, ts_cusum_changepoint and ts_downsample_lttb out
#: of this list: they gained full DuckDB value oracles (recursive-CTE /
#: shared-twin SQL; LTTB additionally pinned on a real-downsampling
#: fixture in test_lttb.py).
GOLDEN_KEYS = ["agg_approx_distinct", "agg_approx_percentile"]

#: ISO timestamp with a year before 1992 (earliest legitimate corpus date is
#: TPC-H's 1992; events are 2024+). Matching one in a snapshot = decode bug.
_BAD_TS = re.compile(r"\b(19[0-8][0-9]|199[01])-\d{2}-\d{2}[ T]\d{2}:")


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


def _check_invariants(key: str, snap: str) -> None:
    lines = snap.splitlines()
    assert len(lines) > 2, f"[{key}] candidate snapshot is empty"
    bad = _BAD_TS.search(snap)
    assert bad is None, (
        f"[{key}] candidate snapshot contains a pre-1992 timestamp "
        f"({bad.group(0)}…) — this is a decode bug, refusing to pin it")


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
        reason = "no golden file"
    # Never silently pin current behavior: new output must look sane AND the
    # operator must opt in via GOLDEN_REGEN=1 (round-2 post-mortem).
    _check_invariants(key, snap)
    if os.environ.get("GOLDEN_REGEN") != "1":
        pytest.fail(
            f"[{key}] {reason}; candidate output passes invariants but "
            f"regeneration requires GOLDEN_REGEN=1 (refusing to auto-pin)")
    with open(path, "w") as f:
        f.write(snap)
    pytest.skip(f"{reason}: regenerated {path}")
