"""The main gate: every registered operator vs its DuckDB oracle at sf0.01
(exactly what the driver's t2 check does, but with exact value diffs).
Ops without an oracle get a rows-only execution check.

The 470-op registry outgrew a single 600 s tool call in round 10, so
the file is ENV-SHARDABLE: ``PARITY_SHARDS=2 PARITY_SHARD=0`` runs the
even-indexed keys (alphabetical), ``PARITY_SHARD=1`` the odd — the two
halves together are exactly the full key set, and the default (no env)
remains the whole registry.
"""
import os

import pytest

import industry_big_data_time_sequence_process_spark as eng
from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2
from .parity import assert_parity, run_rows_only

_SHARDS = int(os.environ.get("PARITY_SHARDS", "1"))
_SHARD = int(os.environ.get("PARITY_SHARD", "0"))
KEYS = [k for i, k in enumerate(sorted(REGISTRY)) if i % _SHARDS == _SHARD]


@pytest.mark.parametrize("key", KEYS)
def test_op(spark, key):
    o = REGISTRY[key]
    if o.oracle is not None:
        assert_parity(spark, o.fn, o.oracle, SF_T2, key=key)
    else:
        n = run_rows_only(spark, o.fn, SF_T2, key=key)
        assert n > 0, f"[{key}] rows-only op returned 0 rows"
