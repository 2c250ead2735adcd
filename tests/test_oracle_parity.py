"""The main gate: every registered operator vs its DuckDB oracle at sf0.01
(exactly what the driver's t2 check does, but with exact value diffs).
Ops without an oracle get a rows-only execution check.
"""
import pytest

import industry_big_data_time_sequence_process_spark as eng
from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2
from .parity import assert_parity, run_rows_only

KEYS = sorted(REGISTRY)


@pytest.mark.parametrize("key", KEYS)
def test_op(spark, key):
    o = REGISTRY[key]
    if o.oracle is not None:
        assert_parity(spark, o.fn, o.oracle, SF_T2, key=key)
    else:
        n = run_rows_only(spark, o.fn, SF_T2, key=key)
        assert n > 0, f"[{key}] rows-only op returned 0 rows"
