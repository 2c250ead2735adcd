"""`pytest -m smoke` — the fast edit-loop subset (VERDICT r5 #8).

One exact-value oracle check per operator family plus the driver's entry
smoke, all at sf0.001, sharing the session fixture: the whole set targets
< 60 s wall (vs ~15 min for the full suite). This is a convenience layer
for the edit loop ONLY — the full suite (notably tests/test_oracle_parity.py
over all 362 oracled keys) remains the commit gate.
"""
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_SMOKE
from .parity import assert_parity

#: one representative per family — cheap, structurally diverse keys
SMOKE_KEYS = [
    "scan_parquet",            # 2.1 sources
    "filter_compound",         # 2.2 predicates
    "join_broadcast",          # 2.3 joins
    "agg_groupby_multi",       # 2.4 aggregations (the flagship query)
    "win_moving_avg_rows",     # 2.5 windows
    "topk_per_group",          # 2.6 ranking
    "set_except",              # 2.7 set ops
    "json_get",                # 2.8 scalar functions
    "ts_sessionize",           # 2.9 time series
    "dedup_exact_text",        # 2.11 dedup
    "sim_cosine_topk",         # 2.11 similarity
    "udaf_grouped_slope",      # 2.12 UDF surface
    "feat_target_encode",      # 2.15 features
    "sample_split_temporal",   # 2.15 sampling
    "mm_binary_meta",          # multimodal
]


@pytest.mark.smoke
@pytest.mark.parametrize("key", SMOKE_KEYS)
def test_smoke_family_representative(spark, key):
    op = REGISTRY[key]
    assert_parity(spark, op.fn, op.oracle, SF_SMOKE, key=f"{key}@smoke")


@pytest.mark.smoke
def test_smoke_entry(spark):
    """The driver's entry() smoke: runs and returns rows."""
    import __spark_entry__ as m
    assert len(m.entry(spark).collect()) > 0


@pytest.mark.smoke
def test_smoke_one_stream(spark):
    """One streaming drain (the cheapest value-oracled stream op)."""
    op = REGISTRY["source_stream_file"]
    assert_parity(spark, op.fn, op.oracle, SF_SMOKE,
                  key="source_stream_file@smoke")
