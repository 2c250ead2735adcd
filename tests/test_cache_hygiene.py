"""Cache hygiene for iterative operators (VERDICT r1/r2 item: per-round
caches in connected-components must not accumulate).

``dedup_cluster_cc`` caches the edge list plus one labels frame per
propagation round; every round must unpersist its predecessor and the edge
cache must be dropped on exit. At 100 TB an accumulating cache is executor
OOM, not a slow-down. The only frame allowed to stay cached after the run
is the final labels frame (the caller may still be consuming it)."""
from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_SMOKE


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_cluster_cc_unpersists_intermediates(spark):
    before = _n_persistent(spark)
    REGISTRY["dedup_cluster_cc"].fn(spark, SF_SMOKE).collect()
    leaked = _n_persistent(spark) - before
    assert leaked <= 1, (
        f"dedup_cluster_cc left {leaked} frames cached (allowed: the final "
        f"labels frame only) — per-round unpersist regressed")
