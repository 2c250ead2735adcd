"""Spark-4 transformWithStateInPandas capability gate (VERDICT r5 #6).

``stream_stateful_running`` has two branches: the modern
``transformWithStateInPandas`` processor (Spark 4's stateful API) and the
legacy ``applyInPandasWithState`` fallback. The TWS branch needs the
``protobuf`` package (its Python runner speaks protobuf to the JVM), which
this container does not ship — so for five rounds the primary branch never
executed anywhere.

This gate makes that visibility loud instead of silent: when protobuf is
absent the TWS test XFAILS (reported in every run's summary, unlike a
skip buried in collection counts); the moment the environment grows
protobuf, the xfail flips to XPASS(strict) and forces the branch to be
exercised and the gate removed.
"""
import pytest

from industry_big_data_time_sequence_process_spark.operators.streaming import (
    tws_available,
)

from .conftest import SF_SMOKE


@pytest.mark.xfail(not tws_available(),
                   reason="protobuf missing: transformWithStateInPandas's "
                          "Python runner cannot start — the primary "
                          "stateful branch is UNTESTED in this container "
                          "(legacy fallback branch is what the suite "
                          "exercises)",
                   strict=True, raises=Exception)
def test_tws_primary_branch_executes(spark):
    """Run the TWS branch directly (not the auto-selecting operator, which
    would mask the gap by falling back)."""
    from industry_big_data_time_sequence_process_spark.operators.streaming \
        import _ROCKSDB_PROVIDER, _drain, _events_stream, \
        _stateful_running_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   _ROCKSDB_PROVIDER)  # TWS requires RocksDB (Spark 4)
    try:
        ev = _events_stream(spark, SF_SMOKE, "tws_gate")
        out = _drain(spark, "tws_gate", _stateful_running_tws(ev), "append")
        assert out.count() > 0
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass")
