"""Driver-contract smoke: entry() runs on sf0.001 and returns rows."""
import importlib


def test_entry_smoke(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"user_id", "session_seq", "n_events"}


def test_contract_shape(spark):
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert qs, "queries() empty"
    assert set(os_) <= set(qs), "oracle_sql keys must be a subset of queries"
