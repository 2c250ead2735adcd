"""Round-10 fourth wave semantics (SURVEY.md §2.33):

- `pipeline_timeseries_audit`: the composed row agrees with the
  STAND-ALONE operators' own counts (cross-op consistency — the whole
  point of a composition audit), plus internal sanity invariants;
- `ts_rolling_corr_pair`: window accounting is exact (joint hours minus
  the warm-up), values live in [-1, 1], and one window's correlation is
  recomputed independently in python from the DuckDB hourly means.
"""
import duckdb
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2


def test_pipeline_ts_audit_cross_op_consistency(spark):
    row = REGISTRY["pipeline_timeseries_audit"].fn(spark, SF_T2) \
        .collect()[0]
    con = duckdb.connect()
    ev = f"'{SF_T2}/events.parquet'"
    n_raw = con.sql(f"SELECT count(*) FROM {ev}").fetchone()[0]
    assert row["n_raw"] == n_raw
    # dedup stage == ts_dedup_latest's own row count
    n_dd = REGISTRY["ts_dedup_latest"].fn(spark, SF_T2).count()
    assert row["n_deduped"] == n_dd
    # hourly / daily stage counts, independently
    n_hourly = con.sql(f"""
        SELECT count(*) FROM (
            SELECT DISTINCT event_type, date_trunc('hour', ts) FROM {ev})
        """).fetchone()[0]
    # dedup keeps >= 1 row per (user, minute), so every (channel, hour)
    # with any event survives -> the hourly grid is identical
    assert row["n_hourly_points"] == n_hourly
    n_daily = con.sql(f"""
        SELECT count(*) FROM (
            SELECT DISTINCT event_type, date_trunc('day', ts) FROM {ev})
        """).fetchone()[0]
    assert row["n_daily_rows"] == n_daily
    # internal invariants
    assert row["n_deduped"] <= row["n_raw"]
    assert row["n_hourly_points"] <= row["n_deduped"]
    assert row["n_gap_hours"] >= 0
    assert row["n_warn_2sigma"] >= row["n_anomalies_3sigma"]
    assert row["n_daily_rows"] <= row["n_hourly_points"]


def test_rolling_corr_window_accounting_and_recompute(spark):
    rows = sorted(REGISTRY["ts_rolling_corr_pair"].fn(spark, SF_T2)
                  .collect(), key=lambda r: r["hour"])
    con = duckdb.connect()
    hourly = con.sql(f"""
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS m
        FROM '{SF_T2}/events.parquet'
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2 ORDER BY 2""").fetchall()
    a = {h: m for et, h, m in hourly if et == "click"}
    b = {h: m for et, h, m in hourly if et == "purchase"}
    joint = sorted(set(a) & set(b))
    assert len(rows) == len(joint) - 23
    assert all(r["rolling_corr"] is None or -1.0 <= r["rolling_corr"] <= 1.0
               for r in rows)
    # independent recompute of the LAST window from the quantized means
    import math
    w = joint[-24:]
    xs = [math.floor(a[h] * 1e9) for h in w]
    ys = [math.floor(b[h] * 1e9) for h in w]
    n = 24.0
    sx, sy = float(sum(xs)), float(sum(ys))
    sxx = float(sum(x * x for x in xs))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    syy = float(sum(y * y for y in ys))
    varp = (n * sxx - sx * sx) * (n * syy - sy * sy)
    expect = round((n * sxy - sx * sy) / math.sqrt(varp), 6)
    got = rows[-1]["rolling_corr"]
    assert got == pytest.approx(expect, abs=2e-6), (got, expect)
