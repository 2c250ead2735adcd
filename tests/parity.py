"""Local replica of the driver's t2 oracle check, but STRICTER:
instead of hashing, we compare canonicalized values exactly and show the
first mismatching rows. If this passes, the driver's order-insensitive
value-hash passes too.
"""
from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from industry_big_data_time_sequence_process_spark.sources.io import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_val(v):
    """Engine-neutral canonical form for one cell."""
    if v is None:
        return ("z",)  # sorts after everything
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return ("f", repr(v))
    if isinstance(v, Decimal):
        # Normalize decimals numerically (engines differ on scale padding).
        if v == v.to_integral_value():
            return ("i", int(v))
        return ("f", repr(float(v)))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon_val(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, canon_val(x)) for k, x in v.items())))
    if isinstance(v, bytearray):
        v = bytes(v)
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_val(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def assert_parity(spark, fn, sql: str, sf_dir: str, key: str = "?"):
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"[{key}] column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{key}] row count: spark={len(s_rows)} duck={len(d_rows)}"
    )
    cols, cs = canon_rows(s_cols, s_rows)
    _, cd = canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
        msg = [f"[{key}] value mismatch in {len(diffs)}/{len(cs)} rows; cols={cols}"]
        for i, a, b in diffs[:5]:
            msg.append(f"  row {i}:\n    spark={a}\n    duck ={b}")
        raise AssertionError("\n".join(msg))


def run_rows_only(spark, fn, sf_dir: str, key: str = "?") -> int:
    """Weaker check for ops without oracle SQL: runs and returns row count."""
    df = fn(spark, sf_dir)
    n = df.count()
    assert n >= 0, f"[{key}] failed to execute"
    return n
