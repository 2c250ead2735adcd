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


# ---------------------------------------------------------------------------
# Dtype-kind compatibility (driver-faithful).
#
# The driver canonicalizes BOTH result frames through pandas before hashing,
# so value-identical results can still hash-mismatch when the engines disagree
# on a column's physical type: DuckDB HUGEINT (count_if, int-sum, bit-shift
# aggregates) widens to float64 in pandas while Spark emits int64 — `742.0`
# vs `742` hashes differently. fetchall() hides this (HUGEINT -> python int),
# which is exactly how round 1 shipped 5 latent hash-fails. We therefore lint
# the oracle's DECLARED output types via `DESCRIBE (<sql>)` (the Python DBAPI
# description only says 'NUMBER') against the Spark schema, per op.
# ---------------------------------------------------------------------------

_SPARK_KIND = {
    "byte": "int", "short": "int", "integer": "int", "long": "int",
    "float": "float", "double": "float",
    "boolean": "bool", "string": "str", "binary": "bytes",
    "date": "time", "timestamp": "time", "timestamp_ntz": "time",
}


def spark_kind(dt) -> str:
    name = dt.typeName()
    if name in _SPARK_KIND:
        return _SPARK_KIND[name]
    if name == "decimal":
        return "decimal"
    if name in ("array", "map", "struct"):
        return "nested"
    return name


def duck_kind(type_str: str) -> str:
    t = type_str.upper()
    if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "nested"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t == "BLOB":
        return "bytes"
    if t.startswith(("TIMESTAMP", "DATE")):
        return "time"
    return t.lower()


def oracle_output_types(con, sql: str) -> list[tuple[str, str]]:
    """(column_name, duckdb_type) for an oracle query, without running it."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return [(r[0], r[1]) for r in rows]


def assert_dtype_compat(sdf, con, sql: str, key: str = "?"):
    """Fail when the two engines would land on pandas-incompatible dtypes
    (the driver's hash compares canonicalized pandas frames, so int64 vs
    float64 — or an array column that crashes sort_values — is a driver
    FAIL even with identical values)."""
    s_kinds = {f.name: spark_kind(f.dataType) for f in sdf.schema.fields}
    d_kinds = {name: duck_kind(t) for name, t in oracle_output_types(con, sql)}
    problems = []
    for col in sorted(set(s_kinds) | set(d_kinds)):
        sk, dk = s_kinds.get(col), d_kinds.get(col)
        if dk == "hugeint":
            problems.append(
                f"{col}: oracle returns HUGEINT (pandas->float64 vs Spark "
                f"{sk}) — CAST(... AS BIGINT) in the oracle SQL")
        elif "nested" in (sk, dk):
            problems.append(
                f"{col}: nested/array output (spark={sk}, duck={dk}) — "
                f"crashes the driver's pandas canonicalizer; render as string")
        elif sk is not None and dk is not None and sk != dk:
            problems.append(f"{col}: dtype-kind mismatch spark={sk} duck={dk}")
    assert not problems, f"[{key}] driver-canonicalizer hazards:\n  " + \
        "\n  ".join(problems)


def assert_parity(spark, fn, sql: str, sf_dir: str, key: str = "?"):
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)

    con = duck_con(sf_dir)
    assert_dtype_compat(sdf, con, sql, key=key)
    s_rows = [tuple(r) for r in sdf.collect()]
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
