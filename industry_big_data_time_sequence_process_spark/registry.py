"""Operator registry — the single source of truth for the engine's surface.

Every public operator registers itself here via the :func:`op` decorator.
The driver contract (``__spark_entry__.py``) is generated from this registry:

- ``queries()[key]``    -> ``callable(spark, sf_dir) -> DataFrame``
- ``oracle_sql()[key]`` -> DuckDB-runnable ANSI SQL string (omitted for
  non-SQL-expressible operators, which get the driver's rows-only check).

SURVEY.md §2 is the binding inventory; each ``@op`` key matches a §2 row.
(The reference snapshot at /root/reference is empty — see SURVEY.md §0 — so
there are no reference file citations anywhere in this repo; §2 is the
contract.)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    """One registered operator."""

    key: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None -> rows-only check
    tier: int              # 1 = minimum viable, 2 = full parity, 3 = stretch
    section: str           # SURVEY.md §2 subsection, e.g. "2.9"


REGISTRY: dict[str, Op] = {}


def op(key: str, *, oracle: Optional[str] = None, tier: int = 2,
       section: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register an operator under ``key``.

    ``oracle`` is the DuckDB SQL the driver runs side-by-side at sf=0.01.
    Column names MUST match the Spark result exactly (the compare sorts
    columns by name before hashing) — alias everything on both sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate operator key: {key}")
        REGISTRY[key] = Op(key=key, fn=fn, oracle=oracle, tier=tier,
                           section=section)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: o.fn for k, o in sorted(REGISTRY.items())}


def oracles() -> dict[str, str]:
    return {k: o.oracle for k, o in sorted(REGISTRY.items())
            if o.oracle is not None}
