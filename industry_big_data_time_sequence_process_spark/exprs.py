"""Shared expression helpers — mostly oracle-parity conventions.

The t2 gate is an order-insensitive value-hash vs DuckDB, so float results
must be *identical*, not close (SURVEY.md App. A.4). Two tools:

- :func:`dec2` / :func:`exact_sum`: the corpus's money-like doubles are
  exact 2-decimals (probed in FIXTURES.md), so summing them as
  DECIMAL(18,2) is exact and order-insensitive; casting the exact decimal
  back to double yields the *same* double on both engines — immune to
  summation-order ulp drift. Plain ``SUM(double)`` over tens of thousands
  of rows drifts ~1e-4 absolute, far above any sane ROUND().
- :func:`r6`: for genuinely-float results (avg, stddev, corr) whose
  divergence is provably below 1e-6, round to 6 decimals on both sides.
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec2(col) -> Column:
    """Exact DECIMAL(18,2) view of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def exact_sum(col) -> Column:
    """Order-insensitive, engine-exact sum of a 2-decimal double column."""
    return F.sum(dec2(col)).cast("double")


def r6(c: Column) -> Column:
    return F.round(c, 6)
