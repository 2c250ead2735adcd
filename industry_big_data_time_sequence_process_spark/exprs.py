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


def safe_corr(x, y) -> Column:
    """Pearson correlation that degrades to NULL (not an ANSI
    DIVIDE_BY_ZERO crash) when either series has zero variance.

    Spark's built-in ``corr`` divides by sqrt(varX * varY) inside the
    aggregate's final evaluation, so a constant series crashes the whole
    job under ANSI mode and no outer CASE can guard it. This form keeps
    the division OUTSIDE the aggregates — covar_samp and stddev_samp are
    crash-free — and guards it with try_divide. Mathematically identical;
    agrees with DuckDB's fused ``corr`` to well below the r6 rounding
    everywhere the corpus exercises it (pinned by oracle parity)."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    # Pairwise deletion, matching corr: each stddev must run over rows
    # where BOTH columns are present (lag columns carry leading NULLs),
    # else the variances describe a different row set than the covariance.
    px = F.when(cy.isNotNull(), cx)
    py = F.when(cx.isNotNull(), cy)
    return F.try_divide(F.covar_samp(cx, cy),
                        F.stddev_samp(px) * F.stddev_samp(py))
