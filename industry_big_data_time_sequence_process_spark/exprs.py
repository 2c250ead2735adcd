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


# --- r13 optimization: scaled-integer money arithmetic ---------------------
#
# The DECIMAL(18,2) cast is exact on this corpus's money doubles but SLOW:
# Spark's double->decimal cast routes through BigDecimal.valueOf (a
# Double.toString parse) per row, and decimal multiply/sum buffers beat the
# whole-stage-codegen fast path — measured 1.37 s -> 0.79 s on the Q1-shaped
# aggregate at sf0.1, with bit-identical output. The replacement keeps every
# value EXACT:
#
# - ``cents(x)`` = round(x·100) as long. For any double that is the nearest
#   double to a 2-decimal value k/100 (the corpus contract, probed in
#   FIXTURES.md and re-probed by tests/test_opt_r13.py), x·100 lands within
#   ~1e-6 of k, never near a .5 boundary, so the HALF_UP round returns
#   exactly k — the same integer DECIMAL(18,2) stores.
# - integer products of cents columns are exact longs (documented bounds:
#   price·disc·tax cents-products < 1.5e11/row on this schema).
# - ``money_sum`` splits each addend into (div 1e6, mod 1e6) and sums the
#   two LONG halves — exact to ~9e12 rows (lo: n·1e6 < 2^63) — then
#   recombines PER GROUP in DECIMAL(38,0) and divides by the scale in
#   decimal. The adjusted division result type is decimal(38,6) (Spark's
#   precision-loss rule), so exactness requires the quotient to need at
#   most 6 decimals — true exactly when scale is a power of 10 <= 1e6
#   over integer cents-products (asserted in money_sum; ADVICE r13).
#   The final cast to double is then the correctly-rounded true value —
#   the identical double the decimal formulation produced.
#   Per-row work is long div/mod (codegen); decimals touch only group rows.

#: hi/lo split base for money sums: lo-halves sum exactly up to
#: 2^63 / 1e6 ≈ 9.2e12 rows; hi-halves carry value/1e6 (tiny).
_MONEY_SPLIT = 1_000_000


def cents(col) -> Column:
    """round(x·100) as long — the exact integer DECIMAL(18,2) stores, for
    2-decimal money doubles (see module note; corpus contract probed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def money_sum(cents_expr: Column, scale: int) -> Column:
    """Exact, order-insensitive, overflow-safe sum of an integer
    cents-product column, surfaced as the value double (``/ scale``).
    Bit-identical to ``sum(CAST(... AS DECIMAL)).cast('double')`` over
    the same data (twin-pinned in tests/test_opt_r13.py).

    ADVICE r13: exactness silently depends on ``scale`` being a power
    of 10 ≤ 1e6 — Spark's precision-loss adjustment types the division
    result decimal(38,6), so a scale whose quotient needs more than 6
    decimals would round WITHOUT any error. Assert the contract so a
    future call site fails loudly instead of wrongly."""
    assert scale in (1, 10, 100, 1_000, 10_000, 100_000, 1_000_000), (
        f"money_sum requires a power-of-10 scale <= 1e6 (decimal(38,6) "
        f"division result), got {scale}")
    # trunc-div via the exact-multiple subtraction: (x - x%s) is an exact
    # multiple of s (< 2^53 per-row by the schema bounds), so the double
    # division is EXACT — no floor-of-rounded-quotient edge.
    rem = cents_expr % F.lit(_MONEY_SPLIT)
    hi = F.sum(((cents_expr - rem) / F.lit(_MONEY_SPLIT)).cast("long"))
    lo = F.sum(rem)
    d38 = "decimal(38,0)"
    return ((hi.cast(d38) * F.lit(_MONEY_SPLIT) + lo.cast(d38))
            / F.lit(scale).cast("decimal(7,0)")).cast("double")
