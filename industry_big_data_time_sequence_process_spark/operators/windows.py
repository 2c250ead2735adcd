"""Window functions (SURVEY.md §2.5) — ranked, offset, and framed
aggregate windows with explicit frames.

Every window here has a deterministic total ORDER BY within its partition
(event_id / custkey tiebreaks): ranked functions are only hash-checkable if
the order is a function of the data (SURVEY.md App. A.3).

Scale: one shuffle on the partition key per window family; consecutive
windows over the same (partitionBy, orderBy) reuse the sort.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..exprs import dec2, r6
from ..registry import REGISTRY, op
from ..sources.io import load


def _w_user():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@op("win_row_number", oracle="""
SELECT event_id, event_type, value,
       row_number() OVER (PARTITION BY event_type
                          ORDER BY value DESC, event_id) AS rn
FROM events
""", tier=1, section="2.5")
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rank per partition (unique tiebreak -> deterministic)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return ev.select("event_id", "event_type", "value",
                     F.row_number().over(w).alias("rn"))


@op("win_row_number_scalable",
    oracle=REGISTRY["win_row_number"].oracle, tier=3, section="2.5")
def win_row_number_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``win_row_number`` (round 5): the per-type
    DESC rank through ``api.bucketed_global_rank`` with the
    ``-floor(value)`` descending bucket — only single (type, unit-value)
    cells are sorted instead of 20%-of-corpus partitions. Exact twin,
    verbatim oracle."""
    from ..api import bucketed_global_rank

    ev = load(spark, sf_dir, "events")
    return bucketed_global_rank(
        ev.select("event_id", "event_type", "value"),
        (-F.floor("value")).cast("long"),
        [F.col("value").desc(), F.col("event_id")],
        rank_name="rn", group_cols=["event_type"]) \
        .select("event_id", "event_type", "value",
                F.col("rn").cast("int").alias("rn"))


@op("win_rank_dense", oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
""", tier=1, section="2.5")
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank: tie semantics are part of the function's contract,
    so no tiebreak needed — ties get equal ranks on both engines."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select("c_custkey", "c_nationkey", "c_acctbal",
                    F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"))


@op("win_rank_dense_scalable",
    oracle=REGISTRY["win_rank_dense"].oracle, tier=3, section="2.5")
def win_rank_dense_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``win_rank_dense`` (round 5): rank and
    dense_rank are functions of the TIE GROUP, so the facts reduce to
    the per-(nation, acctbal) count table (an aggregate); dense_rank is
    the grouped two-phase row_number over those distinct-value groups,
    rank is the exclusive cumulative count + 1 (grouped two-phase
    running sum), and the facts equi-join the result back. Exact twin,
    verbatim oracle."""
    from ..api import bucketed_global_rank, bucketed_running_sum

    c = load(spark, sf_dir, "customer")
    vc = c.groupBy("c_nationkey", "c_acctbal").agg(F.count("*").alias("t"))
    b = (-F.ceil("c_acctbal")).cast("long")
    g = bucketed_global_rank(
        vc, b, [F.col("c_acctbal").desc()], rank_name="drnk",
        group_cols=["c_nationkey"])
    gc = bucketed_running_sum(
        g, b, [F.col("c_acctbal").desc()], F.col("t"),
        out_name="cum", group_cols=["c_nationkey"])
    stats = gc.select("c_nationkey", "c_acctbal",
                      (F.col("cum") - F.col("t") + 1).alias("rnk"),
                      "drnk")
    return (c.join(stats, ["c_nationkey", "c_acctbal"])
             .select("c_custkey", "c_nationkey", "c_acctbal",
                     F.col("rnk").cast("int").alias("rnk"),
                     F.col("drnk").cast("int").alias("drnk")))


@op("win_ntile", oracle="""
SELECT event_id, event_type, value,
       ntile(4) OVER (PARTITION BY event_type
                      ORDER BY value, event_id) AS quartile
FROM events
""", tier=2, section="2.5")
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing of event values per type. SCALE note: the
    partition key is ~5-valued, so each partition is a constant fraction
    of the corpus — SCALE.md's low-cardinality hazard class;
    ``win_ntile_scalable`` is the bounded-partition twin."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select("event_id", "event_type", "value",
                     F.ntile(4).over(w).alias("quartile"))


@op("win_ntile_scalable",
    oracle=REGISTRY["win_ntile"].oracle, tier=3, section="2.5")
def win_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exemplar fix for SCALE.md's low-cardinality window-key hazard
    class (round 5): ``win_ntile`` partitions by ~5 event types, so each
    partition is ~20% of the corpus — at 100 TB one partition is 20 TB.
    This twin runs the SAME per-type quartiles through
    ``api.bucketed_ntile`` with ``group_cols=["event_type"]``: counts
    aggregate per (type, unit-value bucket), offsets merge over the tiny
    per-type bucket table, and the only sorted partitions are single
    (type, bucket) cells. VALUE-IDENTICAL — reuses win_ntile's oracle
    verbatim (exact ntile arithmetic from per-group rank and total).
    The same one-line rewrite applies to the whole hazard family listed
    in SCALE.md."""
    from ..api import bucketed_ntile

    ev = load(spark, sf_dir, "events")
    out = bucketed_ntile(
        ev.select("event_id", "event_type", "value"),
        F.floor("value").cast("long"),
        [F.col("value"), F.col("event_id")], 4,
        tile_name="quartile", group_cols=["event_type"])
    return out.select("event_id", "event_type", "value", "quartile")


@op("win_lag_lead", oracle="""
SELECT user_id, event_id, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       lag(value, 2, -1.0) OVER w AS prev2_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""", tier=1, section="2.5")
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset access to neighboring rows (time-series core), including an
    explicit default for out-of-partition offsets."""
    ev = load(spark, sf_dir, "events")
    w = _w_user()
    return ev.select(
        "user_id", "event_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@op("win_running_sum", oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value
FROM events
""", tier=1, section="2.5")
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user sum; decimal-exact so prefix sums are
    engine-identical at every row."""
    ev = load(spark, sf_dir, "events")
    w = _w_user().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id", "event_id",
        F.sum(dec2("value")).over(w).cast("double").alias("running_value"),
    )


@op("win_moving_avg_rows", oracle="""
SELECT user_id, event_id,
       round(avg(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS ma10
FROM events
""", tier=1, section="2.5")
def win_moving_avg_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-row moving average — classic sensor smoothing."""
    ev = load(spark, sf_dir, "events")
    w = _w_user().rowsBetween(-9, Window.currentRow)
    return ev.select("user_id", "event_id",
                     r6(F.avg("value").over(w)).alias("ma10"))


@op("win_moving_agg_range_time", oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
           (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS sum_1h,
       count(*) OVER
           (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS n_1h
FROM events
""", tier=2, section="2.5")
def win_moving_agg_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based sliding frame: trailing 1h sum/count per user. Spark's
    rangeBetween needs a numeric order key -> order by unix_micros with a
    µs-scaled frame; DuckDB uses RANGE INTERVAL natively. Same bounds,
    both inclusive."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts"))) \
              .rangeBetween(-3_600_000_000, 0)
    return ev.select(
        "user_id", "event_id",
        F.sum(dec2("value")).over(w).cast("double").alias("sum_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


@op("win_first_last", oracle="""
SELECT user_id, event_id,
       first_value(value) OVER w AS first_in_day,
       last_value(masked IGNORE NULLS) OVER w AS last_nonerror_so_far
FROM (SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS masked
      FROM events)
WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""", tier=2, section="2.5")
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over a frame, incl. IGNORE NULLS semantics."""
    ev = load(spark, sf_dir, "events").withColumn(
        "masked",
        F.when(F.col("event_type") == "error", None).otherwise(F.col("value")),
    )
    w = Window.partitionBy("user_id", F.date_trunc("day", "ts")) \
              .orderBy("ts", "event_id") \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id", "event_id",
        F.first("value").over(w).alias("first_in_day"),
        F.last("masked", ignorenulls=True).over(w).alias("last_nonerror_so_far"),
    )


@op("win_cume_pct", oracle="""
SELECT event_id, event_type, value,
       round(cume_dist() OVER w, 6) AS cd,
       round(percent_rank() OVER w, 6) AS pr
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value)
""", tier=3, section="2.5")
def win_cume_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution + percent rank per event type."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id", "event_type", "value",
        r6(F.cume_dist().over(w)).alias("cd"),
        r6(F.percent_rank().over(w)).alias("pr"),
    )


@op("win_cume_pct_scalable",
    oracle=REGISTRY["win_cume_pct"].oracle, tier=3, section="2.5")
def win_cume_pct_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``win_cume_pct`` (round 5): both statistics
    are functions of the TIE GROUP, so the facts first reduce to the
    per-(type, value) count table (an aggregate — bounded by the value
    grid, not the corpus); a grouped two-phase running sum turns counts
    into the inclusive cumulative count, from which
    ``cume_dist = cum/n`` and ``percent_rank = (min_rank-1)/(n-1)``
    (min_rank = cum - t + 1) follow exactly; the fact table just
    broadcast/equi-joins the tiny result back on (type, value).
    Single-row partitions define percent_rank = 0 (both engines).
    Exact twin, verbatim oracle."""
    from ..api import bucketed_running_sum

    ev = load(spark, sf_dir, "events")
    vc = ev.groupBy("event_type", "value").agg(F.count("*").alias("t"))
    cum = bucketed_running_sum(
        vc, F.floor("value").cast("long"), [F.col("value")], F.col("t"),
        out_name="cum", group_cols=["event_type"])
    n_tbl = vc.groupBy("event_type").agg(F.sum("t").alias("n"))
    stats = (cum.join(F.broadcast(n_tbl), "event_type")
                .select("event_type", "value",
                        (F.col("cum") / F.col("n")).alias("cd_raw"),
                        F.when(F.col("n") == 1, F.lit(0.0))
                         .otherwise((F.col("cum") - F.col("t"))
                                    / (F.col("n") - 1)).alias("pr_raw")))
    return (ev.join(F.broadcast(stats), ["event_type", "value"])
              .select("event_id", "event_type", "value",
                      r6(F.col("cd_raw")).alias("cd"),
                      r6(F.col("pr_raw")).alias("pr")))


@op("win_moving_median", oracle="""
SELECT event_id, user_id, value,
       round(median(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 24 PRECEDING AND CURRENT ROW), 6) AS med25
FROM events
""", tier=3, section="2.5")
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 25-row moving MEDIAN per user — the robust smoother that
    survives the spikes a moving average chases. Spark has no frame-capable
    ``median``, but exact ``percentile(…, 0.5)`` IS frame-capable; both
    engines interpolate the even-count midpoint identically ((a+b)/2 on
    identical doubles). Shares the user_id window sort with every other
    per-user frame op."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(-24, Window.currentRow))
    return ev.select(
        "event_id", "user_id", "value",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med25"),
    )


@op("win_nth_value", oracle="""
SELECT event_id, user_id, value,
       nth_value(value, 2) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_value,
       nth_value(event_id, 3) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_event
FROM events
""", tier=3, section="2.5")
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a growing frame: each row sees its user's 2nd value
    and 3rd event id so far (NULL until the frame holds that many rows) —
    the 'first purchase vs second purchase' comparison shape."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id", "user_id", "value",
        F.nth_value("value", 2).over(w).alias("second_value"),
        F.nth_value("event_id", 3).over(w).alias("third_event"),
    )


@op("win_range_numeric", oracle="""
SELECT event_id, event_type, value,
       count(*) OVER w AS n_similar,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
           AS sum_similar
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value
             RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING)
""", tier=3, section="2.5")
def win_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based range frame (not time): for each event, stats over all
    same-type events within ±10 value units — the peer-group comparison
    ('how does this reading compare to similar-magnitude readings').
    The frame is defined by the ORDER BY value distance, so duplicate
    values share identical frames: deterministic without a tiebreak."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type").orderBy("value")
               .rangeBetween(-10, 10))
    return ev.select(
        "event_id", "event_type", "value",
        F.count("*").over(w).alias("n_similar"),
        # decimal-exact sum (not avg): frame avg is summation-order
        # sensitive AND its round(…,6) can land on a .5 boundary where
        # engines' tie rules differ; the exact sum has neither problem
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
         .cast("double").alias("sum_similar"),
    )


@op("win_range_numeric_scalable",
    oracle=REGISTRY["win_range_numeric"].oracle, tier=3, section="2.5")
def win_range_numeric_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``win_range_numeric`` (round 5): the ±10-unit
    value frame depends only on the VALUE, so the facts reduce to the
    per-(type, value) count/sum table (an aggregate, bounded by the
    value grid); each value group then sums its neighbors via a BANDED
    self-join — bucket width 20 ≥ 2x the radius guarantees every
    neighbor lives in the adjacent bucket, so the join is an equi-join
    on (type, bucket±1) over the tiny group table, never a range scan
    of facts — and the fact table equi-joins the result back. Decimal
    sums of decimal group sums keep the frame total exact. Exact twin,
    verbatim oracle."""
    ev = load(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,2)")
    vc = (ev.groupBy("event_type", "value")
            .agg(F.count("*").alias("t"), F.sum(vdec).alias("s"))
            .withColumn("b", F.floor(F.col("value") / 20).cast("long")))
    probe = vc.select(
        "event_type", F.col("value").alias("v2"),
        F.col("t").alias("t2"), F.col("s").alias("s2"),
        F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1))
         .alias("b"))
    # the frame bound is computed as (value ± 10) FIRST, then compared —
    # abs(v2 - value) <= 10 differs by an ulp at e.g. 12.82 vs 2.82
    # (12.82 - 10 = 2.8200000000000003 > 2.82) and flips boundary rows
    frame = (vc.join(probe, ["event_type", "b"])
               .filter((F.col("v2") >= F.col("value") - 10)
                       & (F.col("v2") <= F.col("value") + 10))
               .groupBy("event_type", "value")
               .agg(F.sum("t2").alias("n_similar"),
                    F.sum("s2").alias("sum_dec")))
    return (ev.join(F.broadcast(frame), ["event_type", "value"])
              .select("event_id", "event_type", "value",
                      "n_similar",
                      F.col("sum_dec").cast("double")
                       .alias("sum_similar")))


@op("win_pct_of_total", oracle="""
SELECT event_id, user_id, event_type, value,
       round(value / CAST(SUM(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id) AS DOUBLE), 6) AS pct_of_user,
       round(value / CAST(SUM(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY event_type) AS DOUBLE), 6)
           AS pct_of_type
FROM events
""", tier=2, section="2.5")
def win_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total windows: each event's share of its user's and its
    type's total value — the contribution/market-share shape of every BI
    layer. Frameless partition totals (one value per partition, computed
    once, broadcast to the partition's rows); DECIMAL-exact denominators
    so the ratio is a single identical float division on both engines."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    tot_user = F.sum(v.cast("decimal(18,2)")) \
                .over(Window.partitionBy("user_id")).cast("double")
    tot_type = F.sum(v.cast("decimal(18,2)")) \
                .over(Window.partitionBy("event_type")).cast("double")
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.round(v / tot_user, 6).alias("pct_of_user"),
        F.round(v / tot_type, 6).alias("pct_of_type"),
    )


@op("win_pct_of_total_scalable",
    oracle=REGISTRY["win_pct_of_total"].oracle, tier=3, section="2.5")
def win_pct_of_total_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``win_pct_of_total`` (round 5): frameless
    partition totals ARE group aggregates, so the window form (which
    buffers each partition — 20% of the corpus for the 5-valued type
    key) rewrites to two groupBy totals joined back: the type totals
    broadcast (5 rows), the user totals co-partition with the facts.
    Exact twin, verbatim oracle — identical decimal denominators,
    identical single float division."""
    ev = load(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,2)")
    tu = ev.groupBy("user_id").agg(F.sum(vdec).alias("tu"))
    tt = ev.groupBy("event_type").agg(F.sum(vdec).alias("tt"))
    v = F.col("value")
    return (ev.join(F.broadcast(tt), "event_type")
              .join(tu, "user_id")
              .select("event_id", "user_id", "event_type", "value",
                      F.round(v / F.col("tu").cast("double"), 6)
                       .alias("pct_of_user"),
                      F.round(v / F.col("tt").cast("double"), 6)
                       .alias("pct_of_type")))


@op("win_remaining_total", oracle="""
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
           AS remaining_value,
       count(*) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS remaining_events
FROM events
""", tier=2, section="2.5")
def win_remaining_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burn-down windows: at each event, the user's value and event count
    from HERE to the end of their history — the remaining-budget /
    remaining-lifetime-value view (the mirror of a running total, frame
    pointed forward). Decimal-exact sums keep the reverse accumulation
    order-insensitive."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    return ev.select(
        "event_id", "user_id", "value",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
         .cast("double").alias("remaining_value"),
        F.count("*").over(w).alias("remaining_events"),
    )


@op("win_rolling_volatility", oracle="""
WITH framed AS (
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                OVER w AS DOUBLE) AS sxx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx,
           count(*) OVER w AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, value,
       CASE WHEN n > 1
            THEN round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) END
           AS vol20,
       n AS window_n
FROM framed
""", tier=3, section="2.5")
def win_rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 20-row volatility (sample std) per user — the risk/noise
    band around every monitoring chart. A naive stddev-over-frame drifts
    between engines (running vs segment-tree accumulators); instead both
    moment sums Σx and Σx² are DECIMAL-exact over the frame (2-decimal
    inputs -> 4-decimal products), and the variance closed form runs as
    identical float arithmetic on identical exact operands."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(-19, Window.currentRow))
    vdec = F.col("value").cast("decimal(18,2)")
    framed = ev.select(
        "event_id", "user_id", "value",
        F.sum(vdec * vdec).over(w).cast("double").alias("sxx"),
        F.sum(vdec).over(w).cast("double").alias("sx"),
        F.count("*").over(w).alias("n"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) \
          / (F.col("n") - 1)
    return framed.select(
        "event_id", "user_id", "value",
        F.when(F.col("n") > 1, F.round(F.sqrt(var), 6)).alias("vol20"),
        F.col("n").alias("window_n"),
    )


@op("win_rolling_zscore", oracle="""
WITH framed AS (
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                OVER w AS DOUBLE) AS sxx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sx,
           count(*) OVER w AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, value,
       CASE WHEN n > 1 AND sxx - sx * sx / n > 0
            THEN round((value - sx / n)
                       / sqrt((sxx - sx * sx / n) / (n - 1)), 6) END
           AS rolling_z,
       n AS baseline_n
FROM framed
""", tier=3, section="2.5")
def win_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE anomaly score: each value z-scored against its own user's
    TRAILING 20-row baseline (frame ends 1 PRECEDING — the current point
    must not contaminate its own baseline) — the leakage-free online
    variant of the global ``ts_anomaly_zscore``. Same decimal-exact
    moment-sum formulation as ``win_rolling_volatility``."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(-19, -1))
    vdec = F.col("value").cast("decimal(18,2)")
    framed = ev.select(
        "event_id", "user_id", "value",
        F.sum(vdec * vdec).over(w).cast("double").alias("sxx"),
        F.sum(vdec).over(w).cast("double").alias("sx"),
        F.count("*").over(w).alias("n"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) \
          / (F.col("n") - 1)
    z = (F.col("value") - F.col("sx") / F.col("n")) / F.sqrt(var)
    return framed.select(
        "event_id", "user_id", "value",
        F.when((F.col("n") > 1)
               & (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n") > 0),
               F.round(z, 6)).alias("rolling_z"),
        F.col("n").alias("baseline_n"),
    )


@op("win_rolling_envelope", oracle="""
SELECT event_id, user_id, value,
       min(value) OVER w AS ch_low,
       max(value) OVER w AS ch_high,
       CAST(value >= max(value) OVER w AS INT) AS at_high
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
""", tier=2, section="2.5")
def win_rolling_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 20-row min/max envelope (the Donchian channel) with a
    breakout flag — the band every threshold-crossing alert draws.
    Frame min/max are exact order-free extremes: no float discipline
    needed, unlike frame sums."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(-19, Window.currentRow))
    hi = F.max("value").over(w)
    return ev.select(
        "event_id", "user_id", "value",
        F.min("value").over(w).alias("ch_low"),
        hi.alias("ch_high"),
        (F.col("value") >= hi).cast("int").alias("at_high"),
    )
