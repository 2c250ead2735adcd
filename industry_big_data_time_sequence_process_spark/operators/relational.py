"""Relational core (SURVEY.md §2.2 projection/filter, §2.3 joins,
§2.4 aggregations, §2.6 sorts/top-k, §2.7 set ops).

Everything here is Catalyst-native: declarative DataFrame plans that get
predicate pushdown, column pruning, join-strategy selection and AQE for
free (SURVEY.md §4.1). No RDDs, no collect-side logic anywhere.

The corpus has no NULLs (FIXTURES.md), so null-semantics operators
synthesize them with ``nullif``-style expressions on both engines.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import api
from ..exprs import cents, dec2, exact_sum, money_sum, r6, safe_corr
from ..registry import op
from ..sources.io import load

# ==========================================================================
# §2.2 Projection / filter / predicates
# ==========================================================================


@op("project_select", oracle="""
SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
FROM customer
""", tier=1, section="2.2")
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename — column pruning reaches the parquet scan."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@op("project_expr", oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge
FROM lineitem
""", tier=1, section="2.2")
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns. Identical IEEE ops on identical operands are
    bit-exact across engines — no rounding needed for scalar arithmetic."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey", "l_linenumber",
        rev.alias("revenue"),
        (rev * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@op("filter_simple", oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity < 10
""", tier=1, section="2.2")
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single comparison predicate — pushed down into the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 10).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@op("filter_compound", oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'O' AND o_totalprice > 200000)
   OR (o_orderpriority IN ('1-URGENT', '2-HIGH')
       AND NOT o_orderstatus = 'F'
       AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31')
""", tier=1, section="2.2")
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / IN / BETWEEN / NOT predicate tree."""
    o = load(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-12-31").cast("timestamp")
    pred = (
        ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000))
        | (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
           & ~(F.col("o_orderstatus") == "F")
           & F.col("o_orderdate").between(lo, hi))
    )
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@op("filter_ts_range", oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
""", tier=1, section="2.2")
def filter_ts_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range slice of the event stream — THE hot query shape of a
    time-series engine ('last N days of telemetry'). With the adaptive
    µs decode the predicate reaches the parquet scan as a pushed filter
    (pinned in tests/test_plans.py), so row-group min/max stats skip
    everything outside the window server-side; at 100 TB with a
    time-partitioned layout this prunes whole partitions before any
    row is read."""
    ev = load(spark, sf_dir, "events")
    lo = F.lit("2024-01-10").cast("timestamp")
    hi = F.lit("2024-01-13").cast("timestamp")
    return ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).select(
        "event_id", "ts", "user_id", "event_type", "value")


@op("filter_null_semantics", oracle="""
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg_null,
       CAST(nullif(c_mktsegment, 'BUILDING') IS NULL AS INT) AS is_building,
       CAST(nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'AUTOMOBILE'
            AS INT) AS nullsafe_auto
FROM customer
WHERE nullif(c_mktsegment, 'BUILDING') IS NULL
   OR nullif(c_mktsegment, 'BUILDING') IS NOT NULL
""", tier=1, section="2.2")
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (<=>), on synthesized
    nulls (the corpus itself is null-free)."""
    c = load(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    out = c.select(
        "c_custkey",
        seg_null.alias("seg_null"),
        seg_null.isNull().cast("int").alias("is_building"),
        seg_null.eqNullSafe(F.lit("AUTOMOBILE")).cast("int")
                .alias("nullsafe_auto"),
    )
    return out.filter(F.col("seg_null").isNull() | F.col("seg_null").isNotNull())


@op("filter_like_regexp", oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%old%' OR regexp_matches(p_type, '^(ECONOMY|PROMO)')
""", tier=1, section="2.2")
def filter_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern + regexp predicate."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%old%") | F.col("p_type").rlike("^(ECONOMY|PROMO)")
    ).select("p_partkey", "p_name", "p_type")


@op("distinct_rows", oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""", tier=1, section="2.2")
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DISTINCT (hash aggregate with map-side partials)."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


# ==========================================================================
# §2.3 Joins
# ==========================================================================


@op("join_inner_equi", oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""", tier=1, section="2.3")
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join orders x customer. Catalyst picks broadcast-hash here
    (customer is tiny); at 100 TB both sides shuffle on the key and AQE
    may still flip to broadcast at runtime."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@op("join_left_outer", oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
""", tier=1, section="2.3")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with null extension for order-less customers."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@op("join_right_outer", oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_name
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""", tier=2, section="2.3")
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_name"
    )


@op("join_full_outer", oracle="""
SELECT c.c_custkey, c.c_nationkey AS cust_nation,
       s.s_suppkey, s.s_nationkey AS supp_nation
FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
FULL JOIN (SELECT * FROM supplier WHERE s_acctbal < 0) s
  ON c.c_nationkey = s.s_nationkey
""", tier=2, section="2.3")
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null extension on BOTH sides (negative-balance
    customers x negative-balance suppliers per nation)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        "c_custkey", F.col("c_nationkey").alias("cust_nation"),
        "s_suppkey", F.col("s_nationkey").alias("supp_nation"),
    )


@op("join_semi", oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""", tier=1, section="2.3")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having orders (left-semi: no row multiplication)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@op("join_anti", oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""", tier=1, section="2.3")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (left-anti)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@op("join_broadcast", oracle="""
SELECT c.c_custkey, n.n_name, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""", tier=1, section="2.3")
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension tables: the fact side never
    shuffles — THE join pattern for dims at 100 TB. Plan differs from
    join_inner_equi (BroadcastHashJoin, no exchange on customer); result
    is identical, which is exactly what the oracle checks."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .select("c_custkey", "n_name", "r_name")
    )


@op("join_multikey_chain", oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
           AS revenue,
       count(*) AS n_lineitems
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey  = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""", tier=1, section="2.3")
def join_multikey_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-table star join: local-supplier revenue by nation.

    region/nation are broadcast; customer/orders/lineitem/supplier are
    shuffle-hash joins on their keys; revenue is summed exactly in decimal
    then surfaced as double (order-insensitive across engines).
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    # r13: revenue in scaled-integer cents (see exprs.money_sum) — the
    # per-row double->decimal casts were the aggregate's cost, not the
    # joins; bit-identical output (cents-product / 10^4, exact decimal
    # recombine per group).
    rev = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .join(c, c.c_nationkey == n.n_nationkey)
         .join(o, o.o_custkey == c.c_custkey)
         .join(li, li.l_orderkey == o.o_orderkey)
         .join(s, (li.l_suppkey == s.s_suppkey)
                  & (s.s_nationkey == c.c_nationkey))
         .groupBy("n_name")
         .agg(money_sum(rev, 10_000).alias("revenue"),
              F.count("*").alias("n_lineitems"))
    )


@op("join_theta_range", oracle="""
SELECT a.n_name AS n1, b.n_name AS n2
FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
""", tier=2, section="2.3")
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join -> Catalyst plans BroadcastNestedLoop.
    Deliberately on a dimension table: BNLJ is O(n*m) and must never be
    fed two fact tables at scale."""
    a = load(spark, sf_dir, "nation").alias("a")
    b = load(spark, sf_dir, "nation").alias("b")
    return a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey")).select(
        F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2")
    )


@op("join_interval_events", oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
""", tier=2, section="2.3")
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: line items shipped within 30 days of their order.
    Equi key + range predicate -> hash join with residual filter (NOT a
    nested loop): the equi key keeps it scalable."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.expr("o_orderdate + INTERVAL 30 DAYS")),
    ).select("l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@op("join_range_bucketed", oracle="""
SELECT o.o_orderkey AS window_id, o.o_orderdate AS win_start,
       l.l_orderkey, l.l_linenumber, l.l_shipdate
FROM (SELECT o_orderkey, o_orderdate FROM orders
      WHERE o_orderkey % 997 = 0) o
JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
""", tier=2, section="2.3")
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS range join made scalable by bucketing — the OSS answer to
    a range-join hint. Semantics: shipments falling inside any of a set
    of 7-day windows (no equi key between the tables at all).

    A naive ``l_shipdate BETWEEN …`` join has no equi conjunct ->
    Spark picks BroadcastNestedLoopJoin: every row tests every window,
    O(|facts|·|windows|) compares. Instead each window is EXPLODED into
    the 7 day-buckets it spans and each fact row maps to its own single
    day-bucket; the join becomes an equi-join on the bucket (hash,
    shuffle-free on the broadcast window side) with the exact range
    check left as a residual. Each fact matches a window in exactly one
    bucket (its own day), so no post-join dedup is needed. Cost drops to
    O(|facts| + |windows|·span_days) — the standard interval-join
    decomposition at 100 TB.

    The DuckDB oracle runs the PLAIN range join: genuinely different
    algorithm, identical rows.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    wins = (
        o.filter(F.col("o_orderkey") % 997 == 0)
         .select(F.col("o_orderkey").alias("window_id"),
                 F.col("o_orderdate").alias("win_start"))
    )
    win_buckets = wins.select(
        "window_id", "win_start",
        F.explode(F.sequence(
            F.date_trunc("day", "win_start"),
            F.date_trunc("day", F.expr("win_start + INTERVAL 6 DAYS")),
            F.expr("interval 1 day"))).alias("bucket"),
    )
    facts = li.select(
        "l_orderkey", "l_linenumber", "l_shipdate",
        F.date_trunc("day", "l_shipdate").alias("bucket"),
    )
    return (
        facts.join(F.broadcast(win_buckets), "bucket")
             .filter((F.col("l_shipdate") >= F.col("win_start"))
                     & (F.col("l_shipdate")
                        < F.expr("win_start + INTERVAL 7 DAYS")))
             .select("window_id", "win_start",
                     "l_orderkey", "l_linenumber", "l_shipdate")
    )


@op("join_asof_backward", oracle="""
WITH od AS (   -- per (customer, date) keep the max-key order: makes the
               -- as-of pick deterministic on both engines (32 dup pairs)
    SELECT o_custkey, o_orderdate,
           max(o_orderkey) AS o_orderkey,
           max_by(o_totalprice, o_orderkey) AS o_totalprice
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM events e
ASOF LEFT JOIN od o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""", tier=1, section="2.3")
def join_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: latest order at-or-before each event.

    OSS Spark has no ASOF JOIN. Algorithm (SURVEY.md §4.3): tag both
    sides, union, and carry order columns onto event rows with
    last(ignorenulls) over (key ORDER BY t, side) — ONE shuffle on the
    key, no range explosion, skew-safe at 100 TB. The DuckDB oracle uses
    its native ASOF JOIN: a genuinely independent implementation.
    """
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")

    # Dedupe right side per (key, time): keep max o_orderkey (determinism;
    # o_orderkey is the orders PK, so max_by has no tie to break). r13:
    # max + max_by over atomic columns — max(struct) has an immutable
    # aggregation buffer, so Spark silently fell back to SortAggregate
    # and sorted the whole orders table TWICE (partial + final); the
    # atomic pair hash-aggregates with map-side partials, no sort.
    od = (o.groupBy("o_custkey", "o_orderdate")
           .agg(F.max("o_orderkey").alias("o_orderkey"),
                F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"))
           .select(F.col("o_custkey").alias("user_id"), "o_orderdate",
                   "o_orderkey", "o_totalprice"))
    return api.asof_join_backward(
        ev.select("event_id", "user_id", "ts"), od,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    ).select("event_id", "user_id", "ts",
             "o_orderkey", "o_orderdate", "o_totalprice")


@op("join_asof_forward", oracle="""
WITH od AS (   -- same deterministic per-(customer, date) dedupe as the
               -- backward op: keep the max-key order
    SELECT o_custkey, o_orderdate,
           max(o_orderkey) AS o_orderkey,
           max_by(o_totalprice, o_orderkey) AS o_totalprice
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM events e
ASOF LEFT JOIN od o
  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
""", tier=2, section="2.3")
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (forward) join: EARLIEST order at-or-after each event — the
    "next action" lookup (next maintenance after an alert, next trade
    after a quote). Same union+window plan shape as the backward op, with
    the carry direction reversed; DuckDB's native forward ASOF JOIN
    (``ON left.ts <= right.ts``) is the independent oracle.
    """
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    od = (o.groupBy("o_custkey", "o_orderdate")   # r13: hash-aggregable
           .agg(F.max("o_orderkey").alias("o_orderkey"),  # (see backward)
                F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"))
           .select(F.col("o_custkey").alias("user_id"), "o_orderdate",
                   "o_orderkey", "o_totalprice"))
    return api.asof_join_forward(
        ev.select("event_id", "user_id", "ts"), od,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    ).select("event_id", "user_id", "ts",
             "o_orderkey", "o_orderdate", "o_totalprice")


_SALT = 8


@op("join_skew_salted", oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""", tier=2, section="2.3")
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join: the manual hot-key remedy when AQE's skew
    split can't help (e.g. one key holding >1 executor-memory of rows).

    The fact side gets a deterministic salt in [0, 8); the build side is
    replicated 8x via explode; the join key becomes (key, salt), fanning
    each hot key over 8 reducers. Semantically invariant — the oracle is
    the PLAIN join — which is exactly the property that makes salting
    safe to apply mechanically at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lf = li.withColumn("_salt", (F.col("l_linenumber") % _SALT).cast("int"))
    ob = o.select("o_orderkey", "o_orderpriority").withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return (
        lf.join(ob, (lf.l_orderkey == ob.o_orderkey)
                & (lf["_salt"] == ob["_salt"]))
          .groupBy("o_orderpriority")
          .agg(F.count("*").alias("n_lines"),
               F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double").alias("sum_qty"))
    )


@op("join_fuzzy_levenshtein", oracle="""
WITH c AS (SELECT c_custkey, c_name FROM customer)
SELECT a.c_custkey AS key1, b.c_custkey AS key2,
       a.c_name AS name1, b.c_name AS name2,
       levenshtein(a.c_name, b.c_name) AS dist
FROM c a JOIN c b
  ON substr(a.c_name, 1, length(a.c_name) - 2)
     = substr(b.c_name, 1, length(b.c_name) - 2)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""", tier=3, section="2.3")
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join (entity resolution): name pairs within edit
    distance 1, found via BLOCKING — equi-join on the all-but-last-2-chars
    prefix block, then the O(len²) Levenshtein verify runs only inside
    blocks. The all-pairs quadratic never happens; this
    block-then-verify shape is the same candidate-pruning discipline as
    the MinHash/LSH dedup ops, applied to short strings.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    block = F.expr("substr(c_name, 1, length(c_name) - 2)")
    a = c.select(F.col("c_custkey").alias("key1"),
                 F.col("c_name").alias("name1"), block.alias("blk"))
    b = c.select(F.col("c_custkey").alias("key2"),
                 F.col("c_name").alias("name2"), block.alias("blk"))
    dist = F.levenshtein("name1", "name2")
    return (
        a.join(b, "blk")
         .filter(F.col("key1") < F.col("key2"))
         .withColumn("dist", dist)
         .filter(F.col("dist") <= 1)
         .select("key1", "key2", "name1", "name2", "dist")
    )


@op("join_hint_merge", oracle="""
SELECT o.o_orderkey, o.o_orderdate, c.c_custkey, c.c_acctbal
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""", tier=2, section="2.3")
def join_hint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit physical-strategy control: force a sort-merge join with
    ``hint('merge')`` where Catalyst would pick broadcast at this size.
    The fact-x-fact posture at 100 TB IS sort-merge; pinning it here
    (plan-asserted) proves results are strategy-invariant — same rows as
    the plain join the oracle runs — and documents the hint API
    (merge / shuffle_hash / shuffle_replicate_nl) as the engine's
    override surface when AQE's choice is wrong.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").hint("merge")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "c_custkey", "c_acctbal"
    )


@op("join_null_safe_keys", oracle="""
WITH c AS (SELECT c_custkey, nullif(c_nationkey, 0) AS nk, c_acctbal
           FROM customer),
     s AS (SELECT s_suppkey, nullif(s_nationkey, 0) AS nk, s_acctbal
           FROM supplier)
SELECT c.c_custkey, s.s_suppkey, c.nk AS nation_or_null,
       c.c_acctbal, s.s_acctbal
FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
WHERE c.c_custkey < 100
""", tier=2, section="2.3")
def join_null_safe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe join keys (``<=>`` / IS NOT DISTINCT FROM): nation 0 is
    nulled on both sides, and unlike a plain equi-join — which silently
    DROPS null-keyed rows — the null-safe comparison matches them to each
    other. The dirty-dimension-key corner every warehouse hits; Spark
    still executes it as a hash join (null-safe equality is hashable)."""
    c = (load(spark, sf_dir, "customer")
         .select("c_custkey", F.nullif("c_nationkey", F.lit(0)).alias("nk"),
                 "c_acctbal")
         .filter(F.col("c_custkey") < 100))
    s = (load(spark, sf_dir, "supplier")
         .select("s_suppkey",
                 F.nullif("s_nationkey", F.lit(0)).alias("nk2"), "s_acctbal"))
    return c.join(s, c["nk"].eqNullSafe(s["nk2"])).select(
        "c_custkey", "s_suppkey", F.col("nk").alias("nation_or_null"),
        "c_acctbal", "s_acctbal",
    )


_BLOOM_BITS = 1 << 16   # 65536-bit filter = 1024 longs — broadcast-tiny
_BLOOM_SEEDS = (1, 2, 3)  # k=3 hash functions; fpp ~0.2% at ~3k keys


@op("join_bloom_prefilter", oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY o.o_orderpriority
""", tier=2, section="2.3")
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime prefilter for a selective fact⋈build join —
    the pattern Spark's own AQE row-level runtime filtering applies,
    built explicitly so the mechanics are visible and plan-pinned.

    The build side (date-filtered orders) hashes its join keys into a
    65536-bit bloom (k=3 xxhash64 seeds), stored as 1024 (word_idx,
    bits) longs — broadcast-tiny no matter how many keys it encodes,
    which is exactly why blooms beat broadcast key-SETS at scale: the
    filter size is fixed by fpp, not by build cardinality. The fact side
    (lineitem) probes membership via three narrow BroadcastHashJoins
    BEFORE any shuffle, so non-matching fact rows never enter the
    exchange; false positives (conservative by construction) are removed
    by the exact join that follows, which is why the result is
    value-identical to the plain join and the DuckDB oracle is simply
    that plain join. xxhash64 is JVM-side whole-stage-codegen; no
    cross-engine hash discipline is needed because the bloom never
    leaves Spark. tests/test_plans.py pins: 3+ BroadcastHashJoins and no
    Exchange on the fact side before the probe.
    """
    m, seeds = _BLOOM_BITS, _BLOOM_SEEDS
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    keys = orders.select("o_orderkey")

    words = None
    for s in seeds:
        pos = F.pmod(F.xxhash64(F.col("o_orderkey"), F.lit(s)), F.lit(m))
        part = (keys.withColumn("_pos", pos)
                    .select(F.shiftright(F.col("_pos"), 6).alias("word_idx"),
                            F.expr("shiftleft(cast(1 as bigint), "
                                   "cast(_pos & 63 as int))").alias("bit")))
        words = part if words is None else words.unionAll(part)
    bloom = words.groupBy("word_idx").agg(
        F.bit_or("bit").alias("bits"))

    cand = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice")
    for s in seeds:
        pos = F.pmod(F.xxhash64(F.col("l_orderkey"), F.lit(s)), F.lit(m))
        b = (bloom.withColumnRenamed("word_idx", f"w{s}")
                  .withColumnRenamed("bits", f"bits{s}"))
        cand = (cand.withColumn(f"_p{s}", pos)
                    .join(F.broadcast(b),
                          F.shiftright(F.col(f"_p{s}"), 6) == F.col(f"w{s}"))
                    .filter(F.expr(f"(shiftrightunsigned(bits{s}, "
                                   f"cast(_p{s} & 63 as int)) & 1) = 1"))
                    .drop(f"_p{s}", f"w{s}", f"bits{s}"))

    return (cand.join(orders.select("o_orderkey", "o_orderpriority"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n_items"),
                     # r13: scaled-integer money sum (see agg_groupby_multi)
                     money_sum(cents("l_extendedprice"), 100)
                     .alias("revenue")))


@op("join_cross_topk", oracle="""
SELECT c_custkey, s_suppkey, score, rnk FROM (
    SELECT c.c_custkey, s.s_suppkey,
           abs(c.c_acctbal - s.s_acctbal) AS score,
           row_number() OVER (PARTITION BY c.c_custkey
                              ORDER BY abs(c.c_acctbal - s.s_acctbal),
                                       s.s_suppkey) AS rnk
    FROM (SELECT * FROM customer WHERE c_custkey < 20) c
    CROSS JOIN supplier s
) WHERE rnk <= 3
""", tier=2, section="2.3")
def join_cross_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join + per-group top-k — the skeleton of brute-force
    similarity search (§2.11): tiny query side broadcast against a big
    candidate side, then windowed top-k."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 20)
    s = load(spark, sf_dir, "supplier")
    scored = F.broadcast(c).crossJoin(s).select(
        "c_custkey", "s_suppkey",
        F.abs(F.col("c_acctbal") - F.col("s_acctbal")).alias("score"),
    )
    w = Window.partitionBy("c_custkey").orderBy("score", "s_suppkey")
    return scored.withColumn("rnk", F.row_number().over(w)).filter("rnk <= 3")


# ==========================================================================
# §2.4 Aggregations
# ==========================================================================


@op("agg_global", oracle="""
SELECT count(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(l_shipdate) AS min_ship,
       max(l_shipdate) AS max_ship,
       round(avg(l_discount), 6) AS avg_disc
FROM lineitem
""", tier=1, section="2.4")
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate over the fact table (partial + final merge)."""
    li = load(spark, sf_dir, "lineitem")
    # r13: money sums in scaled-integer cents (exprs.money_sum — the
    # rows >> groups shape where the per-row decimal cast dominated;
    # bit-identical, see agg_groupby_multi).
    return li.agg(
        F.count("*").alias("n_rows"),
        money_sum(cents("l_quantity"), 100).alias("sum_qty"),
        money_sum(cents("l_extendedprice"), 100).alias("sum_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        r6(F.avg("l_discount")).alias("avg_disc"),
    )


@op("agg_groupby_multi", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(4,2))
                * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""", tier=1, section="2.4")
def agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2 group cols, 8 aggregates.
    Money sums are exact and order-insensitive — r13: computed in
    scaled-integer cents (``exprs.cents``/``money_sum``) instead of
    per-row DECIMAL casts (whose double->decimal conversion routes
    through a string parse): bit-identical output, measured
    1.37 s -> 0.79 s at sf0.1, overflow-safe to ~9e12 rows (twin-pinned
    in tests/test_opt_r13.py). Averages are rounded (divergence provably
    < 1e-6 at these magnitudes) and unchanged."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    qc = cents("l_quantity")
    pc = cents("l_extendedprice")
    dc = cents(F.lit(1) - F.col("l_discount"))
    tc = cents(F.lit(1) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(qc, 100).alias("sum_qty"),
        money_sum(pc, 100).alias("sum_base_price"),
        money_sum(pc * dc, 10_000).alias("sum_disc_price"),
        money_sum(pc * dc * tc, 1_000_000).alias("sum_charge"),
        r6(F.avg("l_quantity")).alias("avg_qty"),
        r6(F.avg("l_extendedprice")).alias("avg_price"),
        r6(F.avg("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@op("agg_count_distinct", oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY event_type
""", tier=1, section="2.4")
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (expands to a two-phase aggregate)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@op("agg_approx_distinct", oracle=None, tier=2, section="2.4")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct parts per supplier nation. Sketches are
    engine-specific (SURVEY.md App. A.8) -> rows-only check."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey) \
             .groupBy("s_nationkey") \
             .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))


@op("agg_grouping_sets", oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""", tier=2, section="2.4")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal lattice via the SQL entry point (§3.3) — both DataFrame and
    SQL converge on the same logical plan."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs_v")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM li_gs_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@op("agg_rollup", oracle="""
SELECT r.r_name, n.n_name, count(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""", tier=2, section="2.4")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region -> nation -> grand total."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        exact_sum("c_acctbal").alias("sum_acctbal"),
    )


@op("agg_cube", oracle="""
SELECT event_type, user_id % 10 AS user_bucket,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM events
GROUP BY CUBE (event_type, user_id % 10)
""", tier=2, section="2.4")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over event_type x user bucket."""
    ev = load(spark, sf_dir, "events")
    return ev.cube(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    ).agg(F.count("*").alias("n"), r6(F.avg("value")).alias("avg_value"))


@op("agg_percentile_exact", oracle="""
SELECT event_type,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90
FROM events GROUP BY event_type
""", tier=2, section="2.4")
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == percentile_cont)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r6(F.percentile("value", F.lit(0.5))).alias("p50"),
        r6(F.percentile("value", F.lit(0.9))).alias("p90"),
    )


@op("agg_stats", oracle="""
SELECT event_type,
       round(stddev_samp(value), 6) AS sd,
       round(var_samp(value), 6) AS var,
       round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu
FROM events GROUP BY event_type
""", tier=2, section="2.4")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance, correlation).
    skewness deliberately excluded from the oracle: Spark computes the
    population form, DuckDB the sample-adjusted form."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r6(F.stddev_samp("value")).alias("sd"),
        r6(F.var_samp("value")).alias("var"),
        r6(safe_corr("value", F.col("user_id").cast("double")))
            .alias("corr_vu"),
    )


@op("agg_regression_builtin", oracle="""
SELECT user_id,
       round(regr_slope(value, (epoch_us(ts) - 1704067200000000)
                               / 3600000000.0), 6) AS slope_per_hr,
       round(regr_intercept(value, (epoch_us(ts) - 1704067200000000)
                                   / 3600000000.0), 6) AS intercept,
       round(regr_r2(value, (epoch_us(ts) - 1704067200000000)
                            / 3600000000.0), 6) AS r2,
       count(*) AS n
FROM events GROUP BY user_id
""", tier=2, section="2.4")
def agg_regression_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of value over time via the BUILT-IN
    regression aggregates (regr_slope/intercept/r2) — the JVM-side,
    map-side-partial twin of the Arrow UDAF ``udaf_grouped_slope``
    (§2.12 exists to demonstrate the UDAF machinery; THIS is the form
    to ship at 100 TB: sufficient statistics combine associatively, so
    the whole fit is one hash aggregate, no per-group sort or Python).
    The time axis is re-centered to hours since 2024-01-01 on BOTH
    engines — raw epoch-µs squares to ~1e30 and loses the fit in
    floating-point cancellation."""
    ev = load(spark, sf_dir, "events")
    x = (F.unix_micros("ts") - F.lit(1_704_067_200_000_000)) / 3.6e9
    v = F.col("value")
    return ev.groupBy("user_id").agg(
        r6(F.regr_slope(v, x)).alias("slope_per_hr"),
        r6(F.regr_intercept(v, x)).alias("intercept"),
        r6(F.regr_r2(v, x)).alias("r2"),
        F.count("*").alias("n"),
    )


@op("agg_conditional", oracle="""
SELECT o_orderpriority,
       count(*) AS n_total,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS sum_open_price
FROM orders GROUP BY o_orderpriority
""", tier=1, section="2.4")
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicated aggregation (FILTER-style) via count(when())/sum(when())."""
    o = load(spark, sf_dir, "orders")
    is_open = F.col("o_orderstatus") == "O"
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(is_open, 1)).alias("n_open"),
        F.sum(F.when(is_open, dec2("o_totalprice"))).cast("double")
         .alias("sum_open_price"),
    )


@op("agg_collect_sorted", oracle="""
SELECT user_id,
       array_to_string(list_sort(list(event_type)), ',') AS types,
       count(*) AS n
FROM events GROUP BY user_id
""", tier=2, section="2.4")
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic list aggregation: collect_list is order-nondeterministic,
    so always sort_array it (SURVEY.md App. A.7). Rendered as a ','-joined
    string on both engines — array-typed result columns crash pandas-based
    canonicalizers (unhashable numpy.ndarray), and the string form is
    hash-stable without losing information."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("event_type")))
         .alias("types"),
        F.count("*").alias("n"),
    )


@op("agg_histogram", oracle="""
SELECT event_type,
       CAST(least(floor(value / 33.0), 9) AS BIGINT) AS bin,
       count(*) AS n,
       round(min(value), 6) AS bin_min,
       round(max(value), 6) AS bin_max
FROM events
GROUP BY 1, 2
""", tier=2, section="2.4")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of value per event_type: 10 bins of width 33
    over the [0, 330) domain, top bin clamped open-ended. One hash
    aggregation on a computed key — the profiling staple that replaces
    collecting raw values to the driver."""
    ev = load(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / 33.0), F.lit(9)).cast("long")
    return ev.groupBy("event_type", bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("bin_min"),
        F.round(F.max("value"), 6).alias("bin_max"),
    )


@op("agg_mode_deterministic", oracle="""
SELECT user_id, event_type AS mode_type, n FROM (
    SELECT user_id, event_type, count(*) AS n,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY count(*) DESC, event_type) AS rnk
    FROM events GROUP BY user_id, event_type
) WHERE rnk = 1
""", tier=2, section="2.4")
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent event_type per user — implemented as count +
    windowed argmax rather than the native ``mode()`` aggregate, because
    both engines' ``mode`` pick ARBITRARILY among ties; the explicit
    (count DESC, value) tiebreak makes the answer reproducible across
    engines, runs, and partitionings — the property a pipeline needs."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (counts.withColumn("rnk", F.row_number().over(w))
                  .filter("rnk = 1")
                  .select("user_id", F.col("event_type").alias("mode_type"), "n"))


@op("agg_approx_percentile", oracle=None, tier=2, section="2.4")
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (p50/p90/p99 of value per event_type) via
    ``approx_percentile`` — the constant-memory path when exact
    percentiles' full sort is too expensive at 100 TB. Rows-only oracle
    like ``agg_approx_distinct``: sketch internals differ across engines
    by design (accuracy 1e-4 here; the exact twin is
    ``agg_percentile_exact``)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("p90"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("p99"),
    )


@op("agg_boolean", oracle="""
SELECT event_type,
       CAST(bool_and(value > 0) AS INT) AS all_positive,
       CAST(bool_or(value > 300) AS INT) AS any_extreme,
       CAST(count_if(value > 50) AS BIGINT) AS n_over_50,
       CAST(count_if(value > 50) AS DOUBLE) / count(*) AS frac_over_50
FROM events GROUP BY event_type
""", tier=2, section="2.4")
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: every/any predicates + conditional
    count + fraction — the data-quality assertion aggregates (``all rows
    positive?``, ``any outlier?``). Deterministic regardless of row
    order, unlike any_value/first."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.every(v > 0).cast("int").alias("all_positive"),
        F.some(v > 300).cast("int").alias("any_extreme"),
        F.count_if(v > 50).alias("n_over_50"),
        (F.count_if(v > 50).cast("double") / F.count("*"))
        .alias("frac_over_50"),
    )


@op("agg_weighted_avg", oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS weighted_sum,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
           AS qty_weighted_price
FROM lineitem GROUP BY l_returnflag
""", tier=2, section="2.4")
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag — the VWAP shape.
    Weights and values are 2-decimal, so both the products and their sums
    are computed in DECIMAL (exact, order-insensitive); the single final
    division is the only float op. This is the distributed-safe way to
    write any weighted mean."""
    li = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    q = F.col("l_quantity").cast("decimal(18,2)")
    wsum = F.sum(p * q).cast("double")
    qsum = F.sum(q).cast("double")
    return li.groupBy("l_returnflag").agg(
        wsum.alias("weighted_sum"),
        qsum.alias("total_qty"),
        F.round(wsum / qsum, 6).alias("qty_weighted_price"),
    )


@op("agg_argminmax", oracle="""
SELECT user_id,
       min_by(value, event_id) AS first_value,
       max_by(value, event_id) AS last_value,
       max_by(event_type, value) AS type_at_peak,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM events GROUP BY user_id
""", tier=2, section="2.4")
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregates: each user's first/last reading (by the
    unique event_id order) and the event type at their peak value — the
    'value at extremum' lookups that otherwise cost a window + filter
    pass. One hash aggregation. Determinism note: the by-keys here
    (event_id unique; value — peak unique per user in this corpus) make
    the answer well-defined; with tied keys both engines pick
    arbitrarily, so never max_by on a non-unique key in production."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
        F.max_by("event_type", "value").alias("type_at_peak"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


@op("agg_mean_family", oracle="""
SELECT event_type,
       round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS arith_mean,
       round(exp(avg(ln(value))), 6) AS geo_mean,
       round(count(*) / sum(1.0 / value), 6) AS harm_mean
FROM events GROUP BY event_type
""", tier=2, section="2.4")
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means per event_type: arithmetic (decimal-
    exact sum / count), geometric (exp∘avg∘ln — the right average for
    multiplicative/right-skewed data like this corpus's values), harmonic
    (n / Σ1/x — the right average for rates). All reduce to sums, so all
    get map-side partials; ln/exp on identical doubles are identical, and
    the 6-decimal round absorbs summation-order ulp."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.round(F.sum(v.cast("decimal(18,2)")).cast("double")
                / F.count("*"), 6).alias("arith_mean"),
        F.round(F.exp(F.avg(F.log(v))), 6).alias("geo_mean"),
        F.round(F.count("*") / F.sum(F.lit(1.0) / v), 6).alias("harm_mean"),
    )


@op("agg_distinct_multi", oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
       count(DISTINCT user_id) AS dau,
       count(DISTINCT event_type) AS n_types,
       count(DISTINCT user_id || ':' || event_type) AS user_type_pairs,
       count(*) AS n_events
FROM events GROUP BY 1
""", tier=2, section="2.4")
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE exact count-distincts with different keys in one
    aggregation (DAU + type cardinality + pair cardinality per day).
    Catalyst compiles this to a single Expand-based plan (each row
    replicated once per distinct column set) rather than three separate
    scans+joins — the one-pass multi-cardinality report at any scale."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(
            F.concat_ws(":", "user_id", "event_type")).alias("user_type_pairs"),
        F.count("*").alias("n_events"),
    )


@op("agg_profile_wide", oracle="""
SELECT count(*) AS n_rows,
       min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS qty_mean,
       round(stddev_samp(l_quantity), 6) AS qty_std,
       min(l_extendedprice) AS price_min, max(l_extendedprice) AS price_max,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS price_mean,
       round(stddev_samp(l_extendedprice), 6) AS price_std,
       min(l_discount) AS disc_min, max(l_discount) AS disc_max,
       count(DISTINCT l_returnflag) AS flag_card
FROM lineitem
""", tier=2, section="2.4")
def agg_profile_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass multi-column profile (the ``describe()`` shape): min/max/
    mean/std for three measures plus a categorical cardinality, in a
    single aggregation over a single scan — the schema-profiling pass a
    100 TB onboarding job runs first. Means are exact-sum ratios; stds
    round at 6 (variance accumulators drift in the last ulp)."""
    li = load(spark, sf_dir, "lineitem")

    def mean_of(c: str) -> F.Column:
        return F.round(
            F.sum(F.col(c).cast("decimal(18,2)")).cast("double")
            / F.count("*"), 6)

    return li.agg(
        F.count("*").alias("n_rows"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        mean_of("l_quantity").alias("qty_mean"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_std"),
        F.min("l_extendedprice").alias("price_min"),
        F.max("l_extendedprice").alias("price_max"),
        mean_of("l_extendedprice").alias("price_mean"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("price_std"),
        F.min("l_discount").alias("disc_min"),
        F.max("l_discount").alias("disc_max"),
        F.countDistinct("l_returnflag").alias("flag_card"),
    )


@op("agg_chi2_independence", oracle="""
WITH obs AS (
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow, event_type,
           CAST(count(*) AS DOUBLE) AS o
    FROM events GROUP BY 1, 2
), margins AS (
    SELECT o.*,
           sum(o.o) OVER (PARTITION BY o.dow) AS row_tot,
           sum(o.o) OVER (PARTITION BY o.event_type) AS col_tot,
           sum(o.o) OVER () AS n
    FROM obs o
)
SELECT round(sum(pow(o - row_tot * col_tot / n, 2)
                 / (row_tot * col_tot / n)), 6) AS chi2,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((count(DISTINCT dow) - 1)
            * (count(DISTINCT event_type) - 1) AS BIGINT) AS dof
FROM margins
""", tier=3, section="2.4")
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between day-of-week and event
    type — the drift/association screen for categorical pairs (is the
    traffic mix shifting by weekday?). Contingency counts via one
    aggregation; margins via frameless windows over the tiny 7x5 cell
    table; the statistic is a sum over cells, nowhere near the fact
    stream."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"), "event_type"
    ).agg(F.count("*").cast("double").alias("o"))
    margins = obs.select(
        "dow", "event_type", "o",
        F.sum("o").over(Window.partitionBy("dow")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("event_type")).alias("col_tot"),
        F.sum("o").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return margins.agg(
        F.round(F.sum(F.pow(F.col("o") - exp, 2) / exp), 6).alias("chi2"),
        F.count("*").cast("long").alias("n_cells"),
        ((F.countDistinct("dow") - 1)
         * (F.countDistinct("event_type") - 1)).cast("long").alias("dof"),
    )


@op("agg_gini", oracle="""
WITH ranked AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS i,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type,
       round(2.0 * sum(i * CAST(value AS DECIMAL(18,2)))
             / (n * sum(CAST(value AS DECIMAL(18,2))))
             - (n + 1.0) / n, 6) AS gini,
       CAST(max(n) AS BIGINT) AS n
FROM ranked GROUP BY event_type, n
""", tier=3, section="2.4")
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the value distribution per event type — the
    concentration metric ('do a few events carry most of the value?')
    that flags whale-dominated segments. Rank-formula form
    G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n over value-sorted rows, with
    DECIMAL-exact weighted sums (i·xᵢ is a 2-decimal times an integer)
    and a single float division. Ranks come from the grouped two-phase
    rank (round 5 — the per-type partition is a constant fraction of
    the corpus, SCALE.md's low-cardinality hazard class), so the only
    sorted partitions are single (type, unit-value) cells."""
    from ..api import bucketed_global_rank

    ev = load(spark, sf_dir, "events")
    ranked = bucketed_global_rank(
        ev.select("event_type", "event_id", "value"),
        F.floor("value").cast("long"),
        [F.col("value"), F.col("event_id")],
        rank_name="i", total_name="n", group_cols=["event_type"]) \
        .select("event_type",
                F.col("value").cast("decimal(18,2)").alias("v"),
                "i", "n")
    gini = (2.0 * F.sum(F.col("i") * F.col("v"))
            / (F.col("n") * F.sum("v")) - (F.col("n") + 1.0) / F.col("n"))
    return ranked.groupBy("event_type", "n").agg(
        F.round(gini, 6).alias("gini"),
        F.max("n").cast("long").alias("n2"),
    ).select("event_type", "gini", F.col("n2").alias("n"))


@op("agg_skew_salted", oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM events GROUP BY event_type
""", tier=2, section="2.4")
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys, the manual
    hot-key-splitting technique (events has only 5 event_types — 20k
    rows/key at sf0.1, millions at 100 TB; a plain groupBy sends each
    entire key to ONE reducer).

    Phase 1 groups by (key, salt) spreading every hot key over 16
    reducers; phase 2 merges the 5x16 partials. Decomposable aggregates
    only (count/sum -> avg) — the result is value-identical to the
    direct groupBy, which is exactly what the oracle checks.
    """
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec2("value")).alias("psum"),
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("sum_value"),
    ).withColumn(
        "avg_value", F.round(F.col("sum_value") / F.col("n"), 6),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_notspec", "p5_low"]


@op("agg_pivot", oracle="""
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_medium,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_low
FROM orders GROUP BY o_orderstatus
""", tier=2, section="2.4")
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide): order counts per status x priority. The pivot
    value list is EXPLICIT — the production rule: an implicit pivot runs
    a whole extra distinct-scan job to discover the columns."""
    o = load(spark, sf_dir, "orders")
    wide = (o.groupBy("o_orderstatus")
             .pivot("o_orderpriority", _PRIORITIES).count())
    renamed = wide.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(c)
          for p, c in zip(_PRIORITIES, _PRIO_COLS)],
    )
    return renamed


@op("unpivot_melt", oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
""", tier=2, section="2.4")
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide->long): lineitem measure columns into
    (metric, val) rows — one scan, no union of rescans (Spark's
    ``unpivot``/``Expand`` reads the table once; the oracle's UNION ALL
    form is the portable equivalent)."""
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric", "val",
    )


@op("filter_subquery_in", oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
""", tier=2, section="2.2")
def filter_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicates through the SQL entry point: an uncorrelated
    IN and a correlated EXISTS. Catalyst's RewritePredicateSubquery
    decorrelates both into left-semi joins — verify with .explain():
    no per-row subquery execution survives."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq_v")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sq_v")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_sq_v o
        WHERE o_custkey IN (SELECT c_custkey FROM customer_sq_v
                            WHERE c_acctbal < 0)
          AND EXISTS (SELECT 1 FROM lineitem_sq_v l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 45)
    """)


@op("scalar_subquery_agg", oracle="""
SELECT o_orderkey, o_totalprice,
       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 6)
           AS dev_from_mean
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
""", tier=2, section="2.2")
def scalar_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries (select-list + predicate): the aggregate runs
    once and is broadcast into the scan filter, not re-evaluated per
    row."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssq_v")
    return spark.sql("""
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice - (SELECT avg(o_totalprice)
                                     FROM orders_ssq_v), 6) AS dev_from_mean
        FROM orders_ssq_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_ssq_v) * 1.5
    """)


# ==========================================================================
# §2.6 Sorts / limits / top-k
# ==========================================================================


@op("sort_multi_nulls", oracle="""
SELECT c_custkey, seg_null, c_acctbal,
       row_number() OVER (ORDER BY seg_null ASC NULLS LAST,
                          c_acctbal DESC, c_custkey) AS sort_pos
FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_null,
             c_acctbal
      FROM customer)
""", tier=1, section="2.6")
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit null placement. The order itself is
    materialized as sort_pos (the driver's hash is order-insensitive, so
    order must be data to be checked). Spark ASC default is NULLS FIRST,
    DuckDB's is NULLS LAST — always explicit (SURVEY.md App. A.3).

    Scale (round 5): sort_pos comes from the two-phase rank
    (``api.bucketed_global_rank``), NOT an unpartitioned row_number —
    the bucket is the null-safe (is_null, segment, -ceil(acctbal))
    struct, monotone under exactly the demanded (seg NULLS LAST,
    acctbal DESC) order, so the largest partition Spark sorts is one
    ~1-acctbal-wide band of one segment."""
    from ..api import bucketed_global_rank

    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_null"),
        "c_acctbal",
    )
    bucket = F.struct(
        F.col("seg_null").isNull().cast("int").alias("nl"),
        F.coalesce("seg_null", F.lit("")).alias("seg"),
        (-F.ceil("c_acctbal")).cast("long").alias("nb"))
    ranked = bucketed_global_rank(
        c, bucket,
        [F.col("seg_null").asc_nulls_last(), F.col("c_acctbal").desc(),
         F.col("c_custkey")],
        rank_name="sort_pos")
    return ranked.select("c_custkey", "seg_null", "c_acctbal",
                         F.col("sort_pos").cast("int").alias("sort_pos"))


@op("limit_n", oracle=None, tier=1, section="2.6")
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT without a total order — a nondeterministic subset by contract,
    so rows-only check (SURVEY.md §2.6)."""
    return load(spark, sf_dir, "lineitem").limit(100)


@op("topk_global", oracle="""
SELECT event_id, event_type, value
FROM events ORDER BY value DESC, event_id LIMIT 10
""", tier=1, section="2.6")
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT -> TakeOrderedAndProject (no global sort, each
    partition keeps k rows, driver merges k*p). event_id tiebreak makes the
    result set deterministic."""
    ev = load(spark, sf_dir, "events")
    return ev.orderBy(F.col("value").desc(), "event_id") \
             .limit(10).select("event_id", "event_type", "value")


@op("topk_per_group", oracle="""
SELECT user_id, event_id, value, rnk FROM (
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id) AS rnk
    FROM events
) WHERE rnk <= 3
""", tier=1, section="2.6")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user via ranked window + filter."""
    ev = load(spark, sf_dir, "events")
    return api.topk_per_group(
        ev.select("user_id", "event_id", "value"), ["user_id"],
        [F.col("value").desc(), F.col("event_id")], k=3,
    )


# ==========================================================================
# §2.7 Set operations
# ==========================================================================


@op("set_union_all", oracle="""
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
""", tier=1, section="2.7")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (no dedup shuffle)."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH")
    return urgent.select("o_orderkey", "o_orderpriority").unionByName(
        high.select("o_orderkey", "o_orderpriority")
    )


@op("set_union_distinct", oracle="""
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT user_id AS key FROM events
""", tier=1, section="2.7")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (union + distinct aggregate)."""
    o = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    return (
        o.filter(F.col("o_orderstatus") == "O")
         .select(F.col("o_custkey").alias("key"))
         .union(ev.select(F.col("user_id").alias("key")))
         .distinct()
    )


@op("set_intersect", oracle="""
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
""", tier=2, section="2.7")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0) \
                                       .select(F.col("c_custkey").alias("custkey"))
    return o.intersect(c)


@op("set_except", oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
""", tier=2, section="2.7")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o).distinct()


@op("set_symmetric_diff", oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderpriority = '1-URGENT'),
     b AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderpriority = '2-HIGH')
SELECT o_custkey, 'urgent_only' AS side FROM (
    SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
UNION ALL
SELECT o_custkey, 'high_only' AS side FROM (
    SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
""", tier=2, section="2.7")
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance: customers who placed urgent
    but never high-priority orders, and vice versa — the audience-overlap
    comparison, as two EXCEPTs unioned with a side tag."""
    o = load(spark, sf_dir, "orders")
    a = (o.filter(F.col("o_orderpriority") == "1-URGENT")
          .select("o_custkey").distinct())
    b = (o.filter(F.col("o_orderpriority") == "2-HIGH")
          .select("o_custkey").distinct())
    return (
        a.exceptAll(b).withColumn("side", F.lit("urgent_only"))
         .unionByName(b.exceptAll(a).withColumn("side", F.lit("high_only")))
    )


@op("agg_topn_array", oracle="""
SELECT user_id,
       array_to_string(
           list_transform((list_sort(list(value), 'DESC'))[1:3],
                          v -> CAST(round(v * 1e6) AS BIGINT)),
           ',') AS top3_values,
       CAST(len(list(value)) AS INT) AS n_values
FROM events GROUP BY user_id
""", tier=2, section="2.4")
def agg_topn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 values per group AS AN ARRAY column — the compact leaderboard
    a feature store keeps per entity, without a second window pass:
    collect -> sort desc -> slice, all JVM array kernels after the one
    grouping shuffle. (Deterministic because the sort is on the values
    themselves.) Rendered as ','-joined integer micro-units: array columns
    crash pandas canonicalizers and float->string repr differs across
    engines, so round(v*1e6)::BIGINT joined as text is the hash-stable
    form (SURVEY.md App. A)."""
    ev = load(spark, sf_dir, "events")
    top3 = F.slice(F.sort_array(F.collect_list("value"), asc=False), 1, 3)
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.transform(
            top3, lambda v: F.round(v * 1e6).cast("long").cast("string")))
         .alias("top3_values"),
        F.size(F.collect_list("value")).alias("n_values"),
    )


@op("join_asof_tolerance", oracle="""
WITH od AS (
    SELECT o_custkey, o_orderdate,
           max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2
), matched AS (
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM events e
    ASOF LEFT JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
)
SELECT event_id, user_id, ts,
       CASE WHEN epoch_us(ts) - epoch_us(o_orderdate)
                 <= 30 * 86400000000 THEN o_orderkey END AS o_orderkey,
       CASE WHEN epoch_us(ts) - epoch_us(o_orderdate)
                 <= 30 * 86400000000 THEN o_orderdate END AS o_orderdate
FROM matched
""", tier=2, section="2.3")
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE: the latest prior order counts only if
    it is at most 30 days old — the staleness bound every real as-of has
    (a quote from last month must not price today's trade). Same
    single-shuffle union+window core; matches older than the tolerance
    are nulled, keeping every left row (pandas ``merge_asof(tolerance=)``
    semantics)."""
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    od = (o.groupBy("o_custkey", "o_orderdate")
           .agg(F.max("o_orderkey").alias("o_orderkey"))
           .select(F.col("o_custkey").alias("user_id"), "o_orderdate",
                   "o_orderkey"))
    matched = api.asof_join_backward(
        ev.select("event_id", "user_id", "ts"), od,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderkey"],
    )
    fresh = (F.unix_micros("ts") - F.unix_micros("o_orderdate")
             <= 30 * 86_400_000_000)
    return matched.select(
        "event_id", "user_id", "ts",
        F.when(fresh, F.col("o_orderkey")).alias("o_orderkey"),
        F.when(fresh, F.col("o_orderdate")).alias("o_orderdate"),
    )


@op("agg_rollup_grouping_id", oracle="""
SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN NULL
            ELSE o_orderstatus END AS o_orderstatus,
       CASE WHEN GROUPING(o_orderpriority) = 1 THEN NULL
            ELSE o_orderpriority END AS o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""", tier=2, section="2.4")
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with GROUPING_ID provenance: the bitmask that tells a
    report row apart from a genuine NULL group — 0 = detail,
    1 = per-status subtotal, 3 = grand total. Without it, subtotal rows
    are indistinguishable from NULL-valued data in any nullable
    dimension."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("sum_price"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")


@op("agg_entropy", oracle="""
WITH counts AS (
    SELECT user_id, event_type, count(*) AS c
    FROM events GROUP BY 1, 2
), tot AS (
    SELECT user_id, sum(c) AS n FROM counts GROUP BY 1
)
SELECT c.user_id,
       round(-sum((CAST(c.c AS DOUBLE) / t.n)
                  * ln(CAST(c.c AS DOUBLE) / t.n)), 6) AS type_entropy,
       count(*) AS n_types
FROM counts c JOIN tot t USING (user_id)
GROUP BY c.user_id
""", tier=2, section="2.4")
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution (nats) —
    the behavioral-diversity feature (bots look low-entropy, organic
    users high). Two aggregations sharing the user_id key; p·ln p on
    identical count ratios is identical on both engines, summed over at
    most 5 terms."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tot = counts.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        counts.join(tot, "user_id")
              .groupBy("user_id")
              .agg(F.round(-F.sum(p * F.log(p)), 6).alias("type_entropy"),
                   F.count("*").alias("n_types"))
    )


@op("join_asof_nearest", oracle="""
WITH od AS (
    SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2
), back AS (
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS bk, o.o_orderdate AS bd
    FROM events e ASOF LEFT JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
), paired AS (
    SELECT b.event_id, b.user_id, b.ts, b.bk, b.bd,
           o.o_orderkey AS fk, o.o_orderdate AS fd
    FROM back b ASOF LEFT JOIN od o
      ON b.user_id = o.o_custkey AND b.ts <= o.o_orderdate
)
SELECT event_id, user_id, ts,
       CASE WHEN bd IS NULL THEN fk
            WHEN fd IS NULL THEN bk
            WHEN epoch_us(ts) - epoch_us(bd) <= epoch_us(fd) - epoch_us(ts)
            THEN bk ELSE fk END AS nearest_orderkey,
       CASE WHEN bd IS NULL THEN fd
            WHEN fd IS NULL THEN bd
            WHEN epoch_us(ts) - epoch_us(bd) <= epoch_us(fd) - epoch_us(ts)
            THEN bd ELSE fd END AS nearest_orderdate
FROM paired
""", tier=2, section="2.3")
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: each event matched to its user's closest order in
    EITHER direction (ties to the earlier one) — the sensor-alignment
    mode pandas calls ``merge_asof(direction='nearest')``. Composed from
    the engine's backward and forward as-of primitives — two union+window
    passes on the same key partitioning — then a pure arithmetic pick;
    the oracle composes DuckDB's two native ASOF directions the same
    way."""
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    od = (o.groupBy("o_custkey", "o_orderdate")
           .agg(F.max("o_orderkey").alias("o_orderkey"))
           .select(F.col("o_custkey").alias("user_id"), "o_orderdate",
                   "o_orderkey"))
    back = api.asof_join_backward(
        ev.select("event_id", "user_id", "ts"), od,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderkey"],
    ).withColumnsRenamed({"o_orderkey": "bk", "o_orderdate": "bd"})
    both = api.asof_join_forward(
        back, od.withColumnsRenamed({"o_orderkey": "fk2",
                                     "o_orderdate": "fd2"}),
        key="user_id", left_ts="ts", right_ts="fd2",
        value_cols=["fk2"],
    )
    b_gap = F.unix_micros("ts") - F.unix_micros("bd")
    f_gap = F.unix_micros("fd2") - F.unix_micros("ts")
    pick_back = (F.col("fd2").isNull()
                 | (F.col("bd").isNotNull() & (b_gap <= f_gap)))
    return both.select(
        "event_id", "user_id", "ts",
        F.when(pick_back, F.col("bk")).otherwise(F.col("fk2"))
         .alias("nearest_orderkey"),
        F.when(pick_back, F.col("bd")).otherwise(F.col("fd2"))
         .alias("nearest_orderdate"),
    )


@op("agg_anova_decomposition", oracle="""
WITH stats AS (
    SELECT event_type, count(*) AS n,
           avg(value) AS grp_mean
    FROM events GROUP BY event_type
), grand AS (
    SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS gmean,
           count(*) AS n_total
    FROM events
), ss AS (
    SELECT round(sum(s.n * pow(s.grp_mean - g.gmean, 2)), 4) AS ss_between,
           max(g.n_total) AS n_total,
           count(*) AS k
    FROM stats s CROSS JOIN grand g
), tot AS (
    SELECT round(sum(pow(e.value - g.gmean, 2)), 4) AS ss_total
    FROM events e CROSS JOIN grand g
)
SELECT ss.ss_between,
       round(tot.ss_total - ss.ss_between, 4) AS ss_within,
       round(ss.ss_between / tot.ss_total, 6) AS eta_squared,
       CAST(ss.k AS BIGINT) AS n_groups
FROM ss CROSS JOIN tot
""", tier=3, section="2.4")
def agg_anova_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA decomposition: how much of value's variance is
    explained by event_type (SS_between / SS_within / eta-squared) — the
    does-this-dimension-matter test before modeling on it. Group stats
    and the grand mean are tiny broadcasts; the total sum of squares is
    one more pass over the facts. Rounded at 4 decimals: the SS sums run
    over 10k float squares, where summation-order ulp lives below 1e-5."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.avg("value").alias("grp_mean"))
    grand = ev.agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
         / F.count("*")).alias("gmean"),
        F.count("*").alias("n_total"))
    ss = stats.crossJoin(F.broadcast(grand)).agg(
        F.round(F.sum(F.col("n")
                      * F.pow(F.col("grp_mean") - F.col("gmean"), 2)), 4)
         .alias("ss_between"),
        F.max("n_total").alias("n_total"),
        F.count("*").alias("k"))
    tot = ev.crossJoin(F.broadcast(grand)).agg(
        F.round(F.sum(F.pow(F.col("value") - F.col("gmean"), 2)), 4)
         .alias("ss_total"))
    return ss.crossJoin(tot).select(
        "ss_between",
        F.round(F.col("ss_total") - F.col("ss_between"), 4)
         .alias("ss_within"),
        # try_divide: ss_total is 0 when every value equals the grand mean
        F.round(F.try_divide(F.col("ss_between"), F.col("ss_total")), 6)
         .alias("eta_squared"),
        F.col("k").cast("long").alias("n_groups"),
    )


@op("agg_pareto_abc", oracle="""
WITH cust AS (
    SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT o_custkey,
           CAST(s AS DOUBLE) AS total,
           CAST(SUM(s) OVER (ORDER BY s DESC, o_custkey
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(SUM(s) OVER () AS DOUBLE) AS cum_share,
           row_number() OVER (ORDER BY s DESC, o_custkey) AS rnk,
           count(*) OVER () AS n_cust
    FROM cust
)
SELECT o_custkey, total,
       round(cum_share, 6) AS cum_share,
       CASE WHEN cum_share <= 0.5 THEN 'A'
            WHEN cum_share <= 0.8 THEN 'B'
            ELSE 'C' END AS abc_class,
       round(CAST(rnk AS DOUBLE) / n_cust, 6) AS cust_pctile
FROM ranked
""", tier=2, section="2.4")
def agg_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: customers ranked by total order
    value, tagged A/B/C by cumulative-share thresholds (50%/80%) — the
    who-drives-revenue curve. Decimal-exact running and grand totals
    make every cumulative share a single identical float division; the
    ranking windows run on the customer-level aggregate, not on orders."""
    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
    w_cum = Window.orderBy(F.col("s").desc(), "o_custkey") \
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_rnk = Window.orderBy(F.col("s").desc(), "o_custkey")
    ranked = cust.select(
        "o_custkey",
        F.col("s").cast("double").alias("total"),
        (F.sum("s").over(w_cum).cast("double")
         / F.sum("s").over(w_all).cast("double")).alias("cum_share"),
        F.row_number().over(w_rnk).alias("rnk"),
        F.count("*").over(w_all).alias("n_cust"),
    )
    return ranked.select(
        "o_custkey", "total",
        F.round("cum_share", 6).alias("cum_share"),
        F.when(F.col("cum_share") <= 0.5, "A")
         .when(F.col("cum_share") <= 0.8, "B")
         .otherwise("C").alias("abc_class"),
        F.round(F.col("rnk").cast("double") / F.col("n_cust"), 6)
         .alias("cust_pctile"),
    )


@op("agg_rfm_segmentation", oracle="""
WITH per_cust AS (
    SELECT o_custkey,
           date_diff('day', CAST(max(o_orderdate) AS DATE),
                     DATE '1999-01-01') AS recency_days,
           count(*) AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
    FROM orders GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
       ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
       ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
FROM per_cust
""", tier=2, section="2.4")
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary per customer,
    each quintile-scored 1-5 (5 = best: most recent, most frequent,
    highest spend) — the workhorse customer-value model. One aggregation
    to customer grain, then three ntile windows over that small table;
    explicit key tiebreaks make the quintile edges deterministic."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(F.lit("1999-01-01").cast("date"),
                   F.max("o_orderdate").cast("date")).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
         .alias("monetary"),
    )
    return per_cust.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        F.ntile(5).over(Window.orderBy(F.col("recency_days").desc(),
                                       "o_custkey")).alias("r_score"),
        F.ntile(5).over(Window.orderBy("frequency", "o_custkey"))
         .alias("f_score"),
        F.ntile(5).over(Window.orderBy("monetary", "o_custkey"))
         .alias("m_score"),
    )


@op("agg_histogram2d", oracle="""
SELECT event_type,
       CAST(hour(ts) AS INT) AS hod,
       CAST(least(floor(value / 66.0), 4) AS BIGINT) AS value_band,
       count(*) AS n
FROM events
GROUP BY 1, 2, 3
""", tier=3, section="2.4")
def agg_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D density grid: (hour-of-day x value band) counts per event type
    — the joint-distribution heatmap behind 'when do big events happen'.
    Still ONE hash aggregation to a bounded 5x24x5 cell space; binning
    in the group key is how density estimation stays shuffle-light at
    any scale."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.least(F.floor(F.col("value") / 66.0), F.lit(4)).cast("long")
         .alias("value_band"),
    ).agg(F.count("*").alias("n"))


@op("join_market_basket", oracle="""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey % 100 AS part_bucket
    FROM lineitem
), n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
supp AS (
    SELECT part_bucket, count(*) AS s FROM items GROUP BY 1
), pairs AS (
    SELECT a.part_bucket AS p1, b.part_bucket AS p2, count(*) AS together
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.part_bucket < b.part_bucket
    GROUP BY 1, 2
)
SELECT p1, p2, together,
       round(CAST(together AS DOUBLE) * n.n
             / (CAST(s1.s AS DOUBLE) * s2.s), 6) AS lift,
       rnk
FROM (
    SELECT *, row_number() OVER (ORDER BY together DESC, p1, p2) AS rnk
    FROM pairs
) p
JOIN supp s1 ON s1.part_bucket = p.p1
JOIN supp s2 ON s2.part_bucket = p.p2
CROSS JOIN n_orders n
WHERE rnk <= 25
""", tier=3, section="2.3")
def join_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 25 most co-ordered part-bucket
    pairs with their lift (P(a,b)/P(a)P(b)) — the recommender baseline.
    Items are de-duped to (order, bucket) FIRST, so the self-join
    fan-out is (buckets per order)², bounded; supports and the order
    count are tiny broadcasts. Bucketed part keys (mod 100) stand in for
    a category dimension."""
    li = load(spark, sf_dir, "lineitem")
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 100).alias("part_bucket")
    ).distinct()
    n_orders = items.agg(
        F.countDistinct("l_orderkey").alias("n"))
    supp = items.groupBy("part_bucket").agg(F.count("*").alias("s"))
    a = items.select("l_orderkey", F.col("part_bucket").alias("p1"))
    b = items.select(F.col("l_orderkey").alias("ok2"),
                     F.col("part_bucket").alias("p2"))
    pairs = (
        a.join(b, (F.col("l_orderkey") == F.col("ok2"))
               & (F.col("p1") < F.col("p2")))
         .groupBy("p1", "p2").agg(F.count("*").alias("together"))
    )
    w = Window.orderBy(F.col("together").desc(), "p1", "p2")
    s1 = supp.select(F.col("part_bucket").alias("p1"), F.col("s").alias("s1"))
    s2 = supp.select(F.col("part_bucket").alias("p2"), F.col("s").alias("s2"))
    lift = (F.col("together").cast("double") * F.col("n")
            / (F.col("s1").cast("double") * F.col("s2")))
    return (
        pairs.withColumn("rnk", F.row_number().over(w)).filter("rnk <= 25")
             .join(F.broadcast(s1), "p1").join(F.broadcast(s2), "p2")
             .crossJoin(F.broadcast(n_orders))
             .select("p1", "p2", "together",
                     F.round(lift, 6).alias("lift"), "rnk")
    )


@op("agg_ab_proportion_test", oracle="""
WITH flagged AS (
    SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend'
                ELSE 'weekday' END AS grp,
           CAST(event_type = 'purchase' AS INT) AS converted
    FROM events
), rates AS (
    SELECT count(*) FILTER (WHERE grp = 'weekend') AS n1,
           sum(converted) FILTER (WHERE grp = 'weekend') AS x1,
           count(*) FILTER (WHERE grp = 'weekday') AS n2,
           sum(converted) FILTER (WHERE grp = 'weekday') AS x2
    FROM flagged
)
SELECT round(CAST(x1 AS DOUBLE) / n1, 6) AS p_weekend,
       round(CAST(x2 AS DOUBLE) / n2, 6) AS p_weekday,
       round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)), 6) AS z_statistic,
       CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n2 AS BIGINT) AS n_weekday
FROM rates
""", tier=3, section="2.4")
def agg_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test: does the purchase rate differ weekend vs
    weekday — the A/B-experiment readout computed as pure SQL over
    integer counts (pooled-variance z; |z| > 1.96 rejects at 5%). One
    conditional aggregation; every float op downstream runs on identical
    small integers, so both engines agree bit-for-bit before rounding."""
    ev = load(spark, sf_dir, "events")
    grp_we = F.dayofweek("ts").isin(1, 7)
    conv = (F.col("event_type") == "purchase").cast("int")
    rates = ev.select(grp_we.alias("we"), conv.alias("c")).agg(
        F.count(F.when(F.col("we"), 1)).alias("n1"),
        F.sum(F.when(F.col("we"), F.col("c"))).alias("x1"),
        F.count(F.when(~F.col("we"), 1)).alias("n2"),
        F.sum(F.when(~F.col("we"), F.col("c"))).alias("x2"),
    )
    # try_divide throughout: an empty arm (all-weekend corpus) or a
    # degenerate pooled rate (pp of 0 or 1) must yield NULL, not an ANSI
    # DIVIDE_BY_ZERO crash.
    p1 = F.try_divide(F.col("x1").cast("double"), F.col("n1"))
    p2 = F.try_divide(F.col("x2").cast("double"), F.col("n2"))
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = F.try_divide(
        p1 - p2,
        F.sqrt(pp * (1 - pp) * (F.try_divide(F.lit(1.0), F.col("n1"))
                                + F.try_divide(F.lit(1.0), F.col("n2")))))
    return rates.select(
        F.round(p1, 6).alias("p_weekend"),
        F.round(p2, 6).alias("p_weekday"),
        F.round(z, 6).alias("z_statistic"),
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("n2").cast("long").alias("n_weekday"),
    )


@op("agg_bipartite_degree", oracle="""
WITH edges AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), part_deg AS (
    SELECT l_partkey, count(*) AS suppliers_per_part FROM edges GROUP BY 1
)
SELECT suppliers_per_part AS degree,
       count(*) AS n_parts
FROM part_deg GROUP BY 1
""", tier=3, section="2.4")
def agg_bipartite_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part-supplier bipartite graph (how many
    suppliers serve each part, histogrammed) — the supply-chain
    redundancy profile, and the generic two-level degree-of-degree
    aggregation every graph summary starts with. Edge dedup + two
    hash aggregations."""
    li = load(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    part_deg = edges.groupBy("l_partkey").agg(
        F.count("*").alias("degree"))
    return part_deg.groupBy("degree").agg(F.count("*").alias("n_parts"))


@op("agg_hhi_concentration", oracle="""
WITH counts AS (
    SELECT user_id, count(*) AS c
    FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       round(CAST(sum(c * c) AS DOUBLE)
             / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)), 6) AS hhi,
       count(*) AS n_types
FROM counts GROUP BY user_id
""", tier=3, section="2.4")
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of each user's event-type mix
    (1/n_types = uniform, 1.0 = single-type) — the antitrust index
    repurposed as a behavioral-focus feature, complementing
    ``agg_entropy``'s log form. Computed in the integer-exact form
    Σc² / (Σc)² — both sums are exact longs in any summation order, so
    the single final division is bit-deterministic across runs and
    engines (the share-squared-sum form flaked on a round-6 boundary
    when partial-agg order varied) — and the per-user share window
    disappears: two hash aggregates, no window shuffle. Overflow posture
    for 100 TB (round-4 ADVICE): the numerator squares/sums in
    decimal(38,0) — exact and order-insensitive up to 1e38, where a
    long*long square dies at c≈3.03e9 under ANSI — and the denominator
    casts each exact long sum to double BEFORE multiplying (each
    conversion exact below 2^53; the product rounds once, identically in
    DuckDB). sf0.01 values are bit-identical to the all-long form."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c"))
    c_dec = F.col("c").cast("decimal(19,0)")
    return counts.groupBy("user_id").agg(
        F.round(F.sum(c_dec * c_dec).cast("double")
                / (F.sum("c").cast("double") * F.sum("c").cast("double")),
                6).alias("hhi"),
        F.count("*").alias("n_types"),
    )


@op("agg_weighted_median", oracle="""
WITH ranked AS (
    SELECT l_returnflag, l_extendedprice AS price,
           CAST(l_quantity AS DECIMAL(18,2)) AS w,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
               (PARTITION BY l_returnflag
                ORDER BY l_extendedprice, l_orderkey, l_linenumber
                ROWS UNBOUNDED PRECEDING) AS cum_w,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
               (PARTITION BY l_returnflag) AS tot_w
    FROM lineitem
)
SELECT l_returnflag,
       min(price) AS weighted_median_price
FROM ranked
WHERE CAST(cum_w AS DOUBLE) >= CAST(tot_w AS DOUBLE) / 2
GROUP BY l_returnflag
""", tier=3, section="2.4")
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median price per return flag: the price at which
    half the total quantity sits below — the robust center the plain
    median misses when rows carry different weights. Decimal-exact
    cumulative and total weights make the crossing threshold identical;
    min(price) over the crossed region picks the boundary row
    deterministically.

    Round 5: the cumulative weight rides the grouped two-phase running
    sum (3 return flags make each per-flag partition a third of the
    table — the SCALE.md low-cardinality hazard class), and the total
    weight is a 3-row broadcast aggregate instead of an unordered
    partition window (which buffers the whole partition). Same oracle,
    value-identical."""
    from ..api import bucketed_running_sum

    li = load(spark, sf_dir, "lineitem")
    wdec = F.col("l_quantity").cast("decimal(18,2)")
    tot = li.groupBy("l_returnflag").agg(F.sum(wdec).alias("tot_w"))
    ranked = bucketed_running_sum(
        li.select("l_returnflag", F.col("l_extendedprice").alias("price"),
                  "l_orderkey", "l_linenumber", wdec.alias("wd")),
        F.floor(F.col("price") / 100).cast("long"),
        [F.col("price"), F.col("l_orderkey"), F.col("l_linenumber")],
        F.col("wd"), out_name="cum_w", group_cols=["l_returnflag"])
    return (ranked.join(F.broadcast(tot), "l_returnflag")
                  .filter(F.col("cum_w").cast("double")
                          >= F.col("tot_w").cast("double") / 2)
                  .groupBy("l_returnflag")
                  .agg(F.min("price").alias("weighted_median_price")))


@op("agg_iqr_fences", oracle="""
WITH q AS (
    SELECT event_type,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       round(q.q1, 6) AS q1, round(q.q3, 6) AS q3,
       round(q.q3 - q.q1, 6) AS iqr,
       round(q.q1 - 1.5 * (q.q3 - q.q1), 6) AS lower_fence,
       round(q.q3 + 1.5 * (q.q3 - q.q1), 6) AS upper_fence,
       count(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                    OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                  THEN 1 END) AS n_outliers
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type, q.q1, q.q3
""", tier=2, section="2.4")
def agg_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey box-plot fences per event type: Q1/Q3/IQR, the 1.5-IQR
    whisker bounds, and the outlier count beyond them — the third
    robust-outlier vocabulary next to z-score (``ts_anomaly_zscore``)
    and MAD (``ts_outlier_mad``). Exact interpolated quartiles broadcast
    back onto the facts for the fence count."""
    ev = load(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return ev.join(F.broadcast(q), "event_type") \
        .groupBy("event_type", "q1", "q3").agg(
            F.count(F.when((F.col("value") < lo) | (F.col("value") > hi), 1))
             .alias("n_outliers"),
        ).select(
            "event_type",
            F.round("q1", 6).alias("q1"), F.round("q3", 6).alias("q3"),
            F.round(iqr, 6).alias("iqr"),
            F.round(lo, 6).alias("lower_fence"),
            F.round(hi, 6).alias("upper_fence"),
            "n_outliers",
        )


@op("join_interval_overlap_pairs", oracle="""
SELECT a.o_custkey,
       a.o_orderkey AS order1, b.o_orderkey AS order2,
       a.o_orderdate AS date1, b.o_orderdate AS date2,
       CAST(date_diff('day', CAST(a.o_orderdate AS DATE),
                      CAST(b.o_orderdate AS DATE)) AS BIGINT) AS gap_days
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
""", tier=2, section="2.3")
def join_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-customer order pairs placed within 7 days of each other — the
    rapid-repeat detector (split shipments, double submissions, fraud
    bursts). A SELF range join that stays scalable because the customer
    key is an equi conjunct: hash join on o_custkey with the week window
    as a residual, never a nested loop; per-customer order counts bound
    the pair fan-out."""
    o = load(spark, sf_dir, "orders")
    a = o.select(F.col("o_custkey").alias("ck"),
                 F.col("o_orderkey").alias("order1"),
                 F.col("o_orderdate").alias("date1"))
    b = o.select(F.col("o_custkey").alias("ck2"),
                 F.col("o_orderkey").alias("order2"),
                 F.col("o_orderdate").alias("date2"))
    return (
        a.join(b, (F.col("ck") == F.col("ck2"))
               & (F.col("order1") < F.col("order2"))
               & (F.col("date2") >= F.col("date1"))
               & (F.col("date2") < F.expr("date1 + INTERVAL 7 DAYS")))
         .select(F.col("ck").alias("o_custkey"), "order1", "order2",
                 "date1", "date2",
                 F.datediff(F.col("date2").cast("date"),
                            F.col("date1").cast("date")).cast("long")
                  .alias("gap_days"))
    )


@op("agg_pagerank_bipartite", oracle="""
WITH pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), edges AS (
    SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM pairs
    UNION ALL
    SELECT 's' || l_suppkey, 'p' || l_partkey FROM pairs
), nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
r1 AS (SELECT e.dst AS node, 0.15 / max(nn.n) +
              0.85 * (sum(CAST(floor(r.rank / d.outdeg * 1e12) AS BIGINT))
                      / 1e12) AS rank
       FROM edges e JOIN r0 r ON r.node = e.src
       JOIN deg d ON d.src = e.src CROSS JOIN nn GROUP BY e.dst),
r2 AS (SELECT e.dst AS node, 0.15 / max(nn.n) +
              0.85 * (sum(CAST(floor(r.rank / d.outdeg * 1e12) AS BIGINT))
                      / 1e12) AS rank
       FROM edges e JOIN r1 r ON r.node = e.src
       JOIN deg d ON d.src = e.src CROSS JOIN nn GROUP BY e.dst),
r3 AS (SELECT e.dst AS node, 0.15 / max(nn.n) +
              0.85 * (sum(CAST(floor(r.rank / d.outdeg * 1e12) AS BIGINT))
                      / 1e12) AS rank
       FROM edges e JOIN r2 r ON r.node = e.src
       JOIN deg d ON d.src = e.src CROSS JOIN nn GROUP BY e.dst)
SELECT node, pr, rnk FROM (
    SELECT node, round(rank, 6) AS pr,
           row_number() OVER (ORDER BY round(rank, 6) DESC, node) AS rnk
    FROM r3
) WHERE rnk <= 50
""", tier=3, section="2.4")
def agg_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed power iterations, damping 0.85) over the
    part<->supplier bipartite graph — the second iterative algorithm of
    the suite beside connected components, and unlike open-ended CC it
    is EXACTLY value-oracle-able because the iteration count is fixed
    (the DuckDB oracle chains the same three iterations as CTEs).
    Per iteration: one join of the edge list against the current ranks +
    one aggregate on the destination — the edge list partitions on the
    source key, ranks are node-sized. The driver-side loop is over
    ITERATIONS (distributed work inside), never rows; ranks round to 6
    before the top-50 cut so the ordering decision is cross-engine
    identical.

    Determinism (round-4 ADVICE): a plain double ``sum(rank/outdeg)``
    depends on partial-agg order, so a value near a round-6 boundary
    could flip between runs or engines — the flake class the HHI fix
    (commit 2f35bbe) removed. Same cure here: each contribution is
    floored onto a 1e-12 fixed-point grid (``floor(rank/outdeg * 1e12)``
    — the inputs are bit-identical IEEE doubles in both engines, so the
    floored long is too), and the per-node SUM is over exact longs —
    order-invariant, no overflow (inflow ≤ total rank mass 1 → sum ≤
    1e12). The ≤1e-12-per-edge truncation is noise at the 6-dp output
    grid; what it buys is bit-equal ranks on every run of every engine."""
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    p = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = (pairs.select(p.alias("src"), s.alias("dst"))
                  .unionByName(pairs.select(s.alias("src"), p.alias("dst"))))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank"))
    for _ in range(3):
        contrib = (edges.join(ranks, edges.src == ranks.node)
                        .join(deg, "src")
                        .groupBy(F.col("dst").alias("node"))
                        .agg(F.sum(F.floor(F.col("rank") / F.col("outdeg")
                                           * F.lit(1e12)))
                              .alias("inflow_fx")))
        ranks = contrib.crossJoin(F.broadcast(n_nodes)).select(
            "node",
            (F.lit(0.15) / F.col("n")
             + F.lit(0.85) * (F.col("inflow_fx") / F.lit(1e12)))
            .alias("rank"))
    # No cache/checkpoint needed: the three iterations unroll into ONE
    # lazy plan whose repeated edge-list shuffles AQE reuses at runtime
    # (measured: no persistent RDDs, 0.16 s warm at sf0.01).
    w = Window.orderBy(F.col("pr").desc(), "node")
    return (ranks.select("node", F.round("rank", 6).alias("pr"))
                 .withColumn("rnk", F.row_number().over(w))
                 .filter("rnk <= 50"))


@op("dim_scd2_upsert", oracle="""
WITH changes AS (   -- deterministic change batch synthesized from orders:
                    -- each customer's latest order re-prices their balance
    SELECT o_custkey AS c_custkey,
           max_by(o_totalprice, o_orderkey) AS new_acctbal,
           CAST(max(o_orderdate) AS TIMESTAMP) AS eff_ts
    FROM orders GROUP BY o_custkey
), changed AS (
    SELECT c.c_custkey, c.c_name, c.c_acctbal, ch.new_acctbal, ch.eff_ts
    FROM customer c JOIN changes ch USING (c_custkey)
    WHERE ch.new_acctbal <> c.c_acctbal
)
SELECT c_custkey, c_name, c_acctbal AS acctbal,
       TIMESTAMP '1992-01-01' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, 1 AS is_current
FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, c_name, c_acctbal,
       TIMESTAMP '1992-01-01', eff_ts, 0
FROM changed
UNION ALL
SELECT c_custkey, c_name, new_acctbal,
       eff_ts, CAST(NULL AS TIMESTAMP), 1
FROM changed
""", tier=3, section="2.3")
def dim_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 upsert WITHOUT a MERGE-capable
    table format: the anti-join + union emulation (close the old
    version with valid_to = effective ts, append the new version as
    current, pass unchanged rows through). The change batch is
    synthesized deterministically from orders (each customer's latest
    order re-prices their balance), so the whole maintenance operation
    is value-oracled. At 100 TB this is the nightly dimension-merge
    job; the changes side is customer-keyed and orders of magnitude
    smaller than the fact history, so it broadcasts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    changes = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max_by("o_totalprice", "o_orderkey").alias("new_acctbal"),
        F.max("o_orderdate").cast("timestamp").alias("eff_ts"))
    changed = (c.join(F.broadcast(changes), "c_custkey")
                .filter(F.col("new_acctbal") != F.col("c_acctbal")))
    epoch = F.lit("1992-01-01").cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")
    unchanged = (c.join(F.broadcast(changed.select("c_custkey")),
                        "c_custkey", "left_anti")
                  .select("c_custkey", "c_name",
                          F.col("c_acctbal").alias("acctbal"),
                          epoch.alias("valid_from"),
                          null_ts.alias("valid_to"),
                          F.lit(1).alias("is_current")))
    closed = changed.select(
        "c_custkey", "c_name", F.col("c_acctbal").alias("acctbal"),
        epoch.alias("valid_from"), F.col("eff_ts").alias("valid_to"),
        F.lit(0).alias("is_current"))
    current = changed.select(
        "c_custkey", "c_name", F.col("new_acctbal").alias("acctbal"),
        F.col("eff_ts").alias("valid_from"), null_ts.alias("valid_to"),
        F.lit(1).alias("is_current"))
    return unchanged.unionByName(closed).unionByName(current)


@op("agg_ols_two_feature", oracle="""
WITH mom AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(SUM(hour(ts)) AS DOUBLE) AS s1,
           CAST(SUM(isodow(ts)) AS DOUBLE) AS s2,
           CAST(SUM(hour(ts) * hour(ts)) AS DOUBLE) AS s11,
           CAST(SUM(hour(ts) * isodow(ts)) AS DOUBLE) AS s12,
           CAST(SUM(isodow(ts) * isodow(ts)) AS DOUBLE) AS s22,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(SUM(hour(ts) * CAST(value AS DECIMAL(18,2)))
                AS DOUBLE) AS s1y,
           CAST(SUM(isodow(ts) * CAST(value AS DECIMAL(18,2)))
                AS DOUBLE) AS s2y,
           CAST(SUM(CAST(value AS DECIMAL(18,2))
                    * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS syy
    FROM events GROUP BY event_type
), sol AS (
    SELECT event_type, n, sy, s1y, s2y, syy,
           n * (s11 * s22 - s12 * s12)
             - s1 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s12 - s11 * s2) AS det,
           sy * (s11 * s22 - s12 * s12)
             - s1 * (s1y * s22 - s12 * s2y)
             + s2 * (s1y * s12 - s11 * s2y) AS det0,
           n * (s1y * s22 - s12 * s2y)
             - sy * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s2y - s1y * s2) AS det1,
           n * (s11 * s2y - s1y * s12)
             - s1 * (s1 * s2y - s1y * s2)
             + sy * (s1 * s12 - s11 * s2) AS det2
    FROM mom
)
SELECT event_type,
       round(det0 / det, 6) AS b0,
       round(det1 / det, 6) AS b_hour,
       round(det2 / det, 6) AS b_dow,
       round(1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                        - (det2 / det) * s2y)
                   / (syy - sy * sy / n), 6) AS r2
FROM sol
""", tier=3, section="2.4")
def agg_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple regression, distributed: fit
    value ~ b0 + b_hour·hour(ts) + b_dow·isodow(ts) per event type by
    solving the 3x3 normal equations from ONE aggregation pass of
    moments — no gradient steps, no iteration, no driver math. The
    moment pass is map-side-combinable and order-invariant by
    construction: integer features make Σx, Σx² exact longs and the
    y-moments sum in DECIMAL (2-decimal corpus), each cast to double
    once; the Cramer determinants are then identical IEEE polynomial
    evaluations in both engines, so coefficients and R² match on the
    rounding grid without tolerance. The scalable shape for fitting
    millions of per-group models: one shuffle, 11 aggregates, closed
    form."""
    ev = load(spark, sf_dir, "events")
    h = F.hour("ts").cast("long")
    # ISO day-of-week (1=Mon..7=Sun) matches DuckDB's isodow
    iso = F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("long")
    y = F.col("value").cast("decimal(18,2)")
    mom = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(h).cast("double").alias("s1"),
        F.sum(iso).cast("double").alias("s2"),
        F.sum(h * h).cast("double").alias("s11"),
        F.sum(h * iso).cast("double").alias("s12"),
        F.sum(iso * iso).cast("double").alias("s22"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(h * y).cast("double").alias("s1y"),
        F.sum(iso * y).cast("double").alias("s2y"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y, syy = (F.col("sy"), F.col("s1y"), F.col("s2y"),
                         F.col("syy"))
    det = (n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    det0 = (sy * (s11 * s22 - s12 * s12)
            - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y))
    det1 = (n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2))
    det2 = (n * (s11 * s2y - s1y * s12)
            - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2))
    sse = syy - (det0 / det) * sy - (det1 / det) * s1y \
        - (det2 / det) * s2y
    sst = syy - sy * sy / n
    return mom.select(
        "event_type",
        F.round(det0 / det, 6).alias("b0"),
        F.round(det1 / det, 6).alias("b_hour"),
        F.round(det2 / det, 6).alias("b_dow"),
        F.round(F.lit(1.0) - sse / sst, 6).alias("r2"))


#: KMV sketch size: estimate uses the k-th smallest hash.
_KMV_K = 64


@op("agg_kmv_distinct", oracle=f"""
WITH hashed AS (
    SELECT DISTINCT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS hv
    FROM events
), ranked AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv) AS r,
           count(*) OVER (PARTITION BY event_type) AS n_exact
    FROM hashed
)
SELECT event_type,
       CAST(n_exact AS BIGINT) AS n_exact,
       CASE WHEN n_exact <= {_KMV_K} THEN CAST(n_exact AS DOUBLE)
            ELSE round(({_KMV_K} - 1) * 4294967296.0 / hv, 6) END
           AS kmv_estimate,
       round(abs(CASE WHEN n_exact <= {_KMV_K} THEN CAST(n_exact AS DOUBLE)
                      ELSE ({_KMV_K} - 1) * 4294967296.0 / hv END
                 - n_exact) / n_exact, 6) AS rel_error
FROM ranked
WHERE r = least(CAST({_KMV_K} AS BIGINT), n_exact)
""", tier=3, section="2.4")
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count estimation via a K-Minimum-Values sketch
    (Bar-Yossef et al. 2002, public): distinct users per event type
    estimated as (k−1)/h_(k) with k = 64, where h_(k) is the k-th
    smallest value of a uniform hash of the key. Unlike HLL (whose
    register layout is engine-private — our ``agg_approx_distinct``
    is rows-only for exactly that reason), KMV over the PORTABLE md5
    draw is deterministic, so the sketch, its estimate AND its measured
    relative error are all fully value-oracled cross-engine — an
    approximate operator with an exact contract.

    Scale shape: the k smallest hashes per group are a bounded-size,
    MERGEABLE summary (union = k smallest of the union), i.e. the
    map-side-combinable architecture every distributed distinct-count
    sketch uses; groups at or under k report exactly."""
    ev = load(spark, sf_dir, "events")
    hv = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10).cast("long")
    hashed = (ev.select("event_type", hv.alias("hv")).distinct())
    w_r = Window.partitionBy("event_type").orderBy("hv")
    w_n = Window.partitionBy("event_type")
    ranked = hashed.select(
        "event_type", "hv",
        F.row_number().over(w_r).alias("r"),
        F.count("*").over(w_n).alias("n_exact"))
    est = F.when(F.col("n_exact") <= _KMV_K,
                 F.col("n_exact").cast("double")) \
           .otherwise((_KMV_K - 1) * F.lit(4294967296.0) / F.col("hv"))
    return (ranked.filter(F.col("r") == F.least(F.lit(_KMV_K).cast("long"),
                                                F.col("n_exact")))
                  .select("event_type", "n_exact",
                          F.round(est, 6).alias("kmv_estimate"),
                          F.round(F.abs(est - F.col("n_exact"))
                                  / F.col("n_exact"), 6)
                           .alias("rel_error")))


@op("agg_kmv_overlap", oracle=f"""
WITH hashed AS (
    SELECT DISTINCT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS hv
    FROM events
), types AS (SELECT DISTINCT event_type FROM hashed),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b
    FROM types a JOIN types b ON a.event_type < b.event_type
), u AS (   -- distinct union hashes per pair
    SELECT DISTINCT p.type_a, p.type_b, h.hv
    FROM pairs p JOIN hashed h
      ON h.event_type = p.type_a OR h.event_type = p.type_b
), union_k AS (   -- k smallest of the union = merged KMV sketch
    SELECT type_a, type_b, hv FROM (
        SELECT type_a, type_b, hv,
               row_number() OVER (PARTITION BY type_a, type_b
                                  ORDER BY hv) AS r
        FROM u) q WHERE r <= {_KMV_K}
), marked AS (
    SELECT k.type_a, k.type_b,
           CASE WHEN ha.hv IS NOT NULL AND hb.hv IS NOT NULL
                THEN 1 ELSE 0 END AS in_both
    FROM union_k k
    LEFT JOIN hashed ha ON ha.event_type = k.type_a AND ha.hv = k.hv
    LEFT JOIN hashed hb ON hb.event_type = k.type_b AND hb.hv = k.hv
), est AS (
    SELECT type_a, type_b,
           round(CAST(SUM(in_both) AS DOUBLE) / count(*), 6)
               AS jaccard_est
    FROM marked GROUP BY 1, 2
), inter AS (
    SELECT p.type_a, p.type_b, count(*) AS n_inter
    FROM pairs p
    JOIN hashed ha ON ha.event_type = p.type_a
    JOIN hashed hb ON hb.event_type = p.type_b AND hb.hv = ha.hv
    GROUP BY 1, 2
), uni AS (
    SELECT type_a, type_b, count(*) AS n_union FROM u GROUP BY 1, 2
), exact AS (
    SELECT un.type_a, un.type_b,
           round(CAST(coalesce(i.n_inter, 0) AS DOUBLE) / un.n_union, 6)
               AS jaccard_exact
    FROM uni un LEFT JOIN inter i USING (type_a, type_b)
)
SELECT e.type_a, e.type_b, e.jaccard_est, x.jaccard_exact,
       round(abs(e.jaccard_est - x.jaccard_exact), 6) AS abs_err
FROM est e JOIN exact x USING (type_a, type_b)
""", tier=3, section="2.4")
def agg_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from MERGED KMV sketches: for every
    pair of event types, union the two per-type sketches (k smallest of
    the union — exactly how KMV merges), count how many of those k
    hashes appear in BOTH sets, and estimate Jaccard = hits/k
    (Bar-Yossef et al. 2002; the theta-sketch set-operation recipe).
    This demonstrates the property that makes sketches the 100 TB
    answer: overlap of ARBITRARY set pairs from bounded per-set
    summaries, no re-scan of the raw data. The portable md5 draw keeps
    the whole computation — sketch, estimate, and its error vs the
    exact Jaccard (computed alongside) — value-oracled cross-engine.
    (This dense test corpus has every user active in every event type,
    so every pair truthfully reports Jaccard 1.0 — the estimator's
    arithmetic is still fully exercised and oracle-checked.)

    Plan discipline (the actual sketch story): the per-type KMV
    sketches (k smallest hashes per type — a BOUNDED k·|types| rowset)
    are extracted first, and every pairwise step downstream touches
    only sketches via broadcast equi-joins. This is value-identical to
    unioning the full hash sets because a hash among the k smallest of
    A∪B is ≤ both sets' own k-th smallest, hence inside both sketches'
    retained range — the theta-sketch correctness property. Only the
    exact-Jaccard verification columns (the honesty extra an estimator
    ships) re-touch the full hash sets, via equi-joins."""
    ev = load(spark, sf_dir, "events")
    hv = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10).cast("long")
    hashed = ev.select("event_type", hv.alias("hv")).distinct()
    w_t = Window.partitionBy("event_type").orderBy("hv")
    sk = (hashed.withColumn("r", F.row_number().over(w_t))
                .filter(F.col("r") <= _KMV_K)
                .select("event_type", "hv"))   # bounded: k per type
    types = hashed.select("event_type").distinct()
    pairs = (types.select(F.col("event_type").alias("type_a"))
                  .join(types.select(F.col("event_type").alias("type_b")),
                        F.col("type_a") < F.col("type_b")))
    sk_a = sk.withColumnRenamed("event_type", "type_a")
    sk_b = sk.withColumnRenamed("event_type", "type_b")
    u = (pairs.join(F.broadcast(sk_a), "type_a")
              .select("type_a", "type_b", "hv")
              .unionByName(pairs.join(F.broadcast(sk_b), "type_b")
                                .select("type_a", "type_b", "hv"))
              .distinct())
    w = Window.partitionBy("type_a", "type_b").orderBy("hv")
    union_k = u.withColumn("r", F.row_number().over(w)) \
               .filter(F.col("r") <= _KMV_K)
    ha = sk_a.withColumn("in_a", F.lit(1))
    hb = sk_b.withColumn("in_b", F.lit(1))
    marked = (union_k.join(F.broadcast(ha), ["type_a", "hv"], "left")
                     .join(F.broadcast(hb), ["type_b", "hv"], "left")
                     .select("type_a", "type_b",
                             ((F.col("in_a").isNotNull())
                              & (F.col("in_b").isNotNull()))
                             .cast("int").alias("in_both")))
    est = marked.groupBy("type_a", "type_b").agg(
        F.round(F.sum("in_both").cast("double") / F.count("*"), 6)
         .alias("jaccard_est"))
    fa = hashed.withColumnRenamed("event_type", "type_a")
    fb = hashed.withColumnRenamed("event_type", "type_b")
    both = (pairs.join(fa, "type_a").join(fb, ["type_b", "hv"], "left_semi")
                 .groupBy("type_a", "type_b")
                 .agg(F.count_distinct("hv").alias("n_inter")))
    ua = (pairs.join(fa, "type_a").select("type_a", "type_b", "hv")
               .unionByName(pairs.join(fb, "type_b")
                                 .select("type_a", "type_b", "hv"))
               .groupBy("type_a", "type_b")
               .agg(F.count_distinct("hv").alias("n_union")))
    exact = (ua.join(both, ["type_a", "type_b"], "left")
               .select("type_a", "type_b",
                       F.round(F.coalesce(F.col("n_inter"), F.lit(0))
                               .cast("double") / F.col("n_union"), 6)
                        .alias("jaccard_exact")))
    out = (est.join(exact, ["type_a", "type_b"])
              .select("type_a", "type_b", "jaccard_est", "jaccard_exact",
                      F.round(F.abs(F.col("jaccard_est")
                                    - F.col("jaccard_exact")), 6)
                       .alias("abs_err")))
    return out


# --------------------------------------------------------------------------
# Count-Min Sketch + Poisson bootstrap (round 4) — like the KMV family
# above, approximate/statistical machinery whose PORTABLE md5 randomness
# makes the whole construction value-oracle-able cross-engine.
# --------------------------------------------------------------------------

_CMS_D = 4    # hash rows
_CMS_W = 64   # buckets per row


@op("agg_cms_heavy_hitters", oracle=f"""
WITH uc AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY user_id
), cells AS (     -- the d x w sketch: every key folds into d cells
    SELECT t.i AS row,
           ('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':'
                               || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {_CMS_W} AS bucket,
           CAST(sum(c) AS BIGINT) AS cell
    FROM uc CROSS JOIN range(0, {_CMS_D}) t(i)
    GROUP BY 1, 2
), est AS (       -- point query: min over the key's d cells
    SELECT uc.user_id, uc.c, min(cells.cell) AS est
    FROM uc CROSS JOIN range(0, {_CMS_D}) t(i)
    JOIN cells
      ON cells.row = t.i
     AND cells.bucket = ('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':'
                             || CAST(uc.user_id AS VARCHAR)), 1, 8))::BIGINT
                        % {_CMS_W}
    GROUP BY 1, 2
)
SELECT user_id, c AS n_exact, est AS cms_est,
       est - c AS overestimate
FROM est
QUALIFY row_number() OVER (ORDER BY est DESC, user_id) <= 15
""", tier=3, section="2.4")
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a Count-Min Sketch (Cormode & Muthukrishnan
    2005, public): a {_CMS_D}x{_CMS_W} counter grid; every key adds its
    count to one bucket per row (portable md5 bucket choice), a point
    query reads the MIN of its d cells — an overestimate, never an
    under-estimate (`overestimate` >= 0 by construction, asserted in
    tests). Top-15 users by estimated event count, with the exact count
    and the collision error alongside — the sketch-accuracy audit a
    production rollout needs.

    Scale shape: the sketch is a CONSTANT 256 cells regardless of key
    cardinality, built with one hash aggregation (the per-key pre-agg IS
    map-side combine; cells are mergeable by addition, so executors
    combine locally and ship 256 partials). The point-query join
    broadcasts those 256 cells — no shuffle of the key table. Because
    the md5 bucket choice is engine-portable, sketch contents, estimates
    AND errors are all exactly value-oracled (HLL/native CMS register
    layouts never are)."""
    ev = load(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count("*").alias("c"))

    def bucket(i):
        return (F.conv(F.substring(F.md5(F.concat(
            F.lit(f"{i}:"), F.col("user_id").cast("string"))), 1, 8),
            16, 10).cast("long") % _CMS_W)

    folded = uc.select(
        "user_id", "c",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"), bucket(i).alias("bucket"))
            for i in range(_CMS_D)])).alias("cell_key")
    ).select("user_id", "c", "cell_key.row", "cell_key.bucket")
    cells = folded.groupBy("row", "bucket").agg(F.sum("c").alias("cell"))
    est = (folded.join(F.broadcast(cells), ["row", "bucket"])
                 .groupBy("user_id", "c")
                 .agg(F.min("cell").alias("est")))
    # Global top-15 via orderBy+limit -> TakeOrderedAndProject (each
    # partition keeps 15, driver merges 15*P) — NOT a row_number over an
    # unpartitioned window, which would sort every user in one task.
    return (est.orderBy(F.col("est").desc(), "user_id").limit(15)
               .select("user_id", F.col("c").alias("n_exact"),
                       F.col("est").alias("cms_est"),
                       (F.col("est") - F.col("c")).alias("overestimate")))


#: Poisson(1) CDF thresholds on the 2^32 hash grid: u < _POIS_T[k] -> draw
#: k (else 5). Integer literals, so the bootstrap weights are an exact
#: integer function of the portable hash in BOTH engines — no float CDF.
_POIS_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373)
_BOOT_B = 32  # bootstrap replicas


@op("agg_poisson_bootstrap_ci", oracle=f"""
WITH hashed AS (  -- portable md5 draw per (row, replica)
    SELECT event_type,
           CAST(value AS DECIMAL(18,2)) AS v,
           b.b AS b,
           ('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':'
                || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS u
    FROM events CROSS JOIN range(0, {_BOOT_B}) b(b)
), w AS (         -- Poisson(1) weight by inverse-CDF on the hash grid
    SELECT event_type, b, v,
           CASE
             WHEN u < {_POIS_T[0]} THEN 0 WHEN u < {_POIS_T[1]} THEN 1
             WHEN u < {_POIS_T[2]} THEN 2 WHEN u < {_POIS_T[3]} THEN 3
             WHEN u < {_POIS_T[4]} THEN 4 ELSE 5 END AS wt
    FROM hashed
), rep AS (       -- one weighted mean per (event_type, replica)
    SELECT event_type, b,
           CAST(sum(v * wt) AS DOUBLE) / sum(wt) AS m
    FROM w GROUP BY 1, 2
    HAVING sum(wt) > 0
), ranked AS (
    SELECT event_type, b, m,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY m, b) AS r,
           count(*) OVER (PARTITION BY event_type) AS nb
    FROM rep
), pt AS (
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS mean_v,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
)
SELECT p.event_type, p.n, round(p.mean_v, 6) AS mean_v,
       round(lo.m, 6) AS ci_lo, round(hi.m, 6) AS ci_hi
FROM pt p
JOIN ranked lo ON lo.event_type = p.event_type AND lo.r = 2
JOIN ranked hi ON hi.event_type = p.event_type AND hi.r = hi.nb - 1
""", tier=3, section="2.4")
def agg_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean event value per type,
    via the POISSON bootstrap (Hanley & MacGibbon 2006; the distributed
    bootstrap used at scale because classic resampling needs global row
    indexing): each row independently enters replica b with weight ~
    Poisson(1), drawn by inverting the CDF on the portable md5 hash of
    (replica, event_id). 32 replicas; the CI is the [2nd smallest, 2nd
    largest] replica mean — pure order statistics, no interpolated
    percentile semantics to disagree on cross-engine.

    Determinism: weights are an integer function of integer hash
    thresholds (no float CDF at query time); each replica mean is ONE
    division of a decimal-exact weighted sum by an integer weight total,
    so every replica mean is bit-identical in both engines and at any
    parallelism. Scale shape: the replica explode is map-side (narrow),
    partial aggregation combines (event_type, b) locally before the one
    shuffle; B is a constant multiplier, never a data-sized join."""
    ev = load(spark, sf_dir, "events")
    rep0 = ev.select("event_type", "event_id",
                     F.col("value").cast("decimal(18,2)").alias("v"),
                     F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1)))
                      .alias("b"))
    u = F.conv(F.substring(F.md5(F.concat(
        F.col("b").cast("string"), F.lit(":"),
        F.col("event_id").cast("string"))), 1, 8), 16, 10).cast("long")
    wt = (F.when(u < _POIS_T[0], 0).when(u < _POIS_T[1], 1)
           .when(u < _POIS_T[2], 2).when(u < _POIS_T[3], 3)
           .when(u < _POIS_T[4], 4).otherwise(5))
    rep = (rep0.select("event_type", "b", "v", wt.alias("wt"))
               .groupBy("event_type", "b")
               .agg(F.sum(F.col("v") * F.col("wt")).alias("sv"),
                    F.sum("wt").alias("sw"))
               .filter(F.col("sw") > 0)
               .select("event_type", "b",
                       (F.col("sv").cast("double") / F.col("sw"))
                       .alias("m")))
    wr = Window.partitionBy("event_type").orderBy("m", "b")
    wn = Window.partitionBy("event_type")
    ranked = rep.select("event_type", "b", "m",
                        F.row_number().over(wr).alias("r"),
                        F.count("*").over(wn).alias("nb"))
    pt = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
         / F.count("*")).alias("mean_v"))
    lo = ranked.filter(F.col("r") == 2).select(
        "event_type", F.col("m").alias("lo_m"))
    hi = ranked.filter(F.col("r") == F.col("nb") - 1).select(
        "event_type", F.col("m").alias("hi_m"))
    return (pt.join(lo, "event_type").join(hi, "event_type")
              .select("event_type", "n", F.round("mean_v", 6).alias("mean_v"),
                      F.round("lo_m", 6).alias("ci_lo"),
                      F.round("hi_m", 6).alias("ci_hi")))


_TRI_SUPPORT = 2  # an edge needs >= 2 co-occurring orders (hub guard)


@op("agg_triangle_count", oracle=f"""
WITH op AS (      -- distinct (order, part) incidences
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (     -- co-purchase edges, oriented a < b, support-filtered
    SELECT a.p AS a, b.p AS b
    FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
    HAVING count(*) >= {_TRI_SUPPORT}
), deg AS (       -- undirected degree per node
    SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
    ) GROUP BY node
), tri AS (       -- oriented wedge join + closing-edge check: each
                  -- triangle a<b<c counted exactly once
    SELECT count(*) AS t
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b          -- wedge a<b<c
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
), wedges AS (    -- all center-counted wedges: sum C(d,2)
    SELECT sum(d * (d - 1) / 2) AS w FROM deg
)
SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST(w.w AS BIGINT) AS n_wedges,
       CAST(t.t AS BIGINT) AS n_triangles,
       round(CASE WHEN w.w > 0 THEN 3.0 * t.t / w.w ELSE 0.0 END, 6)
           AS clustering_coeff
FROM tri t, wedges w
""", tier=3, section="2.4")
def agg_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the co-purchase
    graph (parts connected when >= 2 orders contain both). The classic
    oriented-wedge algorithm (Schank & Wagner 2005, public): orient every
    edge low-id -> high-id, join wedges a<b<c on the shared middle, then
    close each wedge against the edge list — every triangle materializes
    exactly once, no /6 correction, no symmetric blow-up.

    Scale shape: all equi-joins on node keys (hash-partitionable); the
    support>=2 filter is the hub guard that keeps one mega-popular part
    from quadratic pair fan-out (same role as the high-df shingle cap in
    the dedup family), and at true scale the orientation key would be
    (degree, id) so every wedge center is the LOWEST-degree endpoint —
    the standard trick that bounds per-node wedge work. Clustering
    coefficient = 3*triangles / sum-of-C(deg,2) wedges, one double
    division at the end."""
    li = load(spark, sf_dir, "lineitem")
    op_ = li.select(F.col("l_orderkey").alias("o"),
                    F.col("l_partkey").alias("p")).distinct()
    a = op_.select("o", F.col("p").alias("pa"))
    b = op_.select(F.col("o").alias("o2"), F.col("p").alias("pb"))
    edges = (a.join(b, (F.col("o") == F.col("o2"))
                    & (F.col("pa") < F.col("pb")))
              .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
              .agg(F.count("*").alias("sup"))
              .filter(F.col("sup") >= _TRI_SUPPORT)
              .select("a", "b"))
    deg = (edges.select(F.col("a").alias("node"))
                .unionByName(edges.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count("*").alias("d")))
    e1 = edges
    e2 = edges.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (e1.join(e2, F.col("b") == F.col("b2"))
             .join(e3, (F.col("a") == F.col("a3"))
                   & (F.col("c") == F.col("c3")))
             .agg(F.count("*").alias("t")))
    wed = deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
    counts = edges.agg(F.count("*").alias("n_edges"))
    nodes = deg.agg(F.count("*").alias("n_nodes"))
    return (counts.crossJoin(F.broadcast(nodes))
                  .crossJoin(F.broadcast(wed))
                  .crossJoin(F.broadcast(tri))
                  .select(F.col("n_edges").cast("long").alias("n_edges"),
                          F.col("n_nodes").cast("long").alias("n_nodes"),
                          F.col("w").cast("long").alias("n_wedges"),
                          F.col("t").cast("long").alias("n_triangles"),
                          F.round(F.when(F.col("w") > 0,
                                         3.0 * F.col("t") / F.col("w"))
                                   .otherwise(0.0), 6)
                           .alias("clustering_coeff")))


_PAGE_SIZE = 50


@op("page_keyset", oracle=f"""
WITH anchor AS (  -- last row of page 2 = the keyset cursor
    SELECT ts, event_id FROM events
    ORDER BY ts, event_id LIMIT 1 OFFSET {2 * _PAGE_SIZE - 1}
)
SELECT e.event_id, e.user_id, e.event_type, e.value
FROM events e, anchor a
WHERE (e.ts, e.event_id) > (a.ts, a.event_id)
ORDER BY e.ts, e.event_id
LIMIT {_PAGE_SIZE}
""", tier=3, section="2.6")
def page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination: page 3 of the event log ordered by
    (ts, event_id), fetched as WHERE (ts, id) > cursor ORDER BY ... 
    LIMIT n — the scale-correct pagination pattern. OFFSET pagination
    reads and discards every preceding row on every page (page 10^6 of
    a 100 TB log scans half the log); the keyset predicate instead
    PUSHES DOWN to the parquet scan (`PushedFilters: [GreaterThan(ts,
    ...)]` once AQE resolves the scalar cursor), so each page is a
    row-group-pruned point read no matter how deep the cursor sits.

    Here the cursor (last row of page 2) is itself computed with a
    bounded TakeOrdered; a real API caller carries it between requests.
    The tuple comparison (ts, id) > (a, b) is the standard
    lexicographic cursor — ties on ts cannot skip or duplicate rows
    across page boundaries."""
    ev = load(spark, sf_dir, "events")
    anchor = (ev.select("ts", "event_id")
                .orderBy("ts", "event_id")
                .limit(2 * _PAGE_SIZE)
                .orderBy(F.col("ts").desc(), F.col("event_id").desc())
                .limit(1)
                .select(F.col("ts").alias("a_ts"),
                        F.col("event_id").alias("a_id")))
    return (ev.crossJoin(F.broadcast(anchor))
              .filter((F.col("ts") > F.col("a_ts"))
                      | ((F.col("ts") == F.col("a_ts"))
                         & (F.col("event_id") > F.col("a_id"))))
              .orderBy("ts", "event_id").limit(_PAGE_SIZE)
              .select("event_id", "user_id", "event_type", "value"))


_SQ_K = 200  # bottom-k hash sample size


@op("agg_sample_quantile_bounds", oracle=f"""
WITH s AS (       -- deterministic k-uniform sample: bottom-k by md5 rank
    SELECT event_type, value FROM (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5('sq:' || CAST(event_id AS VARCHAR)),
                            event_id) AS hr
        FROM events) WHERE hr <= {_SQ_K}
), sq AS (        -- sample quantiles: LOWER order statistic at q
    SELECT event_type, value, r, n FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, md5(CAST(value AS
                                      VARCHAR))) AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM s)
), pick AS (
    SELECT event_type,
           max(CASE WHEN r = (n - 1) // 2 + 1 THEN value END) AS med_est,
           max(CASE WHEN r = ((n - 1) * 9) // 10 + 1 THEN value END)
               AS p90_est
    FROM sq GROUP BY event_type
), ex AS (        -- exact quantiles, same lower-order-statistic rule
    SELECT event_type,
           max(CASE WHEN r = (n - 1) // 2 + 1 THEN value END) AS med,
           max(CASE WHEN r = ((n - 1) * 9) // 10 + 1 THEN value END) AS p90
    FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events)
    GROUP BY event_type
)
SELECT p.event_type,
       round(p.med_est, 6) AS med_est, round(e.med, 6) AS med_exact,
       round(abs(p.med_est - e.med), 6) AS med_abs_err,
       round(p.p90_est, 6) AS p90_est, round(e.p90, 6) AS p90_exact,
       round(abs(p.p90_est - e.p90), 6) AS p90_abs_err
FROM pick p JOIN ex e ON e.event_type = p.event_type
""", tier=3, section="2.4")
def agg_sample_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a BOUNDED deterministic sample, with the
    measured error alongside: a bottom-k (k=200) sample per event type
    ranked by md5 of the event id — a uniform draw that is reproducible,
    append-stable and engine-portable, the same KMV discipline as
    agg_kmv_distinct — then the median/p90 read off the sample by the
    LOWER order statistic (idx = floor(q*(n-1))+1; no interpolation
    semantics to disagree on). The exact quantiles computed the same
    rule give the honest per-type error the estimate carries.

    Scale shape: the bottom-k sample is a constant-size, MERGEABLE
    summary per group (k smallest hash ranks of a union = k smallest of
    the merged sets), so a 100 TB scan reduces to k rows per type
    before any sort; the exact side exists as the eval harness (and is
    itself one shuffle + per-group window, the agg_percentile_exact
    shape)."""
    from ..api import bucketed_global_rank

    ev = load(spark, sf_dir, "events")
    # bottom-k hash sample via the grouped two-phase rank (round 5): the
    # md5 hex prefix is the bucket (a prefix IS monotone under the full
    # string order), so no per-type fact partition is ever sorted whole
    h = F.md5(F.concat(F.lit("sq:"), F.col("event_id").cast("string")))
    s = (bucketed_global_rank(
            ev.select("event_type", "value", "event_id", h.alias("__h")),
            F.substring(F.col("__h"), 1, 2),
            [F.col("__h"), F.col("event_id")],
            rank_name="hr", group_cols=["event_type"])
         .filter(F.col("hr") <= _SQ_K)
         .select("event_type", "value"))

    def pick(r_df, med_name, p90_name):
        med_i = F.floor((F.col("n") - 1) / 2) + 1
        p90_i = F.floor((F.col("n") - 1) * 9 / 10) + 1
        return r_df.groupBy("event_type").agg(
            F.max(F.when(F.col("r") == med_i, F.col("value")))
             .alias(med_name),
            F.max(F.when(F.col("r") == p90_i, F.col("value")))
             .alias(p90_name))

    # est side: <= _SQ_K rows per type by construction — a BOUNDED
    # partition, so a plain window is the right tool here
    wr = Window.partitionBy("event_type").orderBy(
        "value", F.md5(F.col("value").cast("string")))
    wn = Window.partitionBy("event_type")
    est = pick(s.select("event_type", "value",
                        F.row_number().over(wr).alias("r"),
                        F.count("*").over(wn).alias("n")),
               "med_est", "p90_est")
    # exact side: fact rows — grouped two-phase rank (unit-value bucket)
    ex = pick(bucketed_global_rank(
        ev.select("event_type", "value", "event_id"),
        F.floor("value").cast("long"),
        [F.col("value"), F.col("event_id")],
        rank_name="r", total_name="n", group_cols=["event_type"]),
        "med", "p90")
    return (est.join(ex, "event_type")
               .select("event_type",
                       F.round("med_est", 6).alias("med_est"),
                       F.round("med", 6).alias("med_exact"),
                       F.round(F.abs(F.col("med_est") - F.col("med")), 6)
                        .alias("med_abs_err"),
                       F.round("p90_est", 6).alias("p90_est"),
                       F.round("p90", 6).alias("p90_exact"),
                       F.round(F.abs(F.col("p90_est") - F.col("p90")), 6)
                        .alias("p90_abs_err")))


#: HLL-32 parameters: 5-bit bucket index, rho over the remaining 27 bits.
#: alpha_32 = 0.697 (Flajolet et al. 2007). The register sum is rescaled
#: onto the 2^28 integer grid (every term 2^(28-M_j) is an exact long) so
#: the only float ops are one division per group — fully portable, unlike
#: native HLL register layouts (agg_approx_distinct stays rows-only for
#: exactly that reason).
_HLL_M = 32
_HLL_ALPHA_M2 = 713.728  # 0.697 * 32 * 32


@op("agg_hll_portable", oracle=f"""
WITH h AS (
    SELECT DISTINCT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS hv
    FROM events
), reg AS (       -- per-bucket max rho (position of first set bit in the
                  -- low 27 bits, scanning from bit 26 down; 28 if none)
    SELECT event_type, hv // 134217728 AS bucket,
           max(CASE WHEN (hv % 134217728) = 0 THEN 28
               ELSE 27 - CAST(floor(log2(hv % 134217728)) AS BIGINT)
               END) AS m_j
    FROM h GROUP BY 1, 2
), s AS (         -- exact integer register sum on the 2^28 grid
    SELECT event_type,
           CAST(sum(1::BIGINT << (28 - m_j)) AS BIGINT)
               + CAST(({_HLL_M} - count(*)) AS BIGINT) * 268435456 AS z28,
           count(*) AS n_buckets
    FROM reg GROUP BY event_type
), ex AS (
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
    FROM events GROUP BY event_type
)
SELECT e.event_type, e.n_exact,
       round({_HLL_ALPHA_M2!r} * 268435456.0 / s.z28, 6) AS hll_est,
       round(abs({_HLL_ALPHA_M2!r} * 268435456.0 / s.z28 - e.n_exact)
             / e.n_exact, 6) AS rel_error
FROM ex e JOIN s ON s.event_type = e.event_type
""", tier=3, section="2.4")
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count (Flajolet-Furet-Gandouet-Meunier 2007,
    public), built on the PORTABLE md5 draw so — unlike every native HLL
    whose register encoding is engine-private (``agg_approx_distinct``
    is rows-only for that reason) — registers, estimate AND measured
    relative error are exactly value-oracled cross-engine. 32 registers:
    bucket = top 5 hash bits, rho = first-set-bit position of the low 27
    (28 when zero), estimate = alpha*m^2 / sum(2^-M_j).

    Determinism: the harmonic-sum terms are rescaled by 2^28 so every
    term is an EXACT long (1 << (28 - M_j)); empty registers contribute
    2^28 each via the bucket-count complement. The sum is exact integer
    arithmetic — order-invariant at any parallelism — and the one
    division per group is correctly rounded. (The raw-estimate formula
    only — no small/large-range corrections; at 32 registers over
    thousands of users the raw regime applies, and the op reports its
    own rel_error precisely so the accuracy claim is measured, not
    assumed.) Scale: registers are a constant 32-cell MERGEABLE summary
    per group (merge = per-bucket max), the same map-side-combinable
    architecture as the KMV/CMS family."""
    ev = load(spark, sf_dir, "events")
    hv = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    low = F.col("hv") % 134217728
    rho = (F.when(low == 0, 28)
            .otherwise(27 - F.floor(F.log2(low)).cast("long")))
    reg = (h.select("event_type",
                    (F.col("hv") / 134217728).cast("long").alias("bucket"),
                    rho.alias("r"))
            .groupBy("event_type", "bucket")
            .agg(F.max("r").alias("m_j")))
    s = (reg.groupBy("event_type")
            .agg((F.sum(F.expr("shiftleft(1L, cast(28 - m_j as int))"))
                  + (_HLL_M - F.count("*")) * F.lit(268435456).cast("long"))
                 .alias("z28")))
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"))
    est = _HLL_ALPHA_M2 * F.lit(268435456.0) / F.col("z28")
    return (ex.join(s, "event_type")
              .select("event_type", "n_exact",
                      F.round(est, 6).alias("hll_est"),
                      F.round(F.abs(est - F.col("n_exact"))
                              / F.col("n_exact"), 6).alias("rel_error")))


@op("dim_snapshot_diff", oracle="""
WITH snap_a AS (  -- yesterday's extract: everything booked before 2000-07
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderdate < TIMESTAMP '2000-07-01'
), snap_b AS (    -- today's extract: window advanced + a deterministic
                  -- re-price of every 7th order (the "changed" class);
                  -- the re-price stays in DECIMAL (x 1.05 exact, no
                  -- float rounding - engines round doubles differently)
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 7 = 0
                THEN CAST(o_totalprice AS DECIMAL(18,2))
                     * CAST(1.05 AS DECIMAL(3,2))
                ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2))
                          AS DECIMAL(21,4)) END AS o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-07-01'
), j AS (
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN CAST(CAST(a.o_totalprice AS DECIMAL(18,2))
                          AS DECIMAL(21,4)) <> b.o_totalprice
                    THEN 'changed'
                ELSE 'unchanged' END AS status,
           coalesce(b.o_totalprice,
                    CAST(CAST(a.o_totalprice AS DECIMAL(18,2))
                         AS DECIMAL(21,4))) AS price
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
)
SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DECIMAL(38,4)) AS total_price
FROM j GROUP BY status
""", tier=3, section="2.3")
def dim_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the nightly diff every warehouse job
    runs before publishing: FULL OUTER join of yesterday's and today's
    extracts on the business key, each row classified added / removed /
    changed / unchanged, with row counts and decimal-exact value totals
    per class (the numbers an on-call engineer eyeballs before signing
    off a load). Snapshots are synthesized deterministically from
    orders: a shifted date window plus a 5% re-price of every 7th order.

    Scale shape: ONE full-outer hash join on the business key — both
    sides shuffle-partition on o_orderkey and every downstream
    classification is narrow; the per-class aggregate is map-side
    combinable. No collect, no driver diffing — the diff IS the
    dataframe."""
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)").cast("decimal(21,4)")
    snap_a = (o.filter(F.col("o_orderdate") < "2000-07-01")
               .select(F.col("o_orderkey").alias("ka"), dec.alias("pa")))
    snap_b = (o.filter(F.col("o_orderdate") >= "1995-07-01")
               .select(F.col("o_orderkey").alias("kb"),
                       F.when(F.col("o_orderkey") % 7 == 0,
                              F.col("o_totalprice").cast("decimal(18,2)")
                              * F.lit(1.05).cast("decimal(3,2)"))
                        .otherwise(dec).alias("pb")))
    j = snap_a.join(snap_b, snap_a.ka == snap_b.kb, "full_outer")
    status = (F.when(F.col("ka").isNull(), "added")
               .when(F.col("kb").isNull(), "removed")
               .when(F.col("pa") != F.col("pb"), "changed")
               .otherwise("unchanged"))
    return (j.select(status.alias("status"),
                     F.coalesce("pb", "pa").alias("price"))
             .groupBy("status")
             .agg(F.count("*").alias("n_rows"),
                  F.sum("price").cast("decimal(38,4)")
                   .alias("total_price")))


@op("dq_expectation_report", oracle="""
WITH base AS (SELECT * FROM orders),
checks AS (
    SELECT 'totalprice_positive' AS expectation,
           count(*) AS n_checked,
           count_if(o_totalprice <= 0) AS n_violations
    FROM base
    UNION ALL
    SELECT 'orderdate_in_range', count(*),
           count_if(o_orderdate < TIMESTAMP '1990-01-01'
                    OR o_orderdate >= TIMESTAMP '2010-01-01')
    FROM base
    UNION ALL
    SELECT 'custkey_not_null', count(*), count_if(o_custkey IS NULL)
    FROM base
    UNION ALL
    SELECT 'orderkey_unique', count(*),
           count(*) - count(DISTINCT o_orderkey)
    FROM base
    UNION ALL
    SELECT 'custkey_references_customer', count(*),
           count_if(c.c_custkey IS NULL)
    FROM base LEFT JOIN customer c ON c.c_custkey = base.o_custkey
)
SELECT expectation, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_violations = 0 AS INT) AS passed
FROM checks
""", tier=3, section="2.4")
def dq_expectation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation report over the orders feed — the
    contract gate a production pipeline runs before promoting a batch
    (the Great-Expectations/dbt-test pattern, public): value-range,
    not-null, primary-key-uniqueness and referential-integrity checks,
    one row per expectation with checked/violation counts and a 0/1
    pass flag. A failed batch is quarantined by reading `passed`, not
    by a human reading logs.

    Scale shape: the four column checks fold into ONE scan of the fact
    (conditional-count aggregates, map-side combinable); the FK check
    is an equi-join on the key — broadcast when the dim is small,
    shuffle-hash otherwise, either way no row leaves the JVM. The
    report is a handful of rows regardless of input size."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = F.count("*")
    col_checks = o.agg(
        n.alias("n"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("v_price"),
        F.count(F.when((F.col("o_orderdate") < "1990-01-01")
                       | (F.col("o_orderdate") >= "2010-01-01"), 1))
         .alias("v_date"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("v_null"),
        (n - F.count_distinct("o_orderkey")).alias("v_dup"))
    fk = (o.join(c.select(F.col("c_custkey").alias("ck")),
                 o.o_custkey == F.col("ck"), "left")
           .agg(F.count("*").alias("n"),
                F.count(F.when(F.col("ck").isNull(), 1)).alias("v_fk")))
    rows = []
    for name, src, col in [
            ("totalprice_positive", col_checks, "v_price"),
            ("orderdate_in_range", col_checks, "v_date"),
            ("custkey_not_null", col_checks, "v_null"),
            ("orderkey_unique", col_checks, "v_dup"),
            ("custkey_references_customer", fk, "v_fk")]:
        rows.append(src.select(
            F.lit(name).alias("expectation"),
            F.col("n").cast("long").alias("n_checked"),
            F.col(col).cast("long").alias("n_violations"),
            (F.col(col) == 0).cast("int").alias("passed")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@op("dq_load_anomaly", oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, count(*) AS n,
           SUM(CAST(value AS DECIMAL(18,2))) AS sd
    FROM events GROUP BY 1
), st AS (
    SELECT count(*) AS cnt,
           CAST(SUM(n) AS DOUBLE) / count(*) AS mn,
           sqrt(greatest((CAST(SUM(n * n) AS DOUBLE)
                          - CAST(SUM(n) AS DOUBLE) * SUM(n) / count(*))
                         / greatest(count(*) - 1, 1), 0)) AS sdn,
           CAST(SUM(sd) AS DOUBLE) / count(*) AS ms,
           sqrt(greatest((CAST(SUM(sd * sd) AS DOUBLE)
                          - CAST(SUM(sd) AS DOUBLE) * CAST(SUM(sd) AS DOUBLE)
                            / count(*))
                         / greatest(count(*) - 1, 1), 0)) AS sds
    FROM daily
)
SELECT d AS day, CAST(n AS BIGINT) AS n_rows,
       CAST(sd AS DOUBLE) AS total_value,
       round((n - st.mn)
             / (CASE WHEN st.sdn = 0 THEN 1 ELSE st.sdn END), 6) AS z_rows,
       round((CAST(sd AS DOUBLE) - st.ms)
             / (CASE WHEN st.sds = 0 THEN 1 ELSE st.sds END), 6) AS z_value,
       CAST(abs((n - st.mn)
                / (CASE WHEN st.sdn = 0 THEN 1 ELSE st.sdn END)) > 2
            OR abs((CAST(sd AS DOUBLE) - st.ms)
                   / (CASE WHEN st.sds = 0 THEN 1 ELSE st.sds END)) > 2
            AS INT) AS anomalous
FROM daily CROSS JOIN st
""", tier=3, section="2.4")
def dq_load_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly audit — the "did yesterday's load look
    wrong" monitor every scheduled pipeline runs before promoting a
    partition: per-day row count and value volume z-scored against the
    corpus's own day distribution, with a |z| > 2 flag on either
    measure (half-empty loads, duplicate-ingest doublings and upstream
    outages all light up). Completes the dq_* trio: expectations (is
    the data valid), referential integrity (is it consistent), load
    anomaly (did we get the usual AMOUNT of it).

    Determinism: day sums ride DECIMAL(18,2) (exact, order-invariant),
    day counts and n·n products are exact longs (< 2^53 here; a 100 TB
    deployment lifts the moment pass to decimal the same way the sums
    already are), so mean/std derive from identical exact operands on
    both engines and the z-division is the only float step. One hash
    aggregate to ~30 day rows, a 1-row moment aggregate over those,
    broadcast back — corpus touched once, map-side combinable."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sd"))
    cnt = F.count("*")
    bessel = F.greatest(cnt - 1, F.lit(1))
    sdn = F.sqrt(F.greatest(
        (F.sum(F.col("n") * F.col("n")).cast("double")
         - F.sum("n").cast("double") * F.sum("n") / cnt) / bessel,
        F.lit(0.0)))
    sds = F.sqrt(F.greatest(
        (F.sum(F.col("sd") * F.col("sd")).cast("double")
         - F.sum("sd").cast("double") * F.sum("sd").cast("double") / cnt)
        / bessel, F.lit(0.0)))
    st = daily.agg(
        (F.sum("n").cast("double") / cnt).alias("mn"),
        sdn.alias("sdn"),
        (F.sum("sd").cast("double") / cnt).alias("ms"),
        sds.alias("sds"))
    zn = (F.col("n") - F.col("mn")) \
        / F.when(F.col("sdn") == 0, 1.0).otherwise(F.col("sdn"))
    zv = (F.col("sd").cast("double") - F.col("ms")) \
        / F.when(F.col("sds") == 0, 1.0).otherwise(F.col("sds"))
    return (daily.crossJoin(F.broadcast(st))
                 .select(F.col("d").alias("day"),
                         F.col("n").cast("long").alias("n_rows"),
                         F.col("sd").cast("double").alias("total_value"),
                         F.round(zn, 6).alias("z_rows"),
                         F.round(zv, 6).alias("z_value"),
                         ((F.abs(zn) > 2) | (F.abs(zv) > 2)).cast("int")
                          .alias("anomalous")))


@op("join_point_in_time_scd2", oracle="""
WITH changes AS (
    SELECT o_custkey AS c_custkey,
           max_by(o_totalprice, o_orderkey) AS new_acctbal,
           CAST(max(o_orderdate) AS TIMESTAMP) AS eff_ts
    FROM orders GROUP BY o_custkey
), changed AS (
    SELECT c.c_custkey, c.c_name, c.c_acctbal, ch.new_acctbal, ch.eff_ts
    FROM customer c JOIN changes ch USING (c_custkey)
    WHERE ch.new_acctbal <> c.c_acctbal
), dim AS (       -- the SCD2 dim exactly as dim_scd2_upsert builds it
    SELECT c_custkey, c_acctbal AS acctbal,
           TIMESTAMP '1992-01-01' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, 1 AS is_current
    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
    UNION ALL
    SELECT c_custkey, c_acctbal, TIMESTAMP '1992-01-01', eff_ts, 0
    FROM changed
    UNION ALL
    SELECT c_custkey, new_acctbal, eff_ts, CAST(NULL AS TIMESTAMP), 1
    FROM changed
)
SELECT CASE WHEN d.is_current = 1 THEN 'current' ELSE 'historic' END
           AS version_used,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS total_price
FROM orders o JOIN dim d
  ON d.c_custkey = o.o_custkey
 AND o.o_orderdate >= d.valid_from
 AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
GROUP BY 1
""", tier=3, section="2.3")
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each order joined to the SCD2
    customer version that was VALID AT its order date — the companion
    to dim_scd2_upsert and the join every as-was report needs (joining
    to the current version silently rewrites history). The dim is the
    exact output of dim_scd2_upsert; the join predicate is the equi key
    plus the half-open validity residual [valid_from, valid_to).

    Scale shape: a hash join on the customer key with the validity
    window as a cheap residual filter — never a range-only nested loop,
    because every SCD2 row carries its business key (the same
    equi-conjunct discipline as join_interval_overlap_pairs). Per-order
    fan-out is the version count of one customer (here <= 2, generally
    small), and the invariant that each order matches EXACTLY ONE
    version is pinned in tests."""
    o = load(spark, sf_dir, "orders")
    dim = dim_scd2_upsert(spark, sf_dir).select(
        "c_custkey", "valid_from", "valid_to", "is_current")
    j = o.join(dim,
               (o.o_custkey == dim.c_custkey)
               & (o.o_orderdate >= dim.valid_from)
               & (dim.valid_to.isNull()
                  | (o.o_orderdate < dim.valid_to)))
    version = (F.when(F.col("is_current") == 1, "current")
                .otherwise("historic"))
    return (j.groupBy(version.alias("version_used"))
             .agg(F.count("*").alias("n_orders"),
                  F.count_distinct("o_custkey").alias("n_customers"),
                  F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("decimal(38,2)").alias("total_price")))


@op("agg_welch_t_test", oracle="""
WITH lab AS (     -- weekend vs weekday arms, same split as the
                  -- proportion test (dayofweek 1/7 = Sun/Sat)
    SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend'
                ELSE 'weekday' END AS arm,
           CAST(value AS DECIMAL(18,2)) AS v
    FROM events
), m AS (         -- decimal-exact moments per arm
    SELECT arm, CAST(count(*) AS BIGINT) AS n,
           sum(v) AS sx,
           sum(CAST(v * v AS DECIMAL(38,4))) AS sxx
    FROM lab GROUP BY arm
), s AS (         -- unbiased variance from exact moments, ONE double op
                  -- chain: (n*sxx - sx^2) exact decimal, then /(n(n-1))
    SELECT arm, n,
           CAST(sx AS DOUBLE) / n AS mean_v,
           CAST(n * sxx - CAST(sx * sx AS DECIMAL(38,4)) AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1)) AS s2
    FROM m
)
SELECT a.n AS n_weekend, b.n AS n_weekday,
       round(a.mean_v, 6) AS mean_weekend,
       round(b.mean_v, 6) AS mean_weekday,
       round((a.mean_v - b.mean_v)
             / sqrt(a.s2 / a.n + b.s2 / b.n), 6) AS t_stat,
       round(((a.s2 / a.n + b.s2 / b.n) * (a.s2 / a.n + b.s2 / b.n))
             / ((a.s2 / a.n) * (a.s2 / a.n) / (a.n - 1)
                + (b.s2 / b.n) * (b.s2 / b.n) / (b.n - 1)), 6)
           AS welch_df
FROM s a, s b
WHERE a.arm = 'weekend' AND b.arm = 'weekday'
""", tier=3, section="2.4")
def agg_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947, public) on mean
    event value, weekend vs weekday — the continuous-metric sibling of
    agg_ab_proportion_test and the workhorse of any experimentation
    platform. Reports arm means, the t statistic and the
    Welch-Satterthwaite degrees of freedom.

    Determinism: arm moments (n, sum, sum-of-squares) are DECIMAL-exact
    (2-dec values -> 4-dec squares, both sum exactly), so the variance
    numerator n*sxx - sx^2 is one exact decimal before a single double
    division — order-invariant at any parallelism, bit-identical both
    engines; everything after is a fixed chain of correctly-rounded
    double ops. Scale shape: one map-side-combinable aggregate over the
    scan; the test itself is O(arms)."""
    ev = load(spark, sf_dir, "events")
    arm = F.when(F.dayofweek("ts").isin(1, 7), "weekend") \
           .otherwise("weekday")
    v = F.col("value").cast("decimal(18,2)")
    m = (ev.select(arm.alias("arm"), v.alias("v"))
           .groupBy("arm")
           .agg(F.count("*").alias("n"),
                F.sum("v").alias("sx"),
                F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)"))
                 .alias("sxx")))
    s = m.select(
        "arm", "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mean_v"),
        ((F.col("n") * F.col("sxx")
          - (F.col("sx") * F.col("sx")).cast("decimal(38,4)"))
         .cast("double")
         / (F.col("n").cast("double") * (F.col("n") - 1))).alias("s2"))
    a = s.filter(F.col("arm") == "weekend").select(
        F.col("n").alias("n_weekend"), F.col("mean_v").alias("ma"),
        F.col("s2").alias("va"))
    b = s.filter(F.col("arm") == "weekday").select(
        F.col("n").alias("n_weekday"), F.col("mean_v").alias("mb"),
        F.col("s2").alias("vb"))
    sa = F.col("va") / F.col("n_weekend")
    sb = F.col("vb") / F.col("n_weekday")
    return (a.crossJoin(b)
             .select("n_weekend", "n_weekday",
                     F.round("ma", 6).alias("mean_weekend"),
                     F.round("mb", 6).alias("mean_weekday"),
                     F.round((F.col("ma") - F.col("mb"))
                             / F.sqrt(sa + sb), 6).alias("t_stat"),
                     F.round(((sa + sb) * (sa + sb))
                             / (sa * sa / (F.col("n_weekend") - 1)
                                + sb * sb / (F.col("n_weekday") - 1)),
                             6).alias("welch_df")))


@op("agg_mann_whitney_u", oracle="""
WITH lab AS (
    SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_we,
           CAST(value AS DECIMAL(18,2)) AS v
    FROM events
), ranked AS (    -- midranks: rank_min + (ties-1)/2, exact halves
    SELECT is_we, v,
           rank() OVER (ORDER BY v) AS rmin,
           count(*) OVER (PARTITION BY v) AS t
    FROM lab
), stats AS (
    SELECT CAST(sum(CASE WHEN is_we = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
           CAST(sum(CASE WHEN is_we = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
           sum(CASE WHEN is_we = 1
               THEN CAST(2 * rmin + t - 1 AS DECIMAL(38,1)) / 2
               ELSE CAST(0 AS DECIMAL(38,1)) END) AS r1
    FROM ranked
), ties AS (      -- tie correction term sum(t^3 - t) over tie groups
    SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3
    FROM (SELECT count(*) AS t FROM lab GROUP BY v)
)
SELECT s.n1, s.n2,
       round(CAST(s.r1 AS DOUBLE)
             - CAST(s.n1 AS DOUBLE) * (s.n1 + 1) / 2, 6) AS u1,
       round((CAST(s.r1 AS DOUBLE)
              - CAST(s.n1 AS DOUBLE) * (s.n1 + 1) / 2
              - CAST(s.n1 AS DOUBLE) * s.n2 / 2)
             / sqrt(CAST(s.n1 AS DOUBLE) * s.n2 / 12
                    * (CAST(s.n1 + s.n2 + 1 AS DOUBLE)
                       - CAST(t.tie3 AS DOUBLE)
                         / (CAST(s.n1 + s.n2 AS DOUBLE)
                            * (s.n1 + s.n2 - 1)))), 6) AS z_stat
FROM stats s, ties t
""", tier=3, section="2.4")
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947, public) on
    event value, weekend vs weekday — the distribution-free companion
    to agg_welch_t_test for metrics too skewed for a t-test (latencies,
    revenues). Midranks handle ties exactly (rank_min + (t-1)/2 —
    half-integer, exact in DECIMAL(38,1)/2), the rank sum stays decimal
    until ONE double conversion, and the normal approximation includes
    the full tie-correction term sum(t^3-t), computed as exact longs.

    Scale shape: NO row-level global sort — midranks are a pure
    function of per-value counts (rmin(v) = 1 + cumulative count of
    smaller values), so the data reduces to the DISTINCT-VALUE count
    table in one hash aggregate before the only ordered window runs
    over that (much smaller) table; r1 is then a weighted sum. For a
    continuous metric with ~n distinct values, pre-bin — the rank test
    is bin-stable. Everything after is a constant-size aggregate."""
    ev = load(spark, sf_dir, "events")
    lab = ev.select(
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("is_we"),
        F.col("value").cast("decimal(18,2)").alias("v"))
    vc = lab.groupBy("v").agg(
        F.count("*").alias("t"),
        F.sum("is_we").alias("c1"))
    w_cum = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    ranked = vc.select(
        "v", "t", "c1",
        (F.coalesce(F.sum("t").over(w_cum), F.lit(0)) + 1).alias("rmin"))
    midrank = (2 * F.col("rmin") + F.col("t") - 1) \
        .cast("decimal(38,1)") / 2
    stats = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("t") - F.col("c1")).alias("n2"),
        F.sum(midrank * F.col("c1")).alias("r1"))
    ties = vc.agg(F.sum(F.col("t") * F.col("t") * F.col("t")
                        - F.col("t")).alias("tie3"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u1 = F.col("r1").cast("double") - n1d * (F.col("n1") + 1) / 2
    n = F.col("n1") + F.col("n2")
    var = (n1d * n2d / 12
           * ((n + 1).cast("double")
              - F.col("tie3").cast("double")
                / (n.cast("double") * (n - 1))))
    return (stats.crossJoin(ties)
                 .select(F.col("n1").cast("long").alias("n1"),
                         F.col("n2").cast("long").alias("n2"),
                         F.round(u1, 6).alias("u1"),
                         F.round((u1 - n1d * n2d / 2) / F.sqrt(var), 6)
                          .alias("z_stat")))


@op("graph_neighbor_jaccard", oracle="""
WITH pos AS (
    SELECT DISTINCT user_id, event_type FROM events
), sz AS (
    SELECT event_type, count(*) AS s FROM pos GROUP BY event_type
), inter AS (
    SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_inter
    FROM pos a JOIN pos b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT i.t1, i.t2, i.n_inter,
       s1.s AS s1, s2.s AS s2,
       round(CAST(i.n_inter AS DOUBLE)
             / (s1.s + s2.s - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sz s1 ON s1.event_type = i.t1
JOIN sz s2 ON s2.event_type = i.t2
""", tier=3, section="2.3")
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity between nodes of the small side of
    a bipartite graph (event types, via their audiences of users):
    ``J(a,b) = |U_a ∩ U_b| / |U_a ∪ U_b|`` with the union obtained by
    inclusion-exclusion from the intersection counts — no union
    materialization. The item-item collaborative-similarity primitive
    (market-basket's lift cousin, set-overlap flavored).

    Scale shape: dedup to the (user, type) incidence list (one shuffle),
    self-join ON THE USER KEY so the fan-out per user is (types-per-user
    choose 2) — bounded by the small axis's degree, never |users|² —
    then count pairs; the per-type sizes are a tiny broadcast joined onto
    the pair counts. For a fat small-axis (items in the millions) the
    same plan holds with a per-user degree cap (drop power users, who
    carry no signal), exactly the high-df discipline of the dedup joins.
    """
    ev = load(spark, sf_dir, "events")
    pos = ev.select("user_id", "event_type").distinct()
    sz = pos.groupBy("event_type").agg(F.count("*").alias("s"))
    a = pos.alias("a")
    b = pos.alias("b")
    inter = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.event_type") < F.col("b.event_type")))
              .groupBy(F.col("a.event_type").alias("t1"),
                       F.col("b.event_type").alias("t2"))
              .agg(F.count("*").alias("n_inter")))
    s1 = F.broadcast(sz.select(F.col("event_type").alias("t1"),
                               F.col("s").alias("s1")))
    s2 = F.broadcast(sz.select(F.col("event_type").alias("t2"),
                               F.col("s").alias("s2")))
    return (inter.join(s1, "t1").join(s2, "t2")
                 .select("t1", "t2", "n_inter", "s1", "s2",
                         F.round(F.col("n_inter").cast("double")
                                 / (F.col("s1") + F.col("s2")
                                    - F.col("n_inter")), 6)
                          .alias("jaccard")))


#: Spatial grid-join geometry: synthetic deterministic coordinates in a
#: 4-degree square, cell width = the search radius, so any pair within
#: the radius shares a cell or touches an adjacent one (3x3 rule).
_GEO_CELL = 0.05      # degrees; also the neighbor-distance threshold
_GEO_SPAN = 4.0       # placement square: [40, 44) x [10, 14)


@op("geo_grid_neighbor_join", oracle=f"""
WITH pts AS (
    SELECT user_id,
           40.0 + (('0x' || substr(md5('lat:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT % 4000) / 1000.0 AS lat,
           10.0 + (('0x' || substr(md5('lon:' || CAST(user_id AS VARCHAR)),
                    1, 8))::BIGINT % 4000) / 1000.0 AS lon
    FROM (SELECT DISTINCT user_id FROM events)
), cells AS (
    SELECT user_id, lat, lon,
           CAST(floor(lat / {_GEO_CELL}) AS BIGINT) AS cx,
           CAST(floor(lon / {_GEO_CELL}) AS BIGINT) AS cy
    FROM pts
), probe AS (   -- left side fans out to its 3x3 cell neighborhood
    SELECT c.user_id, c.lat, c.lon,
           c.cx + dx.d AS cx, c.cy + dy.d AS cy
    FROM cells c,
         (SELECT unnest([-1, 0, 1]) AS d) dx,
         (SELECT unnest([-1, 0, 1]) AS d) dy
)
SELECT p.user_id AS u1, c.user_id AS u2,
       round((p.lat - c.lat) * (p.lat - c.lat)
             + (p.lon - c.lon) * (p.lon - c.lon), 10) AS d2
FROM probe p JOIN cells c ON c.cx = p.cx AND c.cy = p.cy
     AND p.user_id < c.user_id
WHERE (p.lat - c.lat) * (p.lat - c.lat)
      + (p.lon - c.lon) * (p.lon - c.lon)
      <= {_GEO_CELL} * {_GEO_CELL}
""", tier=3, section="2.3")
def geo_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor join by grid bucketing — the standard
    plane-sweep-free distance join: place each entity at deterministic
    (md5-derived) coordinates, snap to a grid whose cell width EQUALS
    the search radius, fan the probe side out to its 3x3 cell
    neighborhood (a constant 9x narrow explode), equi-join on the cell
    key, and verify the exact distance only inside colliding cells —
    candidates ~ density x 9 cells, NEVER all-pairs. This is the same
    candidate-cut discipline as the LSH band joins, in 2D.

    The coordinates are synthetic (this corpus ships no geo columns —
    documented demo placement, like the multimodal stubs) and the metric
    is squared degrees (pure multiply/add; haversine's trig is
    libm-dependent and would break cross-engine bit-equality, and for a
    radius this small the flat metric IS the production approximation).
    Every arithmetic step is engine-identical, so even d2 value-hashes.
    """
    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    h = lambda p: F.conv(F.substring(  # noqa: E731
        F.md5(F.concat(F.lit(p), uid)), 1, 8), 16, 10).cast("long")
    pts = (ev.select("user_id").distinct()
             .select("user_id",
                     (40.0 + (h("lat:") % 4000) / 1000.0).alias("lat"),
                     (10.0 + (h("lon:") % 4000) / 1000.0).alias("lon")))
    cells = pts.select(
        "user_id", "lat", "lon",
        F.floor(F.col("lat") / _GEO_CELL).cast("long").alias("cx"),
        F.floor(F.col("lon") / _GEO_CELL).cast("long").alias("cy"))
    off = spark.range(1).select(F.explode(
        F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("d"))
    probe = (cells.crossJoin(F.broadcast(off.select(F.col("d").alias("dx"))))
                  .crossJoin(F.broadcast(off.select(F.col("d").alias("dy"))))
                  .select(F.col("user_id").alias("u1"),
                          F.col("lat").alias("lat1"),
                          F.col("lon").alias("lon1"),
                          (F.col("cx") + F.col("dx")).alias("cx"),
                          (F.col("cy") + F.col("dy")).alias("cy")))
    right = cells.select(F.col("user_id").alias("u2"),
                         F.col("lat").alias("lat2"),
                         F.col("lon").alias("lon2"), "cx", "cy")
    d2 = ((F.col("lat1") - F.col("lat2"))
          * (F.col("lat1") - F.col("lat2"))
          + (F.col("lon1") - F.col("lon2"))
          * (F.col("lon1") - F.col("lon2")))
    return (probe.join(right, ["cx", "cy"])
                 .filter(F.col("u1") < F.col("u2"))
                 .filter(d2 <= _GEO_CELL * _GEO_CELL)
                 .select("u1", "u2", F.round(d2, 10).alias("d2")))


@op("agg_raking_ipf", oracle="""
WITH cells AS (
    SELECT event_type AS t, CAST(isodow(ts) AS BIGINT) AS d,
           CAST(count(*) AS DOUBLE) AS n
    FROM events GROUP BY 1, 2
), tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS n_all,
                  count(DISTINCT t) AS nt,
                  count(DISTINCT d) AS nd FROM cells),
-- target margins: uniform over both axes
r1 AS (   -- scale rows (event types) to n_all/nt
    SELECT c.t, c.d,
           c.n * ((tot.n_all / tot.nt)
                  / SUM(c.n) OVER (PARTITION BY c.t)) AS w
    FROM cells c CROSS JOIN tot
), c1 AS (   -- scale cols (isodow) to n_all/nd
    SELECT r1.t, r1.d,
           r1.w * ((tot.n_all / tot.nd)
                   / SUM(r1.w) OVER (PARTITION BY r1.d)) AS w
    FROM r1 CROSS JOIN tot
), r2 AS (
    SELECT c1.t, c1.d,
           c1.w * ((tot.n_all / tot.nt)
                   / SUM(c1.w) OVER (PARTITION BY c1.t)) AS w
    FROM c1 CROSS JOIN tot
), c2 AS (
    SELECT r2.t, r2.d,
           r2.w * ((tot.n_all / tot.nd)
                   / SUM(r2.w) OVER (PARTITION BY r2.d)) AS w
    FROM r2 CROSS JOIN tot
)
SELECT c2.t AS event_type, c2.d AS isodow,
       CAST(cells.n AS BIGINT) AS n_raw,
       round(c2.w, 6) AS weight_total,
       round(c2.w / cells.n, 6) AS weight_per_row
FROM c2 JOIN cells ON cells.t = c2.t AND cells.d = c2.d
""", tier=3, section="2.4")
def agg_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) — the survey-weighting
    classic: rescale the (event_type × weekday) cell counts so BOTH
    margins match a target (uniform here), alternating row and column
    scaling for 2 fixed rounds. The output per-row weight is what a
    de-biasing pipeline multiplies into every record so weekday skew and
    channel skew cancel simultaneously.

    Scale shape: the fact table reduces to the margin-cell grid with ONE
    aggregate; every IPF round is then a pair of unpartitioned-window
    scalings over the GRID (types × 7 rows, never the facts) — fixed
    plan depth, no driver iteration, same unrolled-iteration discipline
    as pagerank/k-means. Cell sums within a round are over ≤ max(nt, nd)
    doubles; the grid is small enough that each margin sum is a
    single-partition fold, deterministic in both engines (and DuckDB's
    window sum follows the same ORDER-less full-partition frame).
    """
    ev = load(spark, sf_dir, "events")
    cells = (ev.groupBy(F.col("event_type").alias("t"),
                        F.dayofweek("ts").alias("_dow"))
               .agg(F.count("*").cast("double").alias("n")))
    # dayofweek is 1=Sunday..7=Saturday; isodow is 1=Monday..7=Sunday
    cells = cells.select(
        "t", (((F.col("_dow") + 5) % 7) + 1).cast("long").alias("d"), "n")
    wall = Window.partitionBy()
    tot = (cells.withColumn("n_all", F.sum("n").over(wall))
                .withColumn("nt", F.size(F.collect_set("t").over(wall)))
                .withColumn("nd", F.size(F.collect_set("d").over(wall))))
    wt = Window.partitionBy("t")
    wd = Window.partitionBy("d")
    cur = tot.withColumn("w", F.col("n"))
    for axis_w, m in ((wt, "nt"), (wd, "nd"), (wt, "nt"), (wd, "nd")):
        cur = cur.withColumn(
            "w", F.col("w") * ((F.col("n_all") / F.col(m))
                               / F.sum("w").over(axis_w)))
    return cur.select(F.col("t").alias("event_type"),
                      F.col("d").alias("isodow"),
                      F.col("n").cast("long").alias("n_raw"),
                      F.round("w", 6).alias("weight_total"),
                      F.round(F.col("w") / F.col("n"), 6)
                       .alias("weight_per_row"))


@op("graph_hierarchy_rollup", oracle="""
WITH RECURSIVE users AS (
    SELECT DISTINCT user_id FROM events
), tree AS (   -- synthetic binary org chart: parent(u) = u // 2
    SELECT user_id, user_id // 2 AS parent
    FROM users WHERE user_id > 1
), chain AS (  -- transitive closure: every (ancestor, descendant) path
    SELECT parent AS ancestor, user_id AS descendant, 1 AS depth
    FROM tree
    UNION ALL
    SELECT t.parent, c.descendant, c.depth + 1
    FROM chain c JOIN tree t ON t.user_id = c.ancestor
), spend AS (
    SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS s,
           count(*) AS n
    FROM events GROUP BY user_id
)
SELECT c.ancestor,
       count(DISTINCT c.descendant) AS n_reports,
       CAST(max(c.depth) AS BIGINT) AS max_depth,
       CAST(coalesce(SUM(sp.n), 0) AS BIGINT) AS n_events_below,
       CAST(coalesce(SUM(sp.s), 0) AS DOUBLE) AS value_below
FROM chain c
LEFT JOIN spend sp ON sp.user_id = c.descendant
GROUP BY c.ancestor
HAVING count(DISTINCT c.descendant) >= 4
""", tier=3, section="2.3")
def graph_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy rollup over a transitive closure — the org-chart /
    bill-of-materials query: for every ancestor, the size and depth of
    its subtree and the metrics aggregated over ALL descendants (not
    just direct children). The hierarchy is synthetic (parent = id//2, a
    documented demo tree like the geo placement) but the query shape is
    the real one.

    Spark has no recursive CTE, and the scale answer is NOT a driver
    loop to a fixpoint: a binary tree over ~n users is log2(n) deep, so
    the closure unrolls into a FIXED number of self-joins — here depth
    doubling (closure_k+1 = closure_k ∪ closure_k ∘ closure_k), reaching
    depth 2^4 = 16 (covers 2^16 = 65k users — every test sf) in 4
    joins; the DuckDB oracle is a genuinely independent recursive CTE. Each
    doubling round is a hash join on the frontier key, partitioned —
    the pagerank/k-means unrolled-iteration discipline applied to
    reachability.
    """
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    tree = (users.filter(F.col("user_id") > 1)
                 .select("user_id",
                         F.floor(F.col("user_id") / 2).cast("long")
                          .alias("parent")))
    # depth-doubling closure: start with direct edges (depth 1)
    closure = tree.select(F.col("parent").alias("ancestor"),
                          F.col("user_id").alias("descendant"),
                          F.lit(1).alias("depth"))
    for _ in range(4):  # doubles max depth: 1 -> 2 -> 4 -> 8 -> 16
        a = closure.select(F.col("ancestor"),
                           F.col("descendant").alias("_mid"),
                           F.col("depth").alias("_d1"))
        b = closure.select(F.col("ancestor").alias("_mid"),
                           F.col("descendant"),
                           F.col("depth").alias("_d2"))
        comp = a.join(b, "_mid").select(
            "ancestor", "descendant",
            (F.col("_d1") + F.col("_d2")).alias("depth"))
        closure = (closure.unionAll(comp)
                          .groupBy("ancestor", "descendant")
                          .agg(F.min("depth").alias("depth")))
    spend = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.count("*").alias("n"))
    return (closure
            .join(spend, closure.descendant == spend.user_id, "left")
            .groupBy("ancestor")
            .agg(F.countDistinct("descendant").alias("n_reports"),
                 F.max("depth").cast("long").alias("max_depth"),
                 F.coalesce(F.sum("n"), F.lit(0)).cast("long")
                  .alias("n_events_below"),
                 F.coalesce(F.sum("s"), F.lit(0)).cast("double")
                  .alias("value_below"))
            .filter(F.col("n_reports") >= 4))


@op("agg_diff_in_diff", oracle="""
WITH cut AS (
    SELECT make_timestamp((min(epoch_us(ts)) + max(epoch_us(ts))) // 2)
        AS mid
    FROM events
), labeled AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'control' END
               AS grp,
           CASE WHEN e.ts >= c.mid THEN 'post' ELSE 'pre' END AS period,
           CAST(value AS DECIMAL(18,2)) AS v
    FROM events e CROSS JOIN cut c
), cell AS (
    SELECT grp, period, count(*) AS n,
           CAST(SUM(v) AS DOUBLE) / count(*) AS mean_v
    FROM labeled GROUP BY 1, 2
)
SELECT t_post.mean_v - t_pre.mean_v AS treat_delta,
       c_post.mean_v - c_pre.mean_v AS control_delta,
       round((t_post.mean_v - t_pre.mean_v)
             - (c_post.mean_v - c_pre.mean_v), 6) AS did_effect,
       t_pre.n AS n_treat_pre, t_post.n AS n_treat_post,
       c_pre.n AS n_control_pre, c_post.n AS n_control_post
FROM (SELECT * FROM cell WHERE grp = 'treat' AND period = 'pre') t_pre,
     (SELECT * FROM cell WHERE grp = 'treat' AND period = 'post') t_post,
     (SELECT * FROM cell WHERE grp = 'control' AND period = 'pre') c_pre,
     (SELECT * FROM cell WHERE grp = 'control' AND period = 'post') c_post
""", tier=3, section="2.4")
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the quasi-experimental workhorse when
    you can't randomize: the treatment effect is (treated post−pre
    change) minus (control post−pre change), cancelling both group-level
    baseline differences and common time trends. Cohorts here are the
    deterministic user_id parity split, the period cut is the corpus
    time midpoint — the 2x2 cell shape is the real estimator.

    One aggregate to the 4-cell grid (decimal-exact sums), then pure
    cell arithmetic — joins the experiment-analysis family
    (agg_ab_proportion_test, agg_welch_t_test) with the observational
    panel-data estimator they hand over to when assignment isn't random.
    The raw treat/control deltas ship un-rounded for the audit; only the
    headline effect rounds.
    """
    ev = load(spark, sf_dir, "events")
    cut = ev.agg(F.floor((F.min(F.unix_micros("ts"))
                          + F.max(F.unix_micros("ts"))) / 2)
                  .cast("long").alias("mid"))
    labeled = (ev.crossJoin(F.broadcast(cut))
                 .select(F.when(F.col("user_id") % 2 == 0, "treat")
                          .otherwise("control").alias("grp"),
                         F.when(F.unix_micros("ts") >= F.col("mid"),
                                "post").otherwise("pre").alias("period"),
                         F.col("value").cast("decimal(18,2)").alias("v")))
    cell = labeled.groupBy("grp", "period").agg(
        F.count("*").alias("n"),
        (F.sum("v").cast("double") / F.count("*")).alias("mean_v"))

    def pick(g, p, pre):
        return F.broadcast(cell.filter((F.col("grp") == g)
                                       & (F.col("period") == p))
                               .select(F.col("mean_v").alias(f"m_{pre}"),
                                       F.col("n").alias(f"n_{pre}")))

    j = (pick("treat", "pre", "tpre")
         .crossJoin(pick("treat", "post", "tpost"))
         .crossJoin(pick("control", "pre", "cpre"))
         .crossJoin(pick("control", "post", "cpost")))
    return j.select(
        (F.col("m_tpost") - F.col("m_tpre")).alias("treat_delta"),
        (F.col("m_cpost") - F.col("m_cpre")).alias("control_delta"),
        F.round((F.col("m_tpost") - F.col("m_tpre"))
                - (F.col("m_cpost") - F.col("m_cpre")), 6)
         .alias("did_effect"),
        F.col("n_tpre").alias("n_treat_pre"),
        F.col("n_tpost").alias("n_treat_post"),
        F.col("n_cpre").alias("n_control_pre"),
        F.col("n_cpost").alias("n_control_post"))


@op("agg_propensity_stratified", oracle="""
WITH labeled AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
           CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(least(floor(value / 100.0), 4) AS BIGINT) AS band,
           CAST(value AS DECIMAL(18,2)) AS v
    FROM events
), cells AS (
    SELECT dow, band, count(*) AS n,
           CAST(SUM(treat) AS DOUBLE) / count(*) AS e
    FROM labeled GROUP BY dow, band
), strata AS (
    SELECT dow, band, ntile(5) OVER (ORDER BY e, dow, band) AS stratum
    FROM cells
), joined AS (
    SELECT s.stratum, l.treat, l.v
    FROM labeled l JOIN strata s ON s.dow = l.dow AND s.band = l.band
), per AS (
    SELECT stratum,
           CAST(SUM(treat) AS BIGINT) AS n_treat,
           CAST(count(*) - SUM(treat) AS BIGINT) AS n_control,
           CAST(SUM(CASE WHEN treat = 1 THEN v END) AS DOUBLE)
               / SUM(treat) AS mean_t,
           CAST(SUM(CASE WHEN treat = 0 THEN v END) AS DOUBLE)
               / (count(*) - SUM(treat)) AS mean_c
    FROM joined GROUP BY stratum
), att AS (
    SELECT SUM(CAST(floor((mean_t - mean_c) * n_treat * 1000000000)
                    AS BIGINT)) / 1000000000
               / SUM(n_treat) AS att
    FROM per
)
SELECT p.stratum, p.n_treat, p.n_control,
       round(p.mean_t, 6) AS mean_treat,
       round(p.mean_c, 6) AS mean_control,
       round(p.mean_t - p.mean_c, 6) AS effect,
       round(a.att, 6) AS att
FROM per p CROSS JOIN att a
""", tier=3, section="2.4")
def agg_propensity_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-stratified treatment effect (Rosenbaum & Rubin 1983,
    public): estimate each covariate cell's treatment propensity from
    the data, bin the cells into 5 propensity strata, compare treated
    vs control means WITHIN each stratum, and weight the per-stratum
    effects by treated mass into the ATT — the estimator that removes
    confounding a raw mean comparison keeps, finishing the
    observational-causal family (agg_diff_in_diff handles the temporal
    axis; this handles covariate imbalance).

    Scale shape: one aggregate to the (weekday × value-band) cell grid
    estimates propensities; strata come from ntile over that tiny grid;
    the fact table is touched twice — once for cells, once joined back
    to the broadcastable stratum map for the within-stratum means
    (decimal-exact sums). The ATT weighting rides the 1e-9 fixed-point
    grid so the cross-stratum sum is an integer aggregate.
    """
    ev = load(spark, sf_dir, "events")
    iso = F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("long")
    labeled = ev.select(
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("treat"),
        iso.alias("dow"),
        F.least(F.floor(F.col("value") / 100.0), F.lit(4)).cast("long")
         .alias("band"),
        F.col("value").cast("decimal(18,2)").alias("v"))
    cells = labeled.groupBy("dow", "band").agg(
        F.count("*").alias("n"),
        (F.sum("treat").cast("double") / F.count("*")).alias("e"))
    ws = Window.orderBy("e", "dow", "band")
    strata = cells.select("dow", "band",
                          F.ntile(5).over(ws).alias("stratum"))
    joined = labeled.join(F.broadcast(strata), ["dow", "band"])
    n_treat = F.sum("treat")
    n_control = F.count("*") - F.sum("treat")
    per = joined.groupBy("stratum").agg(
        n_treat.cast("long").alias("n_treat"),
        n_control.cast("long").alias("n_control"),
        (F.sum(F.when(F.col("treat") == 1, F.col("v"))).cast("double")
         / n_treat).alias("mean_t"),
        (F.sum(F.when(F.col("treat") == 0, F.col("v"))).cast("double")
         / n_control).alias("mean_c"))
    wall = Window.partitionBy()
    att_fx = F.floor((F.col("mean_t") - F.col("mean_c"))
                     * F.col("n_treat") * 1_000_000_000).cast("long")
    per = per.withColumn(
        "att", F.sum(att_fx).over(wall) / 1_000_000_000
               / F.sum("n_treat").over(wall))
    return per.select("stratum", "n_treat", "n_control",
                      F.round("mean_t", 6).alias("mean_treat"),
                      F.round("mean_c", 6).alias("mean_control"),
                      F.round(F.col("mean_t") - F.col("mean_c"), 6)
                       .alias("effect"),
                      F.round("att", 6).alias("att"))


@op("agg_association_rules", oracle="""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey % 100 AS item
    FROM lineitem
), n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
supp AS (
    SELECT item, count(*) AS s FROM items GROUP BY item
), pairs AS (
    SELECT a.item AS ante, b.item AS cons, count(*) AS together
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.item <> b.item
    GROUP BY 1, 2
)
, joined AS (
    SELECT p.ante, p.cons, p.together, sa.s AS sa, sc.s AS sc, n.n
    FROM pairs p
    JOIN supp sa ON sa.item = p.ante
    JOIN supp sc ON sc.item = p.cons
    CROSS JOIN n_orders n
    WHERE CAST(p.together AS DOUBLE) / sa.s >= 0.05 AND p.together >= 10
)
SELECT ante, cons, together,
       round(CAST(together AS DOUBLE) / n, 6) AS support,
       round(CAST(together AS DOUBLE) / sa, 6) AS confidence,
       round(CAST(together AS DOUBLE) * n
             / (CAST(sa AS DOUBLE) * sc), 6) AS lift,
       row_number() OVER (ORDER BY CAST(together AS DOUBLE) / sa DESC,
                          ante, cons) AS rnk
FROM joined
""", tier=3, section="2.4")
def agg_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from 2-item co-occurrence: for each DIRECTED
    pair (antecedent → consequent), support, confidence
    P(cons|ante) and lift, filtered to confidence ≥ 0.05 with minimum
    absolute support — the Apriori output shape for k=2 (the step after
    join_market_basket's undirected lift ranking: rules are directional,
    which is what a recommender acts on).

    The confidence threshold IS the Apriori pruning: at 100 TB the same
    support aggregate feeds the candidate cut before any wider join.
    Dedup to the incidence list first (fan-out bounded by basket size),
    one pair aggregate, supports broadcast back. Counts and ratios are
    exact integers/single divisions — engine-identical.
    """
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey",
                      (F.col("l_partkey") % 100).alias("item")).distinct()
    n_orders = items.agg(
        F.countDistinct("l_orderkey").alias("n"))
    supp = items.groupBy("item").agg(F.count("*").alias("s"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.item") != F.col("b.item")))
              .groupBy(F.col("a.item").alias("ante"),
                       F.col("b.item").alias("cons"))
              .agg(F.count("*").alias("together")))
    sa = F.broadcast(supp.select(F.col("item").alias("ante"),
                                 F.col("s").alias("sa")))
    sc = F.broadcast(supp.select(F.col("item").alias("cons"),
                                 F.col("s").alias("sc")))
    conf = F.col("together").cast("double") / F.col("sa")
    out = (pairs.join(sa, "ante").join(sc, "cons")
                .crossJoin(F.broadcast(n_orders))
                .filter((conf >= 0.05) & (F.col("together") >= 10)))
    w = Window.orderBy(conf.desc(), "ante", "cons")
    return out.select(
        "ante", "cons", "together",
        F.round(F.col("together").cast("double") / F.col("n"), 6)
         .alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(F.col("together").cast("double") * F.col("n")
                / (F.col("sa").cast("double") * F.col("sc")), 6)
         .alias("lift"),
        F.row_number().over(w).alias("rnk"))


@op("dq_referential_integrity", oracle="""
WITH checks AS (
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           (SELECT count(*) FROM lineitem) AS n_child,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphan
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
)
SELECT fk, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphan AS BIGINT) AS n_orphan,
       round(CAST(n_orphan AS DOUBLE) / n_child, 6) AS orphan_rate
FROM checks
""", tier=3, section="2.3")
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's four foreign
    keys: child count, orphan count (children whose parent key does not
    exist) and orphan rate per relationship — the join-quality check
    that must run BEFORE any fact-dimension join is trusted, because a
    silently growing orphan rate turns inner joins into row loss.

    Each check is one LEFT ANTI join counted — the parent side is
    dimension-sized (broadcast); the child side streams. Four checks
    union into one report. On this corpus every rate is 0.0 — the value
    the oracle pins; on a real lake this op is the canary.
    """
    def check(child: DataFrame, ckey: str, parent: DataFrame,
              pkey: str, name: str) -> DataFrame:
        # fully lazy: no driver-side .count() at plan-build time (the
        # io.py tripwire lesson — nothing eager on the queries() path)
        tot = child.agg(F.count("*").cast("long").alias("n_child"))
        orph = (child.join(
                    F.broadcast(parent.select(F.col(pkey).alias(ckey))),
                    ckey, "left_anti")
                .agg(F.count("*").cast("long").alias("n_orphan")))
        return (tot.crossJoin(F.broadcast(orph))
                   .select(F.lit(name).alias("fk"), "n_child", "n_orphan",
                           F.round(F.col("n_orphan").cast("double")
                                   / F.col("n_child"), 6)
                            .alias("orphan_rate")))

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return (check(li, "l_orderkey", o, "o_orderkey",
                  "lineitem.l_orderkey -> orders")
            .unionAll(check(o, "o_custkey", c, "c_custkey",
                            "orders.o_custkey -> customer"))
            .unionAll(check(c, "c_nationkey", n, "n_nationkey",
                            "customer.c_nationkey -> nation"))
            .unionAll(check(s, "s_nationkey", n, "n_nationkey",
                            "supplier.s_nationkey -> nation")))


# --------------------------------------------------------------------------
# Round-7 wave (SURVEY.md §2.18)
# --------------------------------------------------------------------------


@op("agg_entropy_by_key", oracle="""
WITH dist AS (
    SELECT user_id, event_type, count(*) AS c,
           sum(count(*)) OVER (PARTITION BY user_id) AS n
    FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(min(n) AS BIGINT) AS n_events,
       count(*) AS n_types,
       round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)),
             6) AS type_entropy
FROM dist GROUP BY user_id
""", tier=3, section="2.4")
def agg_entropy_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type distribution —
    the behavioral-diversity feature (bots pin near 0, organic traffic
    spreads) and the direct grouped twin of ``text_char_entropy``'s
    per-doc form. Exact counts; the ≤5-term p·ln p sum is far inside
    the 6dp rounding in both engines.

    Two hash aggregates keyed by user (the second over the ≤5-row
    per-user distribution) — map-side combinable, no joins."""
    ev = load(spark, sf_dir, "events")
    dist = (ev.groupBy("user_id", "event_type")
              .agg(F.count("*").alias("c"))
              .withColumn("n", F.sum("c").over(
                  Window.partitionBy("user_id"))))
    p = F.col("c").cast("double") / F.col("n")
    return (dist.groupBy("user_id")
                .agg(F.min("n").cast("long").alias("n_events"),
                     F.count("*").alias("n_types"),
                     F.round(-F.sum(p * F.log(p)), 6)
                      .alias("type_entropy")))


@op("dq_null_profile", oracle="""
SELECT 'event_id' AS col_name, count(*) AS n_rows,
       count(*) - count(event_id) AS n_null,
       count(DISTINCT event_id) AS n_distinct FROM events
UNION ALL
SELECT 'ts', count(*), count(*) - count(ts),
       count(DISTINCT ts) FROM events
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       count(DISTINCT user_id) FROM events
UNION ALL
SELECT 'event_type', count(*), count(*) - count(event_type),
       count(DISTINCT event_type) FROM events
UNION ALL
SELECT 'value', count(*), count(*) - count(value),
       count(DISTINCT value) FROM events
UNION ALL
SELECT 'props', count(*), count(*) - count(props),
       count(DISTINCT props) FROM events
""", tier=3, section="2.4")
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness/cardinality profile of the events table —
    the first screen of any data-quality audit (a column whose null rate
    or distinct count jumps between loads is the classic silent-breakage
    signal; `dq_load_anomaly` is the per-load twin).

    ONE pass over the table: all 18 aggregates (3 per column) compute in
    a single global hash aggregate, then a 1-row x 18-col frame unpivots
    JVM-side via stack() — the oracle's 6 UNION ALL scans state the same
    values declaratively. count(DISTINCT) at this arity is exact;
    at extreme cardinality a production profile would swap in
    approx_count_distinct per the documented `agg_approx_distinct`
    trade."""
    ev = load(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = []
    for c in cols:
        aggs += [F.count("*").alias(f"{c}__rows"),
                 (F.count("*") - F.count(c)).alias(f"{c}__null"),
                 F.countDistinct(c).alias(f"{c}__dist")]
    one = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__dist" for c in cols)
    return one.select(F.expr(
        f"stack({len(cols)}, {stack}) AS "
        f"(col_name, n_rows, n_null, n_distinct)"))


# --------------------------------------------------------------------------
# Round-7 wave §2.19 — CDC merge, referential audit, co-purchase graph.
# --------------------------------------------------------------------------


@op("cdc_apply_changes", oracle="""
WITH ranked AS (
    SELECT user_id, event_type, value, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_changes,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id) AS BIGINT) AS n_deletes
    FROM events
)
SELECT user_id, round(value, 2) AS current_value,
       ts AS last_change_ts, n_changes, n_deletes
FROM ranked WHERE rn = 1 AND event_type <> 'error'
""", tier=3, section="2.13")
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (the MERGE-into-snapshot shape next to
    `dim_scd2_upsert`): events are a keyed change stream — `error` rows
    are DELETEs, everything else an UPSERT of the key's value. Replay in
    (ts, event_id) order and return the final snapshot: keys whose LAST
    change was a delete vanish; survivors carry the last value, the
    change timestamp, and apply-audit counts.

    Determinism: the winner per key is picked by row_number with the
    event_id tiebreak — replaying the same changelog always yields the
    byte-identical snapshot (idempotent re-runs, the CDC contract).

    Scale shape: one key-partitioned window pass (bounded by per-key
    change count); counts ride the same partition — one shuffle total,
    no joins, no state."""
    ev = load(spark, sf_dir, "events")
    wk = Window.partitionBy("user_id")
    wo = wk.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    is_del = F.when(F.col("event_type") == "error", 1).otherwise(0)
    ranked = (ev.withColumn("rn", F.row_number().over(wo))
                .withColumn("n_changes", F.count("*").over(wk))
                .withColumn("n_deletes",
                            F.sum(is_del).over(wk).cast("long")))
    return (ranked.filter((F.col("rn") == 1)
                          & (F.col("event_type") != "error"))
                  .select("user_id",
                          F.round("value", 2).alias("current_value"),
                          F.col("ts").alias("last_change_ts"),
                          "n_changes", "n_deletes"))


#: The ONE definition of the support->=2 co-purchase edge set (parts
#: co-occurring in >= 2 distinct orders, pa < pb) — shared verbatim by
#: the oracles of the triangle census, label propagation and degree
#: assortativity so the "same edge set" their docstrings promise is
#: enforced by construction, not by comment.
_DUCK_COPURCHASE_E = """op_pairs AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
    SELECT a.p AS pa, b.p AS pb
    FROM op_pairs a JOIN op_pairs b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2 HAVING count(*) >= 2
)"""

#: Memoized cached co-purchase edge frame, keyed by (applicationId,
#: sf_dir). The edge build re-runs the lineitem fan-out per plan
#: REFERENCE without a cache, and the four graph ops reference it 3-5
#: times each — one shared cached frame bounds both the recompute and
#: the cache-leak. Single-active-dataset assumption (documented per
#: ADVICE r7): the cache keeps ONE edge frame per session; switching
#: sf_dir evicts the previous entry with unpersist(blocking=False), so
#: a still-lazy plan built from the evicted frame silently recomputes
#: (correct results, just uncached). The graph ops here build and
#: return their plans against one dataset at a time, so this never
#: bites in practice; a lock guards the dict for concurrent op
#: registration/execution threads.
_COPURCHASE_CACHE: dict = {}
_COPURCHASE_LOCK = __import__("threading").Lock()


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pa, pb) support->=2 co-purchase edges, pa < pb — the Spark twin
    of `_DUCK_COPURCHASE_E`, cached once per (application, sf_dir)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _COPURCHASE_LOCK:
        hit = _COPURCHASE_CACHE.get(key)
        if hit is not None:
            return hit
        evicted = [_COPURCHASE_CACHE.pop(k) for k in list(_COPURCHASE_CACHE)]
    for old in evicted:
        try:
            # non-blocking: executors drop the blocks asynchronously, so
            # an in-flight job reading the old frame finishes first.
            old.unpersist(blocking=False)
        except Exception:
            pass
    op_pairs = (load(spark, sf_dir, "lineitem")
                .select(F.col("l_orderkey").alias("o"),
                        F.col("l_partkey").alias("p")).distinct())
    b = op_pairs.select("o", F.col("p").alias("pb"))
    e = (op_pairs.join(b, ["o"]).where(F.col("p") < F.col("pb"))
                 .groupBy(F.col("p").alias("pa"), "pb")
                 .agg(F.count("*").alias("w"))
                 .where(F.col("w") >= 2).select("pa", "pb")
                 .cache())
    with _COPURCHASE_LOCK:
        won = _COPURCHASE_CACHE.setdefault(key, e)
    if won is not e:
        # ADVICE r8: a thread that lost the setdefault race must drop its
        # freshly cache()-marked duplicate, or the loser's frame stays
        # flagged persistent forever (storage leak under concurrency).
        e.unpersist(blocking=False)
    return won


@op("graph_copurchase_triangles", oracle=f"""
WITH {_DUCK_COPURCHASE_E}, deg AS (
    SELECT p, count(*) AS d FROM (
        SELECT pa AS p FROM e UNION ALL SELECT pb AS p FROM e
    ) GROUP BY 1
), tri AS (
    SELECT count(*) AS n_triangles
    FROM e e1 JOIN e e2 ON e2.pa = e1.pb
              JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       round(CASE WHEN (SELECT sum(d * (d - 1)) FROM deg) > 0 THEN
             CAST(3 * (SELECT n_triangles FROM tri) * 2 AS DOUBLE)
             / (SELECT sum(d * (d - 1)) FROM deg) END, 6)
           AS global_clustering
""", tier=3, section="2.15")
def graph_copurchase_triangles(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Triangle census of the co-purchase graph: parts are nodes, an
    edge = two parts co-occurring in >= 2 distinct orders (the support
    floor that keeps edge density sane at scale), plus the global
    clustering coefficient 3*triangles/wedges — the graph-structure
    summary behind recommendation and community features, sibling of
    `graph_neighbor_jaccard`.

    Triangle counting uses the ordered-edge identity (pa < pb < pc):
    each triangle is generated exactly once by joining e1=(a,b),
    e2=(b,c), e3=(a,c) — no division by 6, no orientation dedup.

    Scale shape: edge generation fans out per order bounded by order
    size (distinct parts per order, <= ~tens), aggregated map-side;
    the support filter prunes the edge set BEFORE the triangle
    self-joins, which shuffle on edge endpoints — the standard
    distributed triangle recipe. All downstream frames are edge-sized,
    never fact-sized. The edge frame comes from the shared
    `_copurchase_edges` cache (referenced by 5 subtrees here; without
    it each reference re-runs the per-order fan-out — 5 fact scans,
    verified in the physical plan)."""
    e = _copurchase_edges(spark, sf_dir)
    deg = (e.select(F.col("pa").alias("p"))
            .unionAll(e.select(F.col("pb").alias("p")))
            .groupBy("p").agg(F.count("*").alias("d")))
    e2 = e.select(F.col("pa").alias("b2"), F.col("pb").alias("pc"))
    e3 = e.select(F.col("pa").alias("a3"), F.col("pb").alias("c3"))
    tri = (e.join(e2, F.col("b2") == F.col("pb"))
            .join(e3, (F.col("a3") == F.col("pa"))
                  & (F.col("c3") == F.col("pc")))
            .agg(F.count("*").alias("n_triangles")))
    nodes = deg.agg(F.count("*").alias("n_nodes"),
                    F.sum(F.col("d") * (F.col("d") - 1)).alias("wedges2"))
    edges = e.agg(F.count("*").alias("n_edges"))
    return (nodes.crossJoin(edges).crossJoin(tri)
            .select("n_nodes", "n_edges", "n_triangles",
                    F.round(F.when(
                        F.col("wedges2") > 0,
                        (3 * F.col("n_triangles") * 2).cast("double")
                        / F.col("wedges2")), 6)
                     .alias("global_clustering")))


@op("dq_freshness_lag", oracle="""
WITH per AS (
    SELECT event_type, max(ts) AS latest_ts, count(*) AS n_events
    FROM events GROUP BY 1
), gmax AS (SELECT max(latest_ts) AS global_ts FROM per)
SELECT p.event_type, p.latest_ts, CAST(p.n_events AS BIGINT) AS n_events,
       CAST((epoch_us(g.global_ts) - epoch_us(p.latest_ts)) // 60000000
            AS BIGINT) AS lag_minutes,
       CASE WHEN epoch_us(g.global_ts) - epoch_us(p.latest_ts)
                 > 3600000000 THEN 1 ELSE 0 END AS is_stale
FROM per p CROSS JOIN gmax g
""", tier=3, section="2.13")
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness monitor: each channel's latest event vs the
    newest event anywhere, as whole-minute lag plus a stale flag (>1 h
    behind) — the feed-died-silently alarm every ingest dashboard leads
    with (a source that stops producing never violates a row-level
    expectation; only its absence shows).

    Scale shape: one map-side-combinable hash aggregate to a
    |sources|-row frame; the global max joins back as a 1-row cross
    join. Integer-microsecond lag arithmetic (floor division to
    minutes), exact cross-engine."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"), F.count("*").alias("n_events"))
    glob = per.agg(F.max("latest_ts").alias("global_ts"))
    lag_us = (F.unix_micros("global_ts") - F.unix_micros("latest_ts"))
    return per.crossJoin(F.broadcast(glob)).select(
        "event_type", "latest_ts",
        F.col("n_events").cast("long").alias("n_events"),
        F.floor(lag_us / 60_000_000).cast("long").alias("lag_minutes"),
        (lag_us > 3_600_000_000).cast("int").alias("is_stale"))


@op("dq_pk_uniqueness", oracle="""
WITH per AS (
    SELECT 'events' AS table_name, count(*) AS n_rows,
           count(DISTINCT event_id) AS n_keys FROM events
    UNION ALL
    SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'customer', count(*), count(DISTINCT c_custkey) FROM customer
    UNION ALL
    SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
    UNION ALL
    SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
    UNION ALL
    SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
    UNION ALL
    SELECT 'embeddings', count(*), count(DISTINCT vec_id) FROM embeddings
    UNION ALL
    SELECT 'lineitem', count(*),
           count(DISTINCT l_orderkey * 16 + l_linenumber) FROM lineitem
)
SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_rows - n_keys AS BIGINT) AS dup_rows,
       CAST(n_rows = n_keys AS INT) AS is_unique
FROM per
""", tier=3, section="2.4")
def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across every corpus table: row
    count, distinct-key count, duplicate surplus, and a pass flag — the
    PK side of the load gate whose FK side is
    `dq_referential_integrity` (an upsert pipeline that silently
    double-applies a batch shows up here first). lineitem's composite
    key (l_orderkey, l_linenumber) folds into one BIGINT
    (linenumber <= 7 in TPC-H, so *16 is collision-free and cheaper
    than a struct distinct — documented, not a hash).

    Exactness: pure counts.

    Scale shape: one map-side-partial count-distinct aggregate per
    table (Spark expands to the two-phase distinct aggregate), unioned
    into an 8-row report; no joins, no windows. At 100 TB each branch
    is an independent scan — they schedule in parallel and nothing
    shuffles more than the distinct's key exchange."""
    outs = []
    for tbl, key in [("events", F.col("event_id")),
                     ("orders", F.col("o_orderkey")),
                     ("customer", F.col("c_custkey")),
                     ("part", F.col("p_partkey")),
                     ("supplier", F.col("s_suppkey")),
                     ("documents", F.col("doc_id")),
                     ("embeddings", F.col("vec_id")),
                     ("lineitem", F.col("l_orderkey") * 16
                                  + F.col("l_linenumber"))]:
        t = load(spark, sf_dir, tbl)
        outs.append(t.agg(
            F.count("*").alias("n_rows"),
            F.count_distinct(key).alias("n_keys"))
            .select(F.lit(tbl).alias("table_name"), "n_rows", "n_keys"))
    per = outs[0]
    for o in outs[1:]:
        per = per.unionByName(o)
    return per.select(
        "table_name", F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        (F.col("n_rows") - F.col("n_keys")).cast("long").alias("dup_rows"),
        (F.col("n_rows") == F.col("n_keys")).cast("int")
         .alias("is_unique"))


@op("graph_label_propagation", oracle=f"""
WITH {_DUCK_COPURCHASE_E}, sym AS (
    SELECT pa AS p, pb AS q FROM e
    UNION ALL SELECT pb, pa FROM e
), l0 AS (SELECT DISTINCT p, p AS lbl FROM sym),
l1 AS (
    SELECT l0.p, least(l0.lbl, min(n.lbl)) AS lbl
    FROM l0 JOIN sym s ON s.p = l0.p
            JOIN l0 n ON n.p = s.q
    GROUP BY l0.p, l0.lbl
), l2 AS (
    SELECT l1.p, least(l1.lbl, min(n.lbl)) AS lbl
    FROM l1 JOIN sym s ON s.p = l1.p
            JOIN l1 n ON n.p = s.q
    GROUP BY l1.p, l1.lbl
)
SELECT l2.p AS partkey, CAST(l2.lbl AS BIGINT) AS community,
       CAST(c.sz AS BIGINT) AS community_size
FROM l2 JOIN (SELECT lbl, count(*) AS sz FROM l2 GROUP BY 1) c
       ON c.lbl = l2.lbl
""", tier=3, section="2.15")
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round min-label propagation over the co-purchase graph (the
    `graph_copurchase_triangles` edge set: parts sharing >= 2 orders):
    every node starts labeled with its own key and twice adopts the
    minimum label in its closed neighborhood — the deterministic,
    bounded-round community sketch (2 rounds = communities of graph
    radius <= 2; the connected-components limit is
    `dedup_cluster_cc`'s iterate-to-fixpoint). Reports each node's
    community and its size.

    Exactness: min-propagation is order-independent by construction —
    no tie-breaking randomness anywhere.

    Scale shape: each round is one part-keyed equi-join of the label
    frame with the symmetrized edge list plus one min-aggregate — all
    frames are nodes- or edges-sized (support >= 2 prunes the edge
    list BEFORE any self-join), keyed shuffles only, rounds bounded at
    a constant 2, never an unbounded loop. The edge frame comes from
    the shared `_copurchase_edges` cache: each round references sym
    twice, and without the cache every reference re-runs the lineitem
    fan-out."""
    e = _copurchase_edges(spark, sf_dir)
    sym = (e.select(F.col("pa").alias("p"), F.col("pb").alias("q"))
            .unionByName(e.select(F.col("pb").alias("p"),
                                  F.col("pa").alias("q"))))
    lbl = sym.select("p").distinct().withColumn("lbl", F.col("p"))
    for _ in range(2):
        nbr = (sym.join(lbl.select(F.col("p").alias("q"),
                                   F.col("lbl").alias("nlbl")), ["q"])
                  .groupBy("p").agg(F.min("nlbl").alias("mn")))
        lbl = (lbl.join(nbr, ["p"])
                  .select("p", F.least("lbl", "mn").alias("lbl")))
    sz = lbl.groupBy("lbl").agg(F.count("*").alias("sz"))
    return (lbl.join(sz, ["lbl"])
               .select(F.col("p").alias("partkey"),
                       F.col("lbl").cast("long").alias("community"),
                       F.col("sz").cast("long").alias("community_size")))


# ==========================================================================
# §2.23 Round-7 sixth wave — experimentation, graph health, DQ domains
# ==========================================================================

#: Adamic–Adar hub cap: orders touching more than this many parts are
#: dropped BEFORE pairing (a hub order contributes deg² pairs but ~zero
#: per-pair signal — its 1/ln(deg) weight vanishes anyway). Keeps the
#: self-join fan-out bounded at any corpus size.
_AA_MAX_ORDER_DEG = 64


@op("graph_adamic_adar", oracle=f"""
WITH op_pairs AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), odeg AS (
    SELECT o, count(*) AS deg FROM op_pairs GROUP BY 1
    HAVING count(*) BETWEEN 2 AND {_AA_MAX_ORDER_DEG}
), pairs AS (
    SELECT a.p AS pa, b.p AS pb, d.deg
    FROM op_pairs a
    JOIN op_pairs b ON a.o = b.o AND a.p < b.p
    JOIN odeg d ON d.o = a.o
)
SELECT pa, pb, CAST(count(*) AS BIGINT) AS n_common,
       round(sum(1.0 / ln(CAST(deg AS DOUBLE))), 6) AS aa_score
FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2
""", tier=3, section="2.3")
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the order–part bipartite graph:
    for every part pair sharing >= 2 orders, score = sum over common
    orders of 1/ln(order_degree) — the classic common-neighbor metric
    that discounts promiscuous neighbors (an order touching 60 parts
    says little; one touching 2 says a lot). The predictive cousin of
    `graph_neighbor_jaccard` (set overlap) and the edge-scoring input
    a recommender would rank by.

    Exactness: degrees are integers, so every 1/ln(deg) weight is the
    identical double on both engines; per-pair sums run over <= deg_cap
    terms (ulp drift << 1e-6) and round(6) seals it.

    Scale shape: dedup to (order, part) incidence (one shuffle), drop
    hub orders ABOVE the documented degree cap before the order-keyed
    self-join (fan-out per order <= C(64,2), never |parts|²), one hash
    aggregate on the pair key. The support >= 2 HAVING keeps the output
    an edge list, not a cross product."""
    op_pairs = (load(spark, sf_dir, "lineitem")
                .select(F.col("l_orderkey").alias("o"),
                        F.col("l_partkey").alias("p"))
                .distinct())
    odeg = (op_pairs.groupBy("o").agg(F.count("*").alias("deg"))
                    .where((F.col("deg") >= 2)
                           & (F.col("deg") <= _AA_MAX_ORDER_DEG)))
    # Join odeg BEFORE the self-join so hub orders (deg > cap) are
    # physically gone before any pairing — the C(deg,2) fan-out bound in
    # the docstring holds in the plan itself, not via optimizer reorder
    # (ADVICE r7: the old post-self-join odeg join left the bound to CBO).
    opd = op_pairs.join(odeg, ["o"])
    pairs = (opd.join(opd.select("o", F.col("p").alias("pb")), ["o"])
                .where(F.col("p") < F.col("pb")))
    return (pairs.groupBy(F.col("p").alias("pa"), "pb")
                 .agg(F.count("*").alias("n_common"),
                      F.sum(F.lit(1.0)
                            / F.log(F.col("deg").cast("double")))
                       .alias("s"))
                 .where(F.col("n_common") >= 2)
                 .select("pa", "pb",
                         F.col("n_common").cast("long").alias("n_common"),
                         F.round("s", 6).alias("aa_score")))


@op("graph_degree_assortativity", oracle=f"""
WITH {_DUCK_COPURCHASE_E}, sym AS (
    SELECT pa AS p, pb AS q FROM e
    UNION ALL SELECT pb, pa FROM e
), deg AS (
    SELECT p, count(*) AS d FROM sym GROUP BY 1
), ed AS (
    SELECT dp.d AS dx, dq.d AS dy
    FROM sym s JOIN deg dp ON dp.p = s.p JOIN deg dq ON dq.p = s.q
), mom AS (
    SELECT count(*) AS n, sum(dx) AS sx, sum(dy) AS sy,
           sum(dx * dx) AS sxx, sum(dy * dy) AS syy,
           sum(dx * dy) AS sxy
    FROM ed
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       round(CAST(sx AS DOUBLE) / n, 6) AS mean_deg,
       round(CASE WHEN (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx)
                       * (CAST(n AS DOUBLE) * syy
                          - CAST(sy AS DOUBLE) * sy) > 0
             THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx
                          - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy))
             END, 6) AS assortativity
FROM mom
""", tier=3, section="2.3")
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the support>=2 co-purchase graph (the
    `graph_label_propagation` edge set): Pearson correlation of endpoint
    degrees over the symmetrized edge list — one scalar that says
    whether hubs attach to hubs (r > 0, social-network shape) or to
    leaves (r < 0, hub-and-spoke shape). The graph-health companion to
    the triangle census.

    Exactness: all six moments are integer sums over integer degrees;
    the correlation is one closed-form double expression over them.

    Scale shape: edges (one self-join bounded by order degree), a
    degree count (one shuffle), two degree lookups joined back onto the
    edge list, then a single map-side-combinable moment aggregate to
    ONE row. Degrees are bounded by the co-purchase support filter, so
    the integer moments stay in BIGINT range far past 100 TB (dx*dy <=
    deg_max² ~ 1e8 per row). The edge frame comes from the shared
    `_copurchase_edges` cache (sym is referenced three times here)."""
    e = _copurchase_edges(spark, sf_dir)
    sym = (e.select(F.col("pa").alias("p"), F.col("pb").alias("q"))
            .unionByName(e.select(F.col("pb").alias("p"),
                                  F.col("pa").alias("q"))))
    deg = sym.groupBy("p").agg(F.count("*").alias("d"))
    ed = (sym.join(deg.select(F.col("p"), F.col("d").alias("dx")), ["p"])
             .join(deg.select(F.col("p").alias("q"),
                              F.col("d").alias("dy")), ["q"]))
    mom = ed.agg(F.count("*").alias("n"),
                 F.sum("dx").alias("sx"), F.sum("dy").alias("sy"),
                 F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
                 F.sum(F.col("dy") * F.col("dy")).alias("syy"),
                 F.sum(F.col("dx") * F.col("dy")).alias("sxy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    varp = ((n * F.col("sxx") - sx * F.col("sx"))
            * (n * F.col("syy") - sy * F.col("sy")))
    return mom.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.round(F.try_divide(sx, n), 6).alias("mean_deg"),
        F.round(F.when(varp > 0,
                       (n * F.col("sxy") - sx * F.col("sy"))
                       / F.sqrt(varp)), 6).alias("assortativity"))


#: CUPED pre/post boundary: the corpus covers 2024-01-01..-30 (probed,
#: FIXTURES.md), so day 16 splits it into a 15-day covariate window and
#: a 15-day experiment window. A production run parameterizes this.
_CUPED_CUT = "2024-01-16"


@op("agg_cuped_adjustment", oracle=f"""
WITH per_user AS (
    SELECT user_id,
           sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS x,
           sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS y
    FROM events GROUP BY 1
), mom AS (
    SELECT count(*) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
           sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
           sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
    FROM per_user
)
SELECT CAST(n AS BIGINT) AS n_users,
       round(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             END, 6) AS theta,
       round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
             THEN pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             END, 6) AS var_reduction
FROM mom
""", tier=3, section="2.4")
def agg_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data) variance
    reduction: per user, X = pre-period spend and Y = experiment-period
    spend on the exact cents grid; theta = cov(X,Y)/var(X) is the
    adjustment coefficient and var_reduction = corr(X,Y)² is the
    fraction of metric variance the adjusted estimator Y - theta·(X-X̄)
    removes — the first number an experimentation platform computes
    before any A/B readout. Companions: `agg_ab_proportion_test` /
    `agg_welch_t_test` (the tests CUPED sharpens) and
    `agg_diff_in_diff`.

    Exactness: X/Y are exact BIGINT cents via ONE conditional aggregate
    (no self-join), the six moments are exact DECIMAL(38) sums, and
    theta/rho² are closed-form doubles over them, round(6)-sealed.

    Scale shape: one user-keyed hash aggregate over the fact scan, then
    one map-side-combinable moment aggregate to a single row. The
    decimal moments keep x² exact far past BIGINT range (per-user cents
    up to ~1e9 → x² ~ 1e18·users would overflow BIGINT at ~10 TB)."""
    ev = load(spark, sf_dir, "events")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    cents = (dec2("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0)).alias("y"))
    d38 = "decimal(38,0)"
    mom = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    return mom.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(F.when(varx_n > 0, cov_n / varx_n), 6).alias("theta"),
        F.round(F.when(varx_n * vary_n > 0,
                       F.pow(cov_n, F.lit(2.0)) / (varx_n * vary_n)), 6)
         .alias("var_reduction"))


#: Accepted-value domains for the corpus's enum-like columns — the audit
#: config a warehouse would keep in version control next to its schemas.
_DQ_DOMAINS = [
    ("events", "event_type",
     ["click", "error", "purchase", "signup", "view"]),
    ("orders", "o_orderstatus", ["F", "O", "P"]),
    ("orders", "o_orderpriority",
     ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
    ("customer", "c_mktsegment",
     ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]),
    ("documents", "lang", ["de", "en", "es", "fr", "zh"]),
]


@op("dq_accepted_values", oracle="\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
       CAST({c} AS VARCHAR) AS value, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST({c} AS VARCHAR) IN ({", ".join(repr(v) for v in vals)})
            AS INT) AS is_expected
FROM {t} GROUP BY 1, 2, 3""" for t, c, vals in _DQ_DOMAINS),
    tier=3, section="2.4")
def dq_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accepted-values audit (dbt's `accepted_values` test, warehouse-
    wide): for every enum-like column, the observed distinct values with
    counts and a flag for membership in the declared domain — the
    categorical sibling of `dq_pk_uniqueness` (keys) and
    `dq_expectation_report` (ranges). A new unexpected value is the
    first symptom of an upstream enum change.

    Exactness: pure counts + set membership.

    Scale shape: one map-side-combinable hash aggregate per audited
    column (cardinality = the enum's, i.e. tiny), unioned into a report
    frame; the domain list is a literal IN — no joins, and the branches
    schedule in parallel."""
    outs = []
    for t, c, vals in _DQ_DOMAINS:
        outs.append(
            load(spark, sf_dir, t)
            .groupBy(F.col(c).cast("string").alias("value"))
            .agg(F.count("*").alias("n"))
            .select(F.lit(t).alias("table_name"),
                    F.lit(c).alias("column_name"), "value",
                    F.col("n").cast("long").alias("n"),
                    F.col("value").isin(vals).cast("int")
                     .alias("is_expected")))
    rep = outs[0]
    for o in outs[1:]:
        rep = rep.unionByName(o)
    return rep


# ==========================================================================
# §2.24 Round-7 seventh wave — experimentation guardrails, concentration
# ==========================================================================

#: DuckDB twin of api.hash32 — the engine's portable deterministic draw.
from ..api import DUCK_H32 as _DUCK_H32  # one shared definition

#: Chi-square critical value at alpha = 0.05, 1 degree of freedom — the
#: conventional SRM alarm threshold.
_SRM_CHI2_CRIT = 3.841459


@op("agg_srm_check", oracle=f"""
WITH arms AS (
    SELECT {_DUCK_H32.format(c="CAST(user_id AS VARCHAR)")} % 2 AS arm
    FROM (SELECT DISTINCT user_id FROM events)
), c AS (
    SELECT count(*) AS n,
           sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1
    FROM arms
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
       round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / n, 6) AS chi2,
       CAST(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / n > {_SRM_CHI2_CRIT}
            AS INT) AS srm_flag
FROM c
""", tier=3, section="2.4")
def agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: users hash-split 50/50 into two
    arms (the engine's portable md5 draw, stable under appends), then
    the 1-df chi-square goodness-of-fit statistic (n0-n1)²/n against the
    designed ratio with the conventional alpha=0.05 alarm flag — the
    FIRST check an experimentation platform runs, because a biased
    assignment invalidates every downstream readout
    (`agg_welch_t_test`, `agg_ab_proportion_test`,
    `agg_cuped_adjustment`).

    Exactness: arm is an exact integer hash residue, counts are exact,
    chi2 is one double division, round(6); the flag compares the same
    double to the same literal on both engines.

    Scale shape: one distinct (user-keyed shuffle) + one
    map-side-combinable conditional count to a single row. No joins."""
    users = load(spark, sf_dir, "events").select("user_id").distinct()
    arm = api.hash32(F.col("user_id").cast("string")) % 2
    c = users.select(arm.alias("arm")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"))
    d = F.col("n0") - F.col("n1")
    chi2 = (d * d).cast("double") / F.col("n")
    return c.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treat"),
        r6(chi2).alias("chi2"),
        (chi2 > F.lit(_SRM_CHI2_CRIT)).cast("int").alias("srm_flag"))


#: z_{alpha/2} + z_{power} for the standard 5% two-sided / 80% power
#: design — the multiplier in the classical two-sample MDE formula.
_MDE_Z_SUM = 1.959964 + 0.841621


@op("agg_ab_power_mde", oracle=f"""
WITH per_user AS (
    SELECT user_id,
           {_DUCK_H32.format(c="CAST(user_id AS VARCHAR)")} % 2 AS arm,
           sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS y
    FROM events GROUP BY 1, 2
), m AS (
    SELECT arm, count(*) AS n, sum(y) AS sy,
           sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
    FROM per_user GROUP BY 1
), p AS (
    SELECT
      sum(CASE WHEN arm = 0 THEN n END) AS n0,
      sum(CASE WHEN arm = 1 THEN n END) AS n1,
      sum(CASE WHEN arm = 0 THEN sy END) AS sy0,
      sum(CASE WHEN arm = 0 THEN CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n END) AS ss0,
      sum(CASE WHEN arm = 1 THEN CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n END) AS ss1
    FROM m
)
SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
       round(CAST(sy0 AS DOUBLE) / n0 / 100, 6) AS mean_control,
       round(sqrt((ss0 + ss1) / (n0 + n1 - 2)) / 100, 6) AS sd_pooled,
       round({_MDE_Z_SUM} * sqrt((ss0 + ss1) / (n0 + n1 - 2)
                                 * (1.0 / n0 + 1.0 / n1)) / 100, 6)
           AS mde_abs,
       round(CASE WHEN sy0 > 0
             THEN {_MDE_Z_SUM} * sqrt((ss0 + ss1) / (n0 + n1 - 2)
                                      * (1.0 / n0 + 1.0 / n1))
                  / (CAST(sy0 AS DOUBLE) / n0) END, 6) AS mde_rel
FROM p
""", tier=3, section="2.4")
def agg_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis: the minimum detectable effect (absolute and
    relative) of the standard two-sample design at alpha=0.05 two-sided
    / 80% power, from the hash-split arms' pooled variance of per-user
    experiment-period spend — the pre-launch answer to "is this
    experiment even worth running at this traffic?". Companion to
    `agg_srm_check` (same deterministic split) and `agg_welch_t_test`
    (the readout the MDE sizes).

    Exactness: per-user cents and per-arm moments are exact
    BIGINT/DECIMAL(38) sums; pooled variance, sd and the MDE are one
    closed-form double expression evaluated identically cross-engine;
    round(6) seals the outputs (reported in value units, /100).

    Scale shape: one user-keyed hash aggregate, one 2-row arm
    aggregate, one scalar projection. No joins, no windows."""
    ev = load(spark, sf_dir, "events")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    cents = (dec2("value") * 100).cast("long")
    per_user = (ev.groupBy(
                    "user_id",
                    (api.hash32(F.col("user_id").cast("string")) % 2)
                    .alias("arm"))
                  .agg(F.sum(F.when(F.col("ts") >= cut, cents)
                             .otherwise(0)).alias("y")))
    m = per_user.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("y").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"))
    ss = (F.col("syy").cast("double")
          - F.col("sy").cast("double") * F.col("sy").cast("double")
          / F.col("n"))
    p = m.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("sy"))).alias("sy0"),
        F.sum(F.when(F.col("arm") == 0, ss)).alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, ss)).alias("ss1"))
    n0, n1 = F.col("n0"), F.col("n1")
    s2 = (F.col("ss0") + F.col("ss1")) / (n0 + n1 - 2)
    mde = F.lit(_MDE_Z_SUM) * F.sqrt(s2 * (1.0 / n0 + 1.0 / n1))
    mean0 = F.col("sy0").cast("double") / n0
    return p.select(
        n0.cast("long").alias("n_control"),
        n1.cast("long").alias("n_treat"),
        r6(mean0 / 100).alias("mean_control"),
        r6(F.sqrt(s2) / 100).alias("sd_pooled"),
        r6(mde / 100).alias("mde_abs"),
        r6(F.when(F.col("sy0") > 0, mde / mean0)).alias("mde_rel"))


@op("agg_ks_two_sample", oracle=f"""
WITH s AS (
    SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
           CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}' THEN 1 ELSE 0 END AS pre
    FROM events
), per_v AS (
    SELECT v, sum(pre) AS c1, sum(1 - pre) AS c2 FROM s GROUP BY 1
), cum AS (
    SELECT sum(c1) OVER (ORDER BY v) AS f1,
           sum(c2) OVER (ORDER BY v) AS f2,
           sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
    FROM per_v
)
SELECT CAST(max(n1) AS BIGINT) AS n_pre, CAST(max(n2) AS BIGINT) AS n_post,
       round(max(abs(CAST(f1 AS DOUBLE) / n1 - CAST(f2 AS DOUBLE) / n2)),
             6) AS ks_stat
FROM cum
""", tier=3, section="2.4")
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the pre- and
    post-cut event-value distributions: D = max |ECDF_pre − ECDF_post|
    evaluated at every distinct value — the distribution-shift test that
    catches a changed value MIX when means stay flat (the moment tests
    `agg_welch_t_test` / `feat_psi_drift_scalable` see nothing).

    Exactness: values land on the exact cents grid, per-value counts
    are exact integers, the two ECDFs are the same double divisions on
    both engines, and D is a max over identically-computed doubles,
    round(6).

    Scale shape: one map-side-combinable hash aggregate collapses the
    fact scan to the DISTINCT-VALUE frame (bounded by the value domain
    — cents in a fixed price range — never by corpus size); the only
    ordered window runs over that bounded frame, then one max-agg to a
    single row. The same shape DuckDB's oracle uses."""
    ev = load(spark, sf_dir, "events")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    per_v = (ev.select((dec2("value") * 100).cast("long").alias("v"),
                       F.when(F.col("ts") < cut, 1).otherwise(0)
                        .alias("pre"))
               .groupBy("v")
               .agg(F.sum("pre").alias("c1"),
                    F.sum(F.lit(1) - F.col("pre")).alias("c2")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = (per_v.select(F.sum("c1").over(w).alias("f1"),
                        F.sum("c2").over(w).alias("f2"))
                .crossJoin(F.broadcast(tot)))
    d = F.abs(F.col("f1").cast("double") / F.col("n1")
              - F.col("f2").cast("double") / F.col("n2"))
    return cum.agg(F.max("n1").cast("long").alias("n_pre"),
                   F.max("n2").cast("long").alias("n_post"),
                   r6(F.max(d)).alias("ks_stat"))


@op("agg_lorenz_deciles", oracle="""
WITH per_user AS (
    SELECT user_id,
           sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
    FROM events GROUP BY 1
), ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents, user_id) AS i,
           count(*) OVER () AS n
    FROM per_user
), bydec AS (
    SELECT (i - 1) * 10 // n + 1 AS decile,
           count(*) AS n_users, sum(cents) AS cents
    FROM ranked GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_users AS BIGINT) AS n_users,
       round(CAST(cents AS DOUBLE) / 100, 6) AS decile_value,
       round(CAST(sum(cents) OVER (ORDER BY decile) AS DOUBLE)
             / sum(cents) OVER (), 6) AS cum_share
FROM bydec
""", tier=3, section="2.4")
def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by spend decile: users ranked by exact-cents total
    spend, cut into 10 equal-count bins, each reporting its user count,
    total value and the CUMULATIVE share of all spend — the
    concentration curve behind `agg_gini` ("the bottom 50% of users
    carry 8% of revenue"), readable where the single coefficient is
    not.

    Exactness: ranks are deterministic ((cents, user_id) total order),
    decile assignment is integer arithmetic, per-decile sums are exact
    BIGINTs, and the two rounded doubles are identical expressions.

    Scale shape: one user-keyed hash aggregate, then the two-phase
    bucketed rank (`api.bucketed_global_rank`: the only ordered window
    runs over the per-$1000-band count table, and the largest sorted
    partition is one band) — NEVER a single-partition sort of the user
    frame — then a 10-row aggregate and a 10-row cumulative window."""
    per_user = (load(spark, sf_dir, "events")
                .groupBy("user_id")
                .agg(F.sum((dec2("value") * 100).cast("long"))
                      .alias("cents")))
    ranked = api.bucketed_global_rank(
        per_user, F.floor(F.col("cents") / F.lit(100_000)).cast("long"),
        [F.col("cents"), F.col("user_id")],
        rank_name="i", total_name="n")
    bydec = (ranked.select(
                 F.expr("(i - 1) * 10 div n").cast("long")
                 .alias("d"), "cents")
                   .groupBy("d")
                   .agg(F.count("*").alias("n_users"),
                        F.sum("cents").alias("cents")))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = (Window.orderBy("d")
                  .rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing))
    return bydec.select(
        (F.col("d") + 1).cast("long").alias("decile"),
        F.col("n_users").cast("long").alias("n_users"),
        r6(F.col("cents").cast("double") / 100).alias("decile_value"),
        r6(F.sum("cents").over(w).cast("double")
           / F.sum("cents").over(wall)).alias("cum_share"))


@op("dq_cross_field", oracle="""
WITH checks AS (
    SELECT 'lineitem_ship_on_or_after_order' AS rule,
           count(*) AS n_checked,
           sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
               AS n_violations
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_discount_in_unit_range', count(*),
           sum(CASE WHEN l_discount < 0 OR l_discount > 1
               THEN 1 ELSE 0 END)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_positive_amounts', count(*),
           sum(CASE WHEN l_quantity <= 0 OR l_extendedprice <= 0
               THEN 1 ELSE 0 END)
    FROM lineitem
    UNION ALL
    SELECT 'orders_totalprice_positive', count(*),
           sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
    FROM orders
    UNION ALL
    SELECT 'events_value_positive', count(*),
           sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END)
    FROM events
)
SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       round(CASE WHEN n_checked > 0
             THEN CAST(n_violations AS DOUBLE) / n_checked END, 6)
           AS violation_rate,
       CAST(n_violations = 0 AS INT) AS passed
FROM checks
""", tier=3, section="2.4")
def dq_cross_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field consistency audit (dbt's expression tests, warehouse-
    wide): each declared rule reports rows checked, violations, rate and
    a pass flag — the relationship-level sibling of `dq_pk_uniqueness`
    (keys), `dq_accepted_values` (domains) and `dq_expectation_report`
    (single-column ranges). The ship-date rule joins lineitem to orders
    and FINDS a real defect in the synthetic corpus: about half the line
    items ship before their order date — exactly the class of silent
    upstream inconsistency this audit exists to surface before a
    duration model trains on negative lead times.

    Exactness: pure counts, one double division, round(6).

    Scale shape: the only join is orderkey-keyed (co-partitioned fact
    tables; broadcast-eligible dimension at small SF); every other rule
    is a map-side-combinable conditional count; the report frame is
    rules-sized and the branches schedule in parallel."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")

    def check(name, df, bad):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count("*").alias("n_checked"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("n_violations"))

    ship = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    # the two single-column lineitem rules share ONE scan/aggregate pass
    # and unpivot to two report rows (vs one full fact scan per rule)
    disc_bad = (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    amt_bad = (F.col("l_quantity") <= 0) | (F.col("l_extendedprice") <= 0)
    li_rules = (li.agg(F.count("*").alias("nc"),
                       F.sum(F.when(disc_bad, 1).otherwise(0)).alias("vd"),
                       F.sum(F.when(amt_bad, 1).otherwise(0)).alias("va"))
                  .select(F.explode(F.array(
                      F.struct(F.lit("lineitem_discount_in_unit_range")
                                .alias("rule"),
                               F.col("nc").alias("n_checked"),
                               F.col("vd").alias("n_violations")),
                      F.struct(F.lit("lineitem_positive_amounts")
                                .alias("rule"),
                               F.col("nc").alias("n_checked"),
                               F.col("va").alias("n_violations"))))
                          .alias("c"))
                  .select("c.*"))
    checks = [
        check("lineitem_ship_on_or_after_order", ship,
              F.col("l_shipdate") < F.col("o_orderdate")),
        li_rules,
        check("orders_totalprice_positive", o,
              F.col("o_totalprice") <= 0),
        check("events_value_positive", ev, F.col("value") <= 0),
    ]
    rep = checks[0]
    for c in checks[1:]:
        rep = rep.unionByName(c)
    # try_divide: NULL (not error/inf) on an empty audited table, the
    # same answer the oracle's CASE WHEN n_checked > 0 guard gives —
    # closes a latent cross-engine divergence on n_checked = 0
    # (ADVICE r7; precedent: graph_degree_assortativity).
    return rep.select(
        "rule", F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.try_divide(F.col("n_violations").cast("double"),
                             F.col("n_checked")), 6)
         .alias("violation_rate"),
        (F.col("n_violations") == 0).cast("int").alias("passed"))


#: Specification limits for the capability index — the corpus's value
#: domain; a production run parameterizes these per characteristic.
_CPK_LSL = 0.0
_CPK_USL = 500.0


@op("agg_capability_cpk", oracle=f"""
WITH stats AS (
    SELECT user_id, count(*) AS n,
           avg(value) AS mu, stddev_samp(value) AS sigma
    FROM events GROUP BY 1 HAVING stddev_samp(value) > 0
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       round(mu, 6) AS mu, round(sigma, 6) AS sigma,
       round(({_CPK_USL} - {_CPK_LSL}) / (6 * sigma), 6) AS cp,
       round(least({_CPK_USL} - mu, mu - {_CPK_LSL}) / (3 * sigma), 6)
           AS cpk
FROM stats
""", tier=3, section="2.4")
def agg_capability_cpk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process capability indices per unit against the documented spec
    limits: Cp = (USL−LSL)/6σ (potential capability) and
    Cpk = min(USL−µ, µ−LSL)/3σ (actual, centering-penalized) — the
    numbers a quality engineer quotes after the SPC chart
    (`ts_spc_violations` / `ts_spc_rules_western`) says the process is
    stable. Cpk ≥ 1.33 is the conventional "capable" bar.

    Exactness: the same avg/stddev double expressions as the SPC family
    (its cross-engine precedent), composed into two closed-form doubles,
    round(6); zero-variance units drop.

    Scale shape: ONE map-side-combinable hash aggregate, then a narrow
    projection. Nothing else."""
    stats = (load(spark, sf_dir, "events")
             .groupBy("user_id")
             .agg(F.count("*").alias("n"), F.avg("value").alias("mu"),
                  F.stddev_samp("value").alias("sigma"))
             .where(F.col("sigma") > 0))
    mu, sg = F.col("mu"), F.col("sigma")
    return stats.select(
        "user_id", F.col("n").cast("long").alias("n"),
        F.round(mu, 6).alias("mu"), F.round(sg, 6).alias("sigma"),
        F.round((F.lit(_CPK_USL) - F.lit(_CPK_LSL)) / (6 * sg), 6)
         .alias("cp"),
        F.round(F.least(F.lit(_CPK_USL) - mu, mu - F.lit(_CPK_LSL))
                / (3 * sg), 6).alias("cpk"))


# ==========================================================================
# §2.28 Round-8 second wave
# ==========================================================================

import math as _math

#: Benford first-digit expectations log10(1 + 1/d), floored onto 1e-9 and
#: injected into BOTH engines as literals — the verdict must not hinge on
#: libm-vs-JVM log10 agreement.
_BENFORD_EXP = {d: _math.floor(_math.log10(1 + 1 / d) * 1e9) / 1e9
                for d in range(1, 10)}

_DUCK_BENFORD_VALUES = ", ".join(
    f"({d}, CAST({p} AS DOUBLE))" for d, p in _BENFORD_EXP.items())


@op("dq_benford_check", oracle=f"""
WITH exp(digit, exp_share) AS (VALUES {_DUCK_BENFORD_VALUES}),
amt AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INT) AS digit
    FROM orders WHERE o_totalprice > 0
), obs AS (
    SELECT digit, count(*) AS n,
           sum(count(*)) OVER () AS total
    FROM amt GROUP BY 1
)
SELECT e.digit, CAST(COALESCE(o.n, 0) AS BIGINT) AS n,
       round(CAST(COALESCE(o.n, 0) AS DOUBLE)
             / (SELECT min(total) FROM obs), 6) AS obs_share,
       round(e.exp_share, 6) AS exp_share,
       round(power(CAST(COALESCE(o.n, 0) AS DOUBLE)
                   - e.exp_share * (SELECT min(total) FROM obs), 2)
             / (e.exp_share * (SELECT min(total) FROM obs)), 6)
           AS chi2_term
FROM exp e LEFT JOIN obs o ON o.digit = e.digit
""", tier=3, section="2.4")
def dq_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order amounts — the classic
    fabricated-/truncated-data detector (Newcomb–Benford law, the public
    forensic-accounting standard): per leading digit 1-9, observed count
    and share vs the log10(1+1/d) expectation, plus the chi-square
    contribution — large terms point AT the suspicious digit. On this
    synthetic corpus the amounts are uniform-ish, so the audit correctly
    FLAGS them (uniform data is exactly what Benford catches); the
    per-digit report, not a pass verdict, is the deliverable.

    Exactness: the leading digit comes from integer-cents string
    conversion (floor(x·100) is the same IEEE double op in both engines;
    BIGINT-to-VARCHAR is exact everywhere), never from log10 of the
    amount; expectations are Python-computed literals injected into both
    engines; counts are integers and the two ratios round(6).

    Scale shape: one narrow projection + one 9-row hash aggregate (map-
    side combinable); the expectation frame is a 9-row literal; the
    total attaches by broadcast. Linear scan, no window over facts."""
    exp = spark.createDataFrame(sorted(_BENFORD_EXP.items()),
                                "digit int, exp_share double")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(F.floor(F.col("o_totalprice") * 100)
                         .cast("long").cast("string"), 1, 1).cast("int")
    obs = o.select(digit.alias("digit")).groupBy("digit") \
           .agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    nn = F.coalesce(F.col("n"), F.lit(0)).cast("double")
    expn = F.col("exp_share") * F.col("total")
    return (F.broadcast(exp).join(obs, "digit", "left")
             .crossJoin(F.broadcast(tot))
             .select("digit",
                     F.coalesce(F.col("n"), F.lit(0)).cast("long")
                      .alias("n"),
                     F.round(nn / F.col("total"), 6).alias("obs_share"),
                     F.round("exp_share", 6).alias("exp_share"),
                     F.round(F.pow(nn - expn, F.lit(2)) / expn, 6)
                      .alias("chi2_term")))


#: Fixed peel rounds for the k-core approximation — bounded-round
#: distributed-graph discipline (the `graph_label_propagation` precedent:
#: exact fixed-round semantics both engines, never an unbounded loop).
_KCORE_K = 2
_KCORE_ROUNDS = 3


def _duck_kcore_rounds() -> str:
    """Unrolled peel CTEs: nodes{r} = nodes{r-1} minus degree-<k nodes,
    degrees recomputed against the surviving set each round."""
    parts = [f"""sym AS (
    SELECT pa AS p, pb AS q FROM e
    UNION ALL SELECT pb, pa FROM e
), nodes0 AS (SELECT DISTINCT p FROM sym)"""]
    prev = "nodes0"
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(f"""deg{r} AS (
    SELECT s.p, count(*) AS d FROM sym s
    JOIN {prev} a ON a.p = s.p
    JOIN {prev} b ON b.p = s.q
    GROUP BY 1
), nodes{r} AS (SELECT p FROM deg{r} WHERE d >= {_KCORE_K})""")
        prev = f"nodes{r}"
    return ",\n".join(parts)


#: ADVICE r8: graph_kcore_peel used to persist a fresh `sym` + survivor
#: set per INVOCATION (bench warm-up + N timed passes => unbounded
#: executor-storage growth). Same keyed-memo discipline as
#: `_COPURCHASE_CACHE`: one (out, persisted-frames) entry per
#: (applicationId, sf_dir); switching datasets evicts the previous
#: entry's storage with unpersist(blocking=False).
_KCORE_CACHE: dict = {}


@op("graph_kcore_peel", oracle=f"""
WITH {_DUCK_COPURCHASE_E},
{_duck_kcore_rounds()},
final_deg AS (
    SELECT s.p, count(*) AS d FROM sym s
    JOIN nodes{_KCORE_ROUNDS} a ON a.p = s.p
    JOIN nodes{_KCORE_ROUNDS} b ON b.p = s.q
    GROUP BY 1
)
SELECT p AS partkey, CAST(d AS BIGINT) AS core_degree FROM final_deg
""", tier=3, section="2.3")
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_ROUNDS}-round {_KCORE_K}-core peel of the support>=2
    co-purchase graph: iteratively drop parts whose degree within the
    SURVIVING subgraph falls below {_KCORE_K}, reporting the survivors
    and their final-round core degree — the graph-health screen that
    separates the dense purchasable core from pendant long-tail parts
    (the input a recommender restricts its candidate graph to). Exact
    FIXED-round semantics, the bounded-round discipline of
    `graph_label_propagation`: both engines peel exactly
    {_KCORE_ROUNDS} rounds, so the answer is deterministic even where
    the full fixpoint would need more (documented approximation — at
    {_KCORE_ROUNDS} rounds the surviving set equals the true 2-core on
    any graph whose pendant chains are shorter than {_KCORE_ROUNDS},
    which the support floor makes overwhelmingly likely here).

    Exactness: pure integer degree counts and set memberships.

    Scale shape: the edge set builds once (shared cached
    `_copurchase_edges`); each round is two node-keyed semi-joins + one
    hash aggregate over the shrinking survivor set — all shuffles keyed
    by part, round count fixed at plan-build time (driver loops over
    {_KCORE_ROUNDS} rounds, never rows). Repeat invocations on the same
    (application, sf_dir) return the memoized plan — the per-round
    persisted survivor sets exist ONCE, not once per call (ADVICE r8)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _COPURCHASE_LOCK:
        hit = _KCORE_CACHE.get(key)
        if hit is not None:
            return hit[0]
        evicted = [_KCORE_CACHE.pop(k) for k in list(_KCORE_CACHE)]
    for _, frames in evicted:
        for f in frames:
            try:
                f.unpersist(blocking=False)
            except Exception:
                pass
    e = _copurchase_edges(spark, sf_dir)
    sym = (e.select(F.col("pa").alias("p"), F.col("pb").alias("q"))
            .unionByName(e.select(F.col("pb").alias("p"),
                                  F.col("pa").alias("q"))))
    sym = sym.cache()
    nodes = sym.select("p").distinct()
    cached = []
    for _ in range(_KCORE_ROUNDS):
        # Materialize each round's survivor set: it feeds TWO semi-joins
        # in the next round, so an uncached lineage doubles per round
        # (2^rounds recomputes of the edge build — measured as a
        # 10k-task plan on a vanilla driver session). The frame is a
        # shrinking id list — cache cost is trivial, and the driver
        # loop stays over the FIXED round count, never rows.
        deg = (sym.join(nodes, ["p"], "left_semi")
                  .join(nodes.select(F.col("p").alias("q")), ["q"],
                        "left_semi")
                  .groupBy("p").agg(F.count("*").alias("d")))
        nodes = deg.where(F.col("d") >= _KCORE_K).select("p").cache()
        nodes.count()
        cached.append(nodes)
    # core_degree is the INDUCED-subgraph degree within the final
    # survivor set (one post-peel pass) — a round-r degree would count
    # neighbors peeled in the same round, overstating the core by one
    # round's casualties.
    final_deg = (sym.join(nodes, ["p"], "left_semi")
                    .join(nodes.select(F.col("p").alias("q")), ["q"],
                          "left_semi")
                    .groupBy("p").agg(F.count("*").alias("d")))
    out = final_deg.select(F.col("p").alias("partkey"),
                           F.col("d").cast("long").alias("core_degree"))
    # detach the intermediate rounds' storage once the result
    # materializes — non-blocking so the returned lazy plan (which
    # references only `sym` and the final cached survivor set) computes
    # first; those two frames are memoized above and evicted on
    # dataset switch.
    for c in cached[:-1]:
        c.unpersist(blocking=False)
    with _COPURCHASE_LOCK:
        won = _KCORE_CACHE.setdefault(key, (out, [sym, nodes]))
    if won[0] is not out:
        sym.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
    return won[0]


# ==========================================================================
# Round-10 second wave (SURVEY.md §2.31)
# ==========================================================================

_DP_EPS = 1.0  # privacy budget for the demo release (count sensitivity = 1)


@op("agg_dp_laplace_counts", oracle=f"""
WITH c AS (
    SELECT event_type, count(*) AS n,
           (({_DUCK_H32.format(c="'dp:' || event_type")}) + 1)
               / 4294967297.0 AS u
    FROM events GROUP BY event_type
)
SELECT event_type,
       CAST({_DP_EPS!r} AS DOUBLE) AS epsilon,
       round(n + (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * (1.0 / CAST({_DP_EPS!r} AS DOUBLE))
                 * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noisy_count
FROM c
""", tier=3, section="2.31")
def agg_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-SHAPED group counts: the Laplace mechanism
    (sensitivity 1, epsilon = 1) over per-channel event counts, with
    the noise drawn by inverse-CDF from the repo's portable md5
    uniform instead of an RNG — X = -b·sign(U-½)·ln(1-2|U-½|),
    b = 1/epsilon. The released frame carries ONLY the noisy count (a
    true count alongside would defeat the mechanism); the structure —
    noise added once per released statistic, sensitivity documented,
    budget a named constant — is exactly the production pattern, and
    the seeded draw is what makes a privacy op testable at all
    (re-runs release the IDENTICAL noise rather than burning budget).

    Exactness: both engines compute the same u in (0,1) from the md5
    draw (never exactly ½: 2^32+1 is odd) and the same ln/abs chain
    with identical literals and association; round(·,6) seals the one
    libm call. One map-combinable hash agg; the noise math runs on the
    5-row grouped frame."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    u = ((api.hash32(F.concat(F.lit("dp:"), F.col("event_type")))
          + F.lit(1)) / F.lit(4294967297.0))
    noise = (F.when(u >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
             * (F.lit(1.0) / F.lit(_DP_EPS))
             * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))))
    return c.select("event_type",
                    F.lit(_DP_EPS).alias("epsilon"),
                    F.round(F.col("n") + noise, 6).alias("noisy_count"))


_CONF_ALPHA = 0.9   # target coverage of the split-conformal interval
_CONF_GRID = 1000000000.0  # residual fixed-point grid (1e-9)


@op("agg_conformal_interval", oracle=f"""
WITH tagged AS (
    SELECT event_type, event_id, value, hour(ts) AS hod,
           ({_DUCK_H32.format(c="'cf:' || CAST(event_id AS VARCHAR)")}) % 5
               AS slice
    FROM events
), model AS (
    SELECT event_type, hod,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS pred
    FROM tagged WHERE slice != 0 GROUP BY event_type, hod
), cal AS (
    SELECT t.event_type, t.event_id,
           CAST(floor(abs(t.value - m.pred) * {_CONF_GRID!r}) AS BIGINT)
               AS rq
    FROM tagged t
    JOIN model m ON m.event_type = t.event_type AND m.hod = t.hod
    WHERE t.slice = 0
), sized AS (
    SELECT event_type, count(*) AS n_cal,
           CAST(least(ceil({_CONF_ALPHA!r} * (count(*) + 1)), count(*))
                AS BIGINT) AS k
    FROM cal GROUP BY event_type
), ranked AS (
    SELECT c.event_type, c.rq,
           row_number() OVER (PARTITION BY c.event_type
                              ORDER BY c.rq, c.event_id) AS rn
    FROM cal c
), q AS (
    SELECT r.event_type, r.rq FROM ranked r
    JOIN sized s ON s.event_type = r.event_type AND r.rn = s.k
), cov AS (
    SELECT c.event_type,
           CAST(count(*) FILTER (WHERE c.rq <= q.rq) AS BIGINT) AS nc,
           count(*) AS n
    FROM cal c JOIN q ON q.event_type = c.event_type
    GROUP BY c.event_type
)
SELECT s.event_type, CAST(s.n_cal AS BIGINT) AS n_cal,
       round(q.rq / {_CONF_GRID!r}, 6) AS q_hat,
       round(CAST(cov.nc AS DOUBLE) / cov.n, 6) AS coverage
FROM sized s
JOIN q ON q.event_type = s.event_type
JOIN cov ON cov.event_type = s.event_type
""", tier=3, section="2.32")
def agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction interval per channel (Vovk/Lei et al.;
    the distribution-free coverage recipe): a deterministic md5 20%
    slice is held out as the calibration set, the remaining 80% fits a
    per-(channel, hour-of-day) mean forecast, and the interval
    half-width q_hat is the ceil(0.9·(n+1))-th smallest absolute
    calibration residual — which guarantees >= 90% coverage on
    exchangeable future points with NO distributional assumption. The
    emitted `coverage` column audits the guarantee on the calibration
    slice itself (lands at ~0.903 on this corpus — the finite-sample
    (n+1) bump).

    Exactness: the forecast is a decimal-exact-sum/count double;
    residuals quantize onto the 1e-9 grid so the order statistic is an
    exact-integer rank pick (ties broken by event_id) — no float
    comparison anywhere near the quantile boundary.

    Scale shape: the model is a (channel x 24)-row broadcast frame; the
    rank runs through `api.bucketed_global_rank` with
    group_cols=[event_type] — counts, offsets and the within-bucket
    window all scope to (channel, residual-magnitude bucket), so no
    constant-corpus-fraction partition ever sorts more than one bucket
    (the low-cardinality window-key fix); coverage is one
    map-combinable agg against the broadcast 1-row-per-channel q."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type", "event_id", "value", F.hour("ts").alias("hod"),
        (api.hash32(F.concat(F.lit("cf:"),
                             F.col("event_id").cast("string"))) % 5)
        .alias("slice"))
    model = (tagged.filter(F.col("slice") != 0)
                   .groupBy("event_type", "hod")
                   .agg((F.sum(F.col("value").cast("decimal(18,2)"))
                         .cast("double") / F.count("*")).alias("pred")))
    # The calibration residual frame feeds FOUR consumers (sizes, the
    # two-phase rank's counts + tagged sides, coverage); localCheckpoint
    # materializes the narrow 3-column slice once instead of re-deriving
    # model+join per branch (measured 32 parquet scans before, 2 after).
    cal = (tagged.filter(F.col("slice") == 0)
                 .join(F.broadcast(model), ["event_type", "hod"])
                 .select("event_type", "event_id",
                         F.floor(F.abs(F.col("value") - F.col("pred"))
                                 * F.lit(_CONF_GRID)).cast("long")
                          .alias("rq"))
                 .localCheckpoint())
    sized = cal.groupBy("event_type").agg(
        F.count("*").alias("n_cal"),
        F.least(F.ceil(F.lit(_CONF_ALPHA) * (F.count("*") + F.lit(1))),
                F.count("*")).cast("long").alias("k"))
    ranked = api.bucketed_global_rank(
        cal, F.floor(F.col("rq") / F.lit(1000000000)),
        [F.col("rq"), F.col("event_id")], rank_name="rn",
        group_cols=["event_type"])
    q = (ranked.join(F.broadcast(sized), "event_type")
               .filter(F.col("rn") == F.col("k"))
               .select("event_type", F.col("rq").alias("qrq")))
    cov = (cal.join(F.broadcast(q), "event_type")
              .groupBy("event_type")
              .agg(F.sum((F.col("rq") <= F.col("qrq")).cast("long"))
                    .alias("nc"),
                   F.count("*").alias("n")))
    return (sized.join(q, "event_type").join(cov, "event_type")
                 .select("event_type",
                         F.col("n_cal").cast("long").alias("n_cal"),
                         F.round(F.col("qrq") / F.lit(_CONF_GRID), 6)
                          .alias("q_hat"),
                         F.round(F.col("nc").cast("double") / F.col("n"), 6)
                          .alias("coverage")))


_BFS_MAX_LAYER = 3   # bounded frontier rounds (constant, not data-driven)
_BFS_SEED_MOD = 31   # seeds = nodes with hash32('bfs:'||p) % 31 == 0


@op("graph_bfs_layers", oracle=f"""
WITH RECURSIVE {_DUCK_COPURCHASE_E}, edges AS (
    SELECT pa, pb FROM e UNION ALL SELECT pb, pa FROM e
), nodes AS (
    SELECT DISTINCT pa AS p FROM edges
), walk AS (
    SELECT p, 0 AS layer FROM nodes
    WHERE ({_DUCK_H32.format(c="'bfs:' || CAST(p AS VARCHAR)")})
          % {_BFS_SEED_MOD} = 0
    UNION
    SELECT ed.pb AS p, w.layer + 1 AS layer
    FROM walk w JOIN edges ed ON ed.pa = w.p
    WHERE w.layer < {_BFS_MAX_LAYER}
)
SELECT p AS part, CAST(min(layer) AS INT) AS layer
FROM walk GROUP BY p
""", tier=3, section="2.32")
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the co-purchase graph, bounded depth: a
    deterministic md5 seed set (~1/31 of the nodes — "recalled parts",
    "known-bad lots") expands 3 hops along support>=2 co-purchase edges;
    each reached node reports its hop distance (min over seeds). The
    blast-radius query every industrial recall/contamination
    investigation starts with, and the missing traversal primitive next
    to the repo's label-propagation / k-core / PageRank family.

    Exactness: layers are small exact integers; the frontier expansion
    is set arithmetic — the DuckDB recursive CTE's UNION-dedup plus a
    final min(layer) reproduces the per-round anti-join exactly.

    Scale shape: the cached shared edge frame (`_copurchase_edges` — one
    build per session, the graph-family discipline); each of the
    CONSTANT 3 rounds is one frontier-keyed equi-join + distinct +
    anti-join against the assigned set, all hash-partitioned on the
    node key — frontier frames localCheckpoint per round (the CC-loop
    plan-growth discipline). Work per round ~ frontier x avg-degree,
    never all-pairs; depth is a constant of the op, so no convergence
    probe and no driver-side fixpoint."""
    e0 = _copurchase_edges(spark, sf_dir)
    edges = e0.unionByName(
        e0.select(F.col("pb").alias("pa"), F.col("pa").alias("pb")))
    nodes = edges.select(F.col("pa").alias("p")).distinct()
    seeds = nodes.filter(
        api.hash32(F.concat(F.lit("bfs:"), F.col("p").cast("string")))
        % _BFS_SEED_MOD == 0)
    frontier = seeds.select("p", F.lit(0).alias("layer")).localCheckpoint()
    result = frontier
    for layer in range(1, _BFS_MAX_LAYER + 1):
        nxt = (frontier.join(edges, frontier["p"] == edges["pa"])
                       .select(F.col("pb").alias("p")).distinct()
                       .join(result.select("p"), "p", "left_anti")
                       .select("p", F.lit(layer).alias("layer"))
                       .localCheckpoint())
        result = result.unionByName(nxt)
        frontier = nxt
    return result.select(F.col("p").alias("part"),
                         F.col("layer").cast("int").alias("layer"))


# ==========================================================================
# Round-10 seventh wave (SURVEY.md §2.36)
# ==========================================================================


@op("dq_sequence_islands", oracle="""
WITH s AS (
    SELECT event_id,
           event_id - row_number() OVER (ORDER BY event_id) AS g
    FROM events WHERE event_type = 'click'
), isl AS (
    SELECT g, min(event_id) AS start_id, max(event_id) AS end_id,
           count(*) AS island_len
    FROM s GROUP BY g
)
SELECT CAST(row_number() OVER (ORDER BY start_id) AS INT) AS island_id,
       start_id, end_id, CAST(island_len AS BIGINT) AS island_len,
       lead(start_id) OVER (ORDER BY start_id) - end_id - 1 AS gap_after
FROM isl
""", tier=3, section="2.36")
def dq_sequence_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS audit over an expected-monotone id sequence —
    the classic ingestion-completeness question ("which id ranges did
    we actually receive, and how big are the holes?"), asked here of
    the click stream's event_ids: consecutive ids group into islands
    via the id − rank invariant (constant exactly within a gap-free
    run), each island reports its [start, end] range, length, and the
    gap to the next island. `dq_load_anomaly`/`dq_volume_anomaly`
    count WHAT arrived per window; this op names precisely WHICH id
    ranges are missing — the shape a backfill job consumes.

    Exactness: everything is integer arithmetic on ids; both engines
    compute the identical rank under the total (event_id) order.

    Scale shape: NO unpartitioned window anywhere, not even over the
    island table — in the adversarial fully-fragmented case (every id
    isolated) islands are AS NUMEROUS AS ROWS, so "it's only the
    island table" is not a bound. Both ranks are the exact two-phase
    `api.bucketed_global_rank` with ``broadcast_offsets=False`` and an
    ID-RANGE-DERIVED bucket width (VERDICT r10 "what's wrong" #1: a
    fixed /1024 bucket makes the offsets table Θ(n/1024) rows — linear,
    merely rescaled — which violates api.py's bucket-cardinality
    contract once the id domain reaches 10^11; width =
    max(1024, range div 65536) caps offsets at ~65536 rows for ANY id
    domain, while the within-bucket sort stays bounded because ids are
    unique, so a bucket holds at most `width` rows). The range probe is
    one column-pruned min/max agg collected as a bounded 1-row frame.
    Islands are one map-combinable hash agg on the id − rank invariant;
    the next-island start attaches by an rn+1 EQUI-JOIN back to a
    RECOMPUTED ranked stream (each island's last member has rank
    end_id − g, so the element ranked one higher IS the next island's
    first id) instead of a lead window — recomputation costs a second
    scan but avoids eagerly materializing a corpus-sized frame
    (VERDICT r10 "what's wrong" #2: the former localCheckpoint traded
    that scan for fact-sized executor storage). The oracle uses the
    plain row_number/lead form — value-identical."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "click").select("event_id")
    lohi = ev.agg(F.min("event_id").alias("lo"),
                  F.max("event_id").alias("hi")).collect()[0]
    span = (lohi["hi"] - lohi["lo"] + 1) if lohi["lo"] is not None else 1
    width = max(1024, span // 65536)

    def ranked() -> DataFrame:
        return api.bucketed_global_rank(
            ev, F.floor(F.col("event_id") / F.lit(width)),
            [F.col("event_id")], rank_name="rn", broadcast_offsets=False)

    isl = (ranked().select("event_id",
                           (F.col("event_id") - F.col("rn")).alias("g"))
                   .groupBy("g")
                   .agg(F.min("event_id").alias("start_id"),
                        F.max("event_id").alias("end_id"),
                        F.count("*").alias("island_len")))
    isl = api.bucketed_global_rank(
        isl, F.floor(F.col("start_id") / F.lit(width)),
        [F.col("start_id")], rank_name="island_rank",
        broadcast_offsets=False)
    nxt = ranked().select(F.col("rn").alias("next_rn"),
                          F.col("event_id").alias("next_start"))
    return (isl.join(nxt,
                     F.col("next_rn") == F.col("end_id") - F.col("g")
                     + F.lit(1), "left")
               .select(F.col("island_rank").cast("int").alias("island_id"),
                       "start_id", "end_id",
                       F.col("island_len").cast("long").alias("island_len"),
                       (F.col("next_start") - F.col("end_id") - F.lit(1))
                       .alias("gap_after")))
