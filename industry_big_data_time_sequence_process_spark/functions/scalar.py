"""Scalar function surface (SURVEY.md §2.8): string / regexp / date /
math / array / map / JSON.

All JVM-side built-ins inside whole-stage codegen — the fast path. Known
cross-engine alignments baked into the oracles:

- dayofweek: Spark 1=Sunday, DuckDB 0=Sunday -> oracle adds 1 (App. A.6).
- floor/ceil on double: Spark returns LONG, DuckDB DOUBLE -> cast BIGINT.
- sign: Spark returns DOUBLE, DuckDB INTEGER -> cast DOUBLE.
- transcendentals (ln/pow/sqrt): libm ulp differences are < 1e-12 at these
  magnitudes -> round 6.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..exprs import r6
from ..registry import op
from ..sources.io import load


@op("str_basic", oracle="""
SELECT c_custkey,
       upper(c_name) AS name_up,
       lower(c_mktsegment) AS seg_lo,
       trim(concat('  ', c_name, '  ')) AS name_trim,
       substr(c_name, 1, 8) AS name_pre,
       concat(c_name, '#', c_mktsegment) AS name_seg,
       length(c_name) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad
FROM customer
""", tier=1, section="2.8")
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substr/concat/length/lpad."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  ")))
         .alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_pre"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment"))
         .alias("name_seg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
    )


@op("str_regexp", oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked,
       CAST(regexp_matches(p_brand, '[0-9]') AS INT) AS brand_has_digit
FROM part
""", tier=1, section="2.8")
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract/replace/match. NB DuckDB regexp_replace needs the 'g'
    flag to match Spark's replace-all semantics."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_masked"),
        F.col("p_brand").rlike("[0-9]").cast("int").alias("brand_has_digit"),
    )


@op("str_split_explode", oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
""", tier=1, section="2.8")
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize: one output row per token (generator/UNNEST)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@op("date_parts", oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(hour(o_orderdate) AS INT) AS h
FROM orders
""", tier=1, section="2.8")
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar part extraction; dow aligned to Spark's 1=Sunday."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("q"),
        F.hour("o_orderdate").alias("h"),
    )


@op("date_trunc_bucket", oracle="""
SELECT event_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_bucket,
       date_trunc('hour', ts) AS hour_bucket
FROM events
""", tier=1, section="2.8")
def date_trunc_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc bucketing — the resampling primitive (§2.9 builds on it)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day_bucket"),
        F.date_trunc("hour", "ts").alias("hour_bucket"),
    )


@op("date_arith", oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS INT) AS ship_days,
       o.o_orderdate + INTERVAL 90 DAY AS due_date,
       CAST(l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY AS INT) AS late
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""", tier=2, section="2.8")
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: day difference, interval add, derived predicate.
    (Dates in this corpus are midnight-aligned, so Spark's date-cast
    datediff equals DuckDB's boundary-count datediff.)"""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.select(
        "l_orderkey", "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_days"),
        F.expr("o_orderdate + INTERVAL 90 DAYS").alias("due_date"),
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 30 DAYS"))
            .cast("int").alias("late"),
    )


@op("math_funcs", oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_extendedprice - 1000) AS price_dev,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(pow(l_discount, 2), 6) AS disc_sq,
       CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_c,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
       CAST(sign(l_extendedprice - 1000) AS DOUBLE) AS dev_sign,
       l_quantity % 5 AS qty_mod
FROM lineitem
""", tier=1, section="2.8")
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/sqrt/ln/pow/floor/ceil/sign/mod."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(price, 1).alias("price_r1"),
        F.abs(price - 1000).alias("price_dev"),
        r6(F.sqrt(price)).alias("price_sqrt"),
        r6(F.log(price)).alias("price_ln"),
        r6(F.pow("l_discount", F.lit(2))).alias("disc_sq"),
        F.floor(price / 100).cast("long").alias("price_c"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("qty_bucket"),
        F.signum(price - 1000).cast("double").alias("dev_sign"),
        (F.col("l_quantity") % 5).alias("qty_mod"),
    )


@op("array_funcs", oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       CAST(list_contains(string_split(text, ' '), 'spark') AS INT)
           AS has_spark,
       array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
           AS first3,
       array_to_string(
           list_sort(list_slice(string_split(text, ' '), 1, 5)), ' ')
           AS first5_sorted
FROM documents
""", tier=2, section="2.8")
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / contains / slice / sort over token arrays. Array results are
    rendered as space-joined strings and the boolean as INT on both
    engines: array/bool columns are canonicalizer hazards (pandas crashes
    on ndarray cells), and the rendered form hashes identically without
    changing the computation under test."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("first3"),
        F.concat_ws(" ", F.sort_array(F.slice(toks, 1, 5)))
         .alias("first5_sorted"),
    )


@op("array_higher_order", oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
             / len(embedding), 6) AS mean_dim
FROM embeddings
""", tier=2, section="2.8")
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda (higher-order) array functions: L2 norm + mean component of
    the embedding vector — the §2.11 similarity primitive."""
    e = load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    dim_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        r6(F.sqrt(sq_sum)).alias("l2_norm"),
        r6(dim_sum / F.size("embedding")).alias("mean_dim"),
    )


@op("date_parse_format", oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS date_str,
       strftime(o_orderdate, '%d/%m/%Y') AS date_eu,
       strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')::TIMESTAMP
           AS reparsed,
       CAST(o_orderdate AS DATE) AS as_date
FROM orders
""", tier=2, section="2.8")
def date_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp <-> string round trip: format with a pattern, reparse
    with the same pattern (the CSV/log-ingest staple). Spark uses
    JDK patterns, DuckDB strftime codes — same rendered strings."""
    o = load(spark, sf_dir, "orders")
    eu = F.date_format("o_orderdate", "dd/MM/yyyy")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        eu.alias("date_eu"),
        F.to_timestamp(eu, "dd/MM/yyyy").alias("reparsed"),
        F.col("o_orderdate").cast("date").alias("as_date"),
    )


@op("cast_conversions", oracle="""
SELECT l_orderkey,
       CAST(l_quantity AS INT) AS qty_int,
       CAST(l_quantity AS VARCHAR) AS qty_str,
       CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip,
       CAST(l_linenumber AS DOUBLE) AS line_dbl,
       epoch_us(l_shipdate) AS ship_epoch_us,
       CAST(l_shipdate AS DATE) AS ship_date,
       CAST(l_quantity > 25 AS INT) AS qty_big,
       CAST(l_quantity > 25 AS INT) AS qty_big_int
FROM lineitem
""", tier=2, section="2.8")
def cast_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cast matrix: numeric narrowing, number<->string round trip,
    timestamp->epoch/date, boolean->int. (Doubles here are x.0 so the
    string forms agree across engines.)"""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        q.cast("int").alias("qty_int"),
        q.cast("string").alias("qty_str"),
        q.cast("string").cast("double").alias("qty_roundtrip"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.unix_micros("l_shipdate").alias("ship_epoch_us"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        (q > 25).cast("int").alias("qty_big"),
        (q > 25).cast("int").alias("qty_big_int"),
    )


@op("func_conditional", oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'UNSEGMENTED') AS seg_or_dflt,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(c_acctbal, 1000.0) AS bal_cap1k,
       (CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal END) AS even_nation_bal
FROM customer
""", tier=1, section="2.8")
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: CASE/WHEN bands, coalesce+nullif
    defaulting, greatest/least clamping, partial CASE (NULL else)."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high")
         .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")),
                   F.lit("UNSEGMENTED")).alias("seg_or_dflt"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1k"),
        F.when(F.col("c_nationkey") % 2 == 0, bal).alias("even_nation_bal"),
    )


@op("map_from_json", oracle="""
SELECT event_id,
       json_keys(props)[1] AS first_key,
       CAST(json_extract(props, '$.k') AS INT) AS k_val,
       len(json_keys(props)) AS n_keys
FROM events
""", tier=2, section="2.8")
def map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column into a typed map, then inspect it."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.map_keys(m).getItem(0).alias("first_key"),
        m.getItem("k").alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@op("json_get", oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       json_extract_string(props, '$.missing') AS missing
FROM events
""", tier=1, section="2.8")
def json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$.path extraction from a JSON string column.

    r13: ONE ``from_json`` parse per row instead of three
    ``get_json_object`` calls (each re-parses the document; the
    optimizer does not merge them) — measured 0.63 s -> 0.37 s at
    sf0.1. Identical values on this corpus's props shape (string/number
    scalars; twin-pinned in tests/test_opt_r13.py, and the DuckDB
    oracle re-proves every row): absent keys are NULL either way and a
    malformed document yields NULLs in PERMISSIVE mode exactly as
    get_json_object does."""
    ev = load(spark, sf_dir, "events")
    j = F.from_json("props", "k string, missing string")
    return ev.select("event_id", j.alias("__j")).select(
        "event_id",
        F.col("__j.k").alias("k_str"),
        F.col("__j.k").cast("int").alias("k_int"),
        F.col("__j.missing").alias("missing"),
    )


@op("date_tz_convert", oracle="""
SELECT event_id,
       timezone('America/New_York', timezone('UTC', ts)) AS ny_wall,
       timezone('Asia/Tokyo', timezone('UTC', ts)) AS tokyo_wall,
       CAST(hour(timezone('America/New_York', timezone('UTC', ts)))
            AS INT) AS ny_hour,
       CAST(hour(timezone('America/New_York', timezone('UTC', ts)))
        BETWEEN 9 AND 16 AS INT) AS ny_business_hours
FROM events
""", tier=2, section="2.8")
def date_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DST-aware timezone conversion: UTC event times to New York and
    Tokyo wall clocks, plus the business-hours predicate every ops
    dashboard needs. Spark ``from_utc_timestamp`` and the oracle's
    double ``timezone()`` hop (naive->UTC tstz->target wall) both apply
    the IANA tzdb, so EST/EDT transitions agree; the oracle form is
    deliberately session-timezone-independent."""
    ev = load(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return ev.select(
        "event_id",
        ny.alias("ny_wall"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_wall"),
        F.hour(ny).cast("int").alias("ny_hour"),
        F.hour(ny).between(9, 16).cast("int").alias("ny_business_hours"),
    )


@op("str_format_printf", oracle="""
SELECT o_orderkey,
       printf('ORD-%08d', o_orderkey) AS order_code,
       printf('%s/%s', o_orderstatus, o_orderpriority) AS status_key,
       printf('%.2f', o_totalprice) AS price_str,
       printf('0x%08x', o_orderkey) AS hex_code
FROM orders WHERE o_orderkey < 1000
""", tier=2, section="2.8")
def str_format_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (zero-padded ids, composed keys, fixed
    decimals, percent strings) — the report/export surface. Spark
    ``format_string`` and DuckDB ``printf`` are both C-style, so the
    rendered strings agree byte-for-byte."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.format_string("ORD-%08d", "o_orderkey").alias("order_code"),
        F.format_string("%s/%s", "o_orderstatus", "o_orderpriority")
         .alias("status_key"),
        F.format_string("%.2f", "o_totalprice").alias("price_str"),
        # no %f of computed ratios here: Java formats ties HALF_UP, C
        # printf half-even, so '%.1f' of an exact .x5 diverges
        F.format_string("0x%08x", "o_orderkey").alias("hex_code"),
    )
