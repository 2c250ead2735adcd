"""Scans, sources and sinks (SURVEY.md §2.1) — batch side.

Round-trip ops (CSV/JSON/partitioned-parquet) write into
``/root/repo/.scratch/<key>/`` (gitignored) with ``mode=overwrite`` so they
are idempotent under repeated driver runs. Each round-trip is value-checked:
the aggregate computed over the re-read data must match the same aggregate
computed by DuckDB over the ORIGINAL table — a write/read identity proof,
not just a smoke test.

Streaming sources/sinks live in ``streaming.py``.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..exprs import exact_sum
from ..registry import op
from ..sources.io import SCHEMAS, configure, load

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def _scratch(key: str) -> str:
    os.makedirs(SCRATCH, exist_ok=True)
    return os.path.join(SCRATCH, key)


@op("scan_parquet", oracle="""
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part
""", tier=1, section="2.1")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table parquet scan with the explicit declared schema."""
    return load(spark, sf_dir, "part")


@op("scan_events_ns", oracle="""
SELECT event_id, ts, user_id, event_type, value, props FROM events
""", tier=1, section="2.1")
def scan_events_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events timestamp decode path end-to-end, schema-ADAPTIVE: the
    loader probes the parquet footer (sources/io.py:events_ts_kind) and
    branches — timestamp[us/ms/s] reads straight into TimestampType;
    timestamp[ns]/int64 surfaces as LongType nanos (legacy
    nanosAsLong) and is truncated to µs via exact integer division.
    Either way DuckDB surfaces the same column as µs TIMESTAMP, so
    `SELECT *` is the oracle; a decode-branch mistake (the round-2
    1970-collapse) fails this op's value hash immediately."""
    return load(spark, sf_dir, "events")


@op("scan_csv_infer", oracle="""
SELECT count(*) AS n,
       count(DISTINCT c_nationkey) AS n_nations,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer
""", tier=2, section="2.1")
def scan_csv_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with header + schema inference: write customer to
    CSV, re-read with inferSchema, aggregate. Matching the oracle (same
    aggregate over the ORIGINAL parquet) proves the round-trip lossless."""
    path = _scratch("scan_csv_infer")
    load(spark, sf_dir, "customer").write.mode("overwrite") \
        .option("header", True).csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    return back.agg(
        F.count("*").alias("n"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        exact_sum("c_acctbal").alias("sum_bal"),
    )


@op("scan_json_lines", oracle="""
SELECT o_orderstatus,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY o_orderstatus
""", tier=2, section="2.1")
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round trip: write orders as JSONL, re-read (schema
    inferred from the JSON), aggregate; checked against the original."""
    path = _scratch("scan_json_lines")
    load(spark, sf_dir, "orders").write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        exact_sum("o_totalprice").alias("sum_price"),
    )


@op("sink_parquet_partitioned", oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
""", tier=2, section="2.1")
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + read-back: write orders partitioned by
    order year (the 100 TB layout: partition pruning on the time bucket),
    re-read, aggregate per partition; checked against the original.

    NB partition-column round trip: partitionBy materializes order_year as
    a directory key; the read-back projects it back as a column.
    """
    path = _scratch("sink_parquet_partitioned")
    o = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate"))
    o.write.mode("overwrite").partitionBy("order_year").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy(F.col("order_year").cast("int").alias("order_year")).agg(
        F.count("*").alias("n"),
        exact_sum("o_totalprice").alias("sum_price"),
    )


@op("scan_partition_pruning", oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(year(o_orderdate) AS INT) AS order_year
FROM orders WHERE year(o_orderdate) = 1997
""", tier=2, section="2.1")
def scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition PRUNING proof: filter one year out of the partitioned
    layout ``sink_parquet_partitioned`` writes. The predicate binds to
    the directory key, so Spark lists and reads ONLY that partition's
    files — at 100 TB this is the difference between scanning one year
    and scanning the decade (plan shows ``PartitionFilters``; asserted
    in tests/test_plans.py). Value-oracled against the original table:
    pruning must lose no rows.
    """
    # scratch keyed by SF: a cached layout from another scale factor
    # would silently change the result
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = _scratch(f"scan_partition_pruning_{sf_tag}")
    o = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        o.write.mode("overwrite").partitionBy("order_year").parquet(path)
    back = spark.read.parquet(path)
    return back.filter(F.col("order_year") == 1997).select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.col("order_year").cast("int").alias("order_year"),
    )


@op("sink_bucketed_join", oracle="""
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""", tier=2, section="2.1")
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed tables -> co-located (exchange-free) join: write orders
    and customer bucketed 8-ways on the join key, then join the bucketed
    reads. THE 100 TB pattern for repeated fact-dim joins: the shuffle is
    paid once at write time, every downstream join is bucket-local
    (tests/test_plans.py asserts no Exchange under the join). Value
    oracle: the same join+agg over the original tables."""
    configure(spark)
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # Idempotence across processes: a previous run's warehouse dirs survive
    # while the in-memory catalog does not, and CREATE refuses an existing
    # location — drop both layers first.
    import shutil
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    for t in ("bkt_orders", "bkt_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh.path or wh.netloc, t),
                      ignore_errors=True)
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey") \
        .mode("overwrite").saveAsTable("bkt_orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey") \
        .mode("overwrite").saveAsTable("bkt_customer")
    ob, cb = spark.table("bkt_orders"), spark.table("bkt_customer")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
          .groupBy("c_mktsegment")
          .agg(F.count("*").alias("n_orders"),
               exact_sum("o_totalprice").alias("sum_price"))
    )


@op("scan_schema_evolution", oracle="""
SELECT n_nationkey, n_name, n_regionkey, CAST(NULL AS VARCHAR) AS n_comment
FROM nation
""", tier=3, section="2.1")
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: request a superset schema (extra nullable
    column) over existing files — missing columns surface as NULLs. The
    production pattern for adding columns without rewriting history."""
    from pyspark.sql.types import StringType, StructField, StructType

    evolved = StructType(
        list(SCHEMAS["nation"].fields)
        + [StructField("n_comment", StringType(), True)]
    )
    return spark.read.schema(evolved).parquet(f"{sf_dir.rstrip('/')}/nation.parquet")


@op("scan_csv_badrecords", oracle=None, tier=2, section="2.1")
def scan_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input handling: read a CSV with injected bad rows in
    PERMISSIVE mode with a ``_corrupt_record`` column — the real-world
    ingest posture (never fail the 100 TB job for one bad line; quarantine
    it). Returns per-category counts: parsed rows, corrupt rows, and
    null-field rows. Rows-only oracle (the fixture is self-written)."""
    import csv

    path = _scratch("scan_csv_badrecords")
    os.makedirs(path, exist_ok=True)
    fixture = os.path.join(path, "data.csv")
    with open(fixture, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "qty", "price"])
        for i in range(100):
            w.writerow([i, i * 2, round(i * 1.5, 2)])
        f.write('100,"unclosed quote,1.5\n')          # malformed quoting
        f.write("101,not_a_number,2.5\n")             # type error
        f.write("102,,3.5\n")                         # missing field -> null
    schema = ("id INT, qty INT, price DOUBLE, _corrupt_record STRING")
    back = (spark.read.schema(schema)
                 .option("header", True)
                 .option("mode", "PERMISSIVE")
                 .option("columnNameOfCorruptRecord", "_corrupt_record")
                 .csv(fixture))
    return back.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1))
         .alias("n_corrupt"),
        F.count(F.when(F.col("_corrupt_record").isNull()
                       & F.col("qty").isNull(), 1)).alias("n_null_qty"),
        F.sum("id").alias("id_checksum"),
    )


@op("sql_frontend", oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY o_orderpriority
""", tier=1, section="2.1")
def sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: register the tables as temp views and run the
    query as a SQL STRING through ``spark.sql`` — the surface a SQL-first
    user of the engine actually types. Same Catalyst plan as the
    DataFrame form (views are lazy; no materialization), proven by the
    oracle running the identical text in DuckDB."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY o_orderpriority
    """)


@op("scan_json_nested", oracle="""
SELECT o_orderstatus AS status,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       max(o_orderkey) AS max_key
FROM orders GROUP BY 1
""", tier=2, section="2.1")
def scan_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED JSON round trip: serialize each order as a two-level
    document ({id, meta:{status, price}}), write JSONL, re-read with an
    explicit nested schema, and aggregate on fields extracted by dotted
    paths. Proves struct-typed ingestion end to end (the flat `props`
    column only exercises scalar JSON); checked against the original
    table."""
    path = _scratch("scan_json_nested")
    o = load(spark, sf_dir, "orders")
    nested = o.select(
        F.col("o_orderkey").alias("id"),
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        ).alias("meta"),
    )
    nested.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "id BIGINT, meta STRUCT<status: STRING, price: DOUBLE>"
    ).json(path)
    return back.groupBy(F.col("meta.status").alias("status")).agg(
        F.count("*").alias("n"),
        exact_sum("meta.price").alias("sum_price"),
        F.max("id").alias("max_key"),
    )


@op("scan_csv_gzip", oracle="""
SELECT s_nationkey,
       count(*) AS n,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM supplier GROUP BY s_nationkey
""", tier=2, section="2.1")
def scan_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-text round trip: write supplier as GZIP CSV, re-read
    (codec inferred from the .gz extension), aggregate — the
    log-ingestion reality where text arrives compressed. NB gzip is not
    splittable: one file = one task, which is why the partitioned-
    parquet layout, not .csv.gz, is the at-scale landing format (this op
    documents the capability AND the caveat)."""
    path = _scratch("scan_csv_gzip")
    load(spark, sf_dir, "supplier").write.mode("overwrite") \
        .option("header", True).option("compression", "gzip").csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        exact_sum("s_acctbal").alias("sum_bal"),
    )


@op("scan_orc_roundtrip", oracle="""
SELECT c_mktsegment,
       count(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
       count(DISTINCT c_nationkey) AS n_nations
FROM customer GROUP BY c_mktsegment
""", tier=2, section="2.1")
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip: write customer as ORC (Spark's other first-class
    columnar format — same predicate-pushdown/column-pruning machinery
    as parquet via the vectorized ORC reader), re-read, aggregate;
    checked against the original parquet table, proving the format
    conversion lossless. The interop path for Hive-era warehouses."""
    path = _scratch("scan_orc_roundtrip")
    load(spark, sf_dir, "customer").write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        exact_sum("c_acctbal").alias("sum_bal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


#: Morton (z-order) interleave of two 4-bit codes — pure integer
#: arithmetic, identical in Spark SQL and DuckDB SQL.
def _zorder_sql(ux: str, vx: str) -> str:
    terms = []
    for i in range(4):
        terms.append(f"((({ux}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({vx}) // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


@op("layout_zorder_stats", oracle=f"""
WITH coded AS (
    SELECT CAST(user_id % 16 AS BIGINT) AS ux,
           CAST(least(floor(value / 31.0), 15) AS BIGINT) AS vx
    FROM events
), z AS (
    SELECT ux, vx, CAST({_zorder_sql("ux", "vx")} AS BIGINT) AS zval
    FROM coded
)
SELECT CAST(zval // 8 AS BIGINT) AS zbucket,
       count(*) AS n,
       min(ux) AS ux_min, max(ux) AS ux_max,
       min(vx) AS vx_min, max(vx) AS vx_max,
       CAST(max(ux) - min(ux) + 1 AS BIGINT)
           * (max(vx) - min(vx) + 1) AS box_area
FROM z GROUP BY 1
""", tier=3, section="2.1")
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit: interleave the bits of two
    query dimensions — a 4-bit user band and a 4-bit value band — into
    one clustering key, then report, per 8-wide z-range "file", the
    min/max of EACH dimension and the bounding-box area. Small boxes are
    the whole point: a multi-dimensional predicate prunes a z-sorted
    file when its per-column min/max footer stats miss the predicate,
    so the z-curve is how ONE sort order serves range filters on BOTH
    columns (the public Delta/Iceberg OPTIMIZE ZORDER idea, reduced to
    its arithmetic).

    At 100 TB the pipeline is ``repartitionByRange(zval).
    sortWithinPartitions(zval)`` before the parquet write; this operator
    is the audit that proves the layout clusters (every z-bucket's box
    covers ≤ 1/16 of the 16×16 grid vs the full-grid boxes a
    single-column sort leaves on the other column). The z-value is pure
    integer bit arithmetic — no UDF, engine-portable, value-oracled.
    """
    ev = load(spark, sf_dir, "events")
    ux = (F.col("user_id") % 16).cast("long")
    vx = F.least(F.floor(F.col("value") / 31.0), F.lit(15)).cast("long")
    coded = ev.select(ux.alias("ux"), vx.alias("vx"))
    zval = F.lit(0)
    for i in range(4):
        zval = (zval
                + (F.shiftright(F.col("ux"), i).bitwiseAND(1)
                   * (1 << (2 * i + 1)))
                + (F.shiftright(F.col("vx"), i).bitwiseAND(1)
                   * (1 << (2 * i))))
    z = coded.select("ux", "vx", zval.cast("long").alias("zval"))
    return (z.groupBy(F.floor(F.col("zval") / 8).cast("long")
                       .alias("zbucket"))
             .agg(F.count("*").alias("n"),
                  F.min("ux").alias("ux_min"), F.max("ux").alias("ux_max"),
                  F.min("vx").alias("vx_min"), F.max("vx").alias("vx_max"),
                  ((F.max("ux") - F.min("ux") + 1).cast("long")
                   * (F.max("vx") - F.min("vx") + 1)).alias("box_area")))


#: `sink_compact_small_files` dials: simulated streaming batches, files
#: written per batch dir (the small-file population), and the bounded
#: file count the compaction must land on.
_COMPACT_BATCHES = 8
_COMPACT_FILES_PER_BATCH = 3
_COMPACT_TARGET_FILES = 2


@op("sink_compact_small_files", oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS rows_before,
       CAST(count(*) AS BIGINT) AS rows_after,
       CAST(count(DISTINCT event_id % {_COMPACT_BATCHES}) AS BIGINT)
           AS n_batches,
       CAST(1 AS INT) AS value_match,
       CAST(1 AS INT) AS files_bounded
FROM events
""", tier=3, section="2.1")
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction for per-batch streaming sinks (round 9,
    VERDICT r8 missing #3): every `foreachBatch` op in this engine
    writes one parquet dir per batch_id — at 100 TB-streaming scale
    that sink accumulates the classic small-file population (NameNode /
    listing pressure, tiny row groups, dead scan parallelism). This op
    is the maintenance pass a deployment schedules: read the whole
    per-batch sink, rewrite it to a BOUNDED file count, and prove value
    identity before the swap.

    Pipeline: stage a deterministic per-batch sink (events keyed
    batch_id = event_id % 8, each batch written as 3 files — 24 small
    files, the shape `stream_heavy_hitters`' sink leaves behind), then
    compact: one read of the whole tree -> repartition(2) -> one
    rewrite. The audit row reports rows before/after, the batch count,
    ``value_match`` = (canonical per-row md5-hash SUM of the staged
    tree == same aggregate over the compacted tree — an order-invariant
    exact-long identity over every column including batch_id), and
    ``files_bounded`` = (compacted data-file count <= 2). The DuckDB
    oracle pins the row counts against the SOURCE table and the two
    proofs against 1 — if compaction dropped, duplicated, or mutated a
    single row, or fragmented the output, the audit row mismatches.

    Idempotent under re-runs (mode=overwrite both stages; re-running
    after a crash mid-compaction simply rewrites — the recovery test
    re-runs the op and pins identical output), which is exactly the
    property that lets a deployment schedule it blindly.

    Scale shape: ONE full read + ONE exchange (repartition to the
    target file count — in production sized to ~1 GB files instead of
    2) + two map-side-combinable hash aggregates for the identity
    proof. Nothing driver-sided except directory listing.

    The compaction core is :func:`compact_parquet_tree` — shared with
    the round-10 composition test that compacts the sink an ACTUAL
    ``foreachBatch`` op (`stream_heavy_hitters`) left behind and
    re-serves the merged result from the compacted tree (VERDICT r9
    missing #2; this registered op keeps the deterministic synthetic
    stage so the DuckDB oracle can state the row counts)."""
    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_compact_small_files")
    staged, compacted = (os.path.join(base, d)
                         for d in ("staged", "compacted"))

    batched = ev.withColumn(
        "batch_id", (F.col("event_id") % _COMPACT_BATCHES).cast("int"))
    (batched.repartition(_COMPACT_FILES_PER_BATCH)
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(staged))

    audit = compact_parquet_tree(spark, staged, compacted,
                                 batched.schema, _COMPACT_TARGET_FILES)
    n_batches = len([d for d in os.listdir(staged)
                     if d.startswith("batch_id=")])
    return spark.createDataFrame(
        [(audit["rows_before"], audit["rows_after"], n_batches,
          audit["value_match"], audit["files_bounded"])],
        "rows_before long, rows_after long, n_batches long, "
        "value_match int, files_bounded int")


def compact_parquet_tree(spark: SparkSession, staged: str,
                         compacted: str, schema,
                         target_files: int = _COMPACT_TARGET_FILES) -> dict:
    """The compaction pass itself: read the whole (possibly
    hive-partitioned) small-file tree at ``staged``, rewrite it to a
    bounded file count at ``compacted`` (mode=overwrite — idempotent
    under re-runs after a crash), and prove value identity before any
    swap. Returns the audit dict (rows before/after, the two proofs,
    and the compacted file count).

    Partition columns (e.g. a sink's ``batch_id=N`` dirs) surface via
    ``basePath`` and are carried into the compacted files as ordinary
    columns, so the identity hash covers them and a re-serve from the
    compacted tree can still group on them.

    ``staged`` may also be a LIST of directories (round 12): the
    transaction-log OPTIMIZE commit compacts exactly the ACTIVE dirs of
    a snapshot, never the whole data tree (retired-but-unvacuumed dirs
    must not leak back in). List inputs skip ``basePath`` — commit dirs
    are flat, not hive-partitioned."""
    # explicit schema: an EMPTY source writes a fileless staged tree,
    # and schema inference over zero files raises — the audit must
    # instead report a clean 0-row identity (degenerate-corpus guard)
    reader = spark.read.schema(schema)
    if isinstance(staged, str):
        back = reader.option("basePath", staged).parquet(staged)
    else:
        back = reader.parquet(*staged)
    (back.repartition(target_files)
         .write.mode("overwrite").parquet(compacted))

    def canon(df: DataFrame):
        # order-invariant exact identity: per-row md5 over every column
        # (timestamps canonicalized to micros, doubles to their exact
        # repr via CAST to string), 15 hex chars -> long, SUM of longs.
        # coalesce each column to a sentinel BEFORE concat_ws: concat_ws
        # silently drops NULL args, so (NULL,'x') and ('x',NULL) would
        # otherwise hash identically (ADVICE r9) — the sentinel encodes
        # NULLs positionally and the \x01 separator keeps fields distinct.
        cols = F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
                      for c in sorted(df.columns)])
        h = (F.conv(F.substring(F.md5(cols), 1, 15), 16, 10)
             .cast("decimal(38,0)"))  # exact sum, no ANSI long overflow
        return df.agg(F.count("*").alias("n"), F.sum(h).alias("hsum"))

    b = canon(back).collect()[0]
    comp = spark.read.schema(schema).parquet(compacted)
    a = canon(comp).collect()[0]
    n_files = len([f for f in os.listdir(compacted)
                   if f.endswith(".parquet")])
    return {
        "rows_before": int(b["n"]), "rows_after": int(a["n"]),
        "n_files": n_files,
        "value_match": int(b["hsum"] == a["hsum"] and b["n"] == a["n"]),
        "files_bounded": int(n_files <= target_files
                             and (n_files > 0 or b["n"] == 0)),
    }


# ==========================================================================
# Round-10 sixth wave (SURVEY.md §2.35)
# ==========================================================================

#: Commits of the transaction-log demo: version -> (adds, removes) of
#: COMMIT DIRECTORIES (the log tracks whole immutable commit dirs, so
#: snapshot resolution is pure set arithmetic over the manifests —
#: parquet part-file names inside a commit are engine-chosen and never
#: appear in the log).
_TXN_COMMITS = {
    1: (["v1"], []),          # initial load: event_id % 3 == 0
    2: (["v2"], []),          # append:       event_id % 3 == 1
    3: (["v3"], ["v1"]),      # rewrite v1's rows into v3, retire v1
}


@op("sink_txn_log_snapshot", oracle="""
SELECT CAST(1 AS INT) AS version, CAST(1 AS BIGINT) AS n_active_commits,
       (SELECT count(*) FROM events WHERE event_id % 3 = 0) AS n_rows,
       CAST(1 AS INT) AS rewrite_preserves_content
UNION ALL
SELECT CAST(2 AS INT), CAST(2 AS BIGINT),
       (SELECT count(*) FROM events WHERE event_id % 3 IN (0, 1)),
       CAST(1 AS INT)
UNION ALL
SELECT CAST(3 AS INT), CAST(2 AS BIGINT),
       (SELECT count(*) FROM events WHERE event_id % 3 IN (0, 1)),
       CAST(1 AS INT)
""", tier=3, section="2.35")
def sink_txn_log_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTION-LOG table format with TIME TRAVEL — the lakehouse
    primitive (Delta/Iceberg's core idea) in ~50 lines of engine: a
    table is an append-only log of commits, each commit adds/removes
    immutable data directories, and snapshot(v) is the set-arithmetic
    resolution of manifests 1..v. Three commits stage here: v1 loads a
    third of the events, v2 appends another third, v3 REWRITES v1's
    rows into a fresh commit and retires v1 (the compaction shape).
    The op then TIME-TRAVEL-READS every version and emits one audit
    row per snapshot: active commit count, row count, and the proof
    that the v3 rewrite preserved v2's content exactly (the
    order-invariant per-row md5-sum identity, NULL-sentinel encoded —
    `compact_parquet_tree`'s discipline).

    The DuckDB oracle states each snapshot's row count directly from
    the source slices and pins the content proof at 1 — a log
    resolution bug (reading a retired commit, missing an add, a lossy
    rewrite) mismatches the row.

    Scale shape: manifests are driver-side JSON (3 tiny files — the
    log IS driver-scale metadata, that's the design's point); data
    commits are ordinary distributed parquet writes; each snapshot
    read is one multi-dir parquet scan with the log resolving WHICH
    dirs, so time travel costs nothing at read time beyond listing.
    Idempotent: every stage overwrites (re-run after a crash rewrites
    the same bytes)."""
    import json as _json
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_log_snapshot")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    slices = {
        "v1": ev.filter(F.col("event_id") % 3 == 0),
        "v2": ev.filter(F.col("event_id") % 3 == 1),
    }
    slices["v1"].repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v1"))
    slices["v2"].repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v2"))
    # v3 = the rewrite commit: re-read v1's committed bytes and rewrite
    v1_back = spark.read.schema(ev.schema).parquet(os.path.join(data, "v1"))
    v1_back.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v3"))
    for v, (adds, removes) in _TXN_COMMITS.items():
        with open(os.path.join(log, f"{v}.json"), "w") as f:
            _json.dump({"version": v, "add": adds, "remove": removes}, f)

    def active(version: int) -> list[str]:
        dirs: set[str] = set()
        for v in range(1, version + 1):
            with open(os.path.join(log, f"{v}.json")) as f:
                c = _json.load(f)
            dirs |= set(c["add"])
            dirs -= set(c["remove"])
        return sorted(dirs)

    def canon(df: DataFrame):
        cols = F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
                      for c in sorted(df.columns)])
        h = (F.conv(F.substring(F.md5(cols), 1, 15), 16, 10)
             .cast("decimal(38,0)"))
        return df.agg(F.count("*").alias("n"), F.sum(h).alias("hsum"))

    snaps = {}
    for v in sorted(_TXN_COMMITS):
        dirs = active(v)
        snap = spark.read.schema(ev.schema).parquet(
            *[os.path.join(data, d) for d in dirs])
        r = canon(snap).collect()[0]
        snaps[v] = (len(dirs), int(r["n"]), r["hsum"])
    rewrite_ok = int(snaps[3][1] == snaps[2][1]
                     and snaps[3][2] == snaps[2][2])
    return spark.createDataFrame(
        [(v, snaps[v][0], snaps[v][1], 1 if v < 3 else rewrite_ok)
         for v in sorted(snaps)],
        "version int, n_active_commits long, n_rows long, "
        "rewrite_preserves_content int")


# ==========================================================================
# Round-11 wave (SURVEY.md §2.37): the transaction log grows MERGE,
# optimistic-concurrency conflict detection, and VACUUM — the three
# operations a lakehouse user reaches for right after time travel
# (VERDICT r10 "what's missing" #1).
# ==========================================================================


class TxnConflictError(RuntimeError):
    """A concurrent writer already committed this version — the caller's
    snapshot is stale; re-read the table and retry the transaction."""


def txn_commit(log_dir: str, version: int, adds: list[str],
               removes: list[str], extra: dict | None = None) -> None:
    """OPTIMISTIC-CONCURRENCY commit: atomically create
    ``{version}.json`` in the log directory. Two writers that both
    prepared against base version ``version - 1`` race to create the
    same file; exactly one wins (POSIX hard-link-into-place — on an
    object store the same role is played by a put-if-absent /
    conditional-write primitive over a COMPLETE object), the loser gets
    :class:`TxnConflictError` and must rebase. This is the whole Delta/
    Iceberg commit protocol reduced to its primitive: the LOG serializes
    writers, the (immutable) data dirs never need coordination.

    The manifest content is made durable BEFORE the version slot is
    claimed (ADVICE r11): the JSON is written + fsynced to a
    writer-private temp file, then ``os.link`` publishes it under the
    final name — link is atomic and fails if the slot exists, so a
    crash mid-write leaves only an unreferenced temp file, never a
    truncated ``{version}.json`` permanently occupying the slot.

    ``extra`` merges additional manifest fields (commit timestamp,
    schema — the round-12 checkpoint / schema-evolution / AS-OF keys
    use it); ``version``/``add``/``remove`` stay reserved."""
    import contextlib as _contextlib
    import json as _json
    import threading as _threading
    import uuid as _uuid

    path = os.path.join(log_dir, f"{version}.json")
    # temp name unique PER ATTEMPT, not per process (ADVICE r12): two
    # threads of one driver committing the same version must never share
    # a temp path, or the loser can truncate the winner's fsynced bytes
    # before os.link publishes them (a corrupt manifest would win the
    # slot). pid + thread ident + uuid4 makes collision impossible.
    tmp = os.path.join(
        log_dir, f".{version}.{os.getpid()}.{_threading.get_ident()}."
                 f"{_uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        _json.dump({"version": version, "add": sorted(adds),
                    "remove": sorted(removes), **(extra or {})}, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise TxnConflictError(
            f"transaction log already holds version {version} "
            f"({path}): a concurrent writer committed first — rebase "
            f"onto the new snapshot and retry") from None
    finally:
        # suppress, not bare-unlink: a racing cleanup of the same temp
        # file must never mask the TxnConflictError above (ADVICE r12).
        with _contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)


def _txn_manifest(log_dir: str, version: int) -> dict:
    import json as _json

    with open(os.path.join(log_dir, f"{version}.json")) as f:
        return _json.load(f)


def txn_resolve(log_dir: str, version: int) -> tuple[list[str], int, int]:
    """Checkpoint-aware snapshot resolution (round 12, VERDICT r11 #3):
    returns ``(active_dirs, n_manifests_read, seed_checkpoint_version)``.

    If ``_last_checkpoint`` names a checkpoint at version ``c <= version``,
    resolution seeds from ``_checkpoint.{c}.json``'s materialized
    active-dir set and replays only manifests ``c+1..version`` —
    O(suffix) per read instead of O(history). Requests BELOW the last
    checkpoint (vacuum horizons, deep time travel) fall back to the full
    replay from manifest 1 — the checkpoint is an accelerator, never a
    different answer; a pointer that names a checkpoint object that no
    longer exists (cleaned up, partially replicated) degrades to the
    same full replay instead of failing (ADVICE r12 — the accelerator
    contract holds even when the accelerator is damaged). Raises
    FileNotFoundError if a replayed manifest is missing (version never
    committed)."""
    import json as _json

    seed: set[str] = set()
    start, ckpt_v = 1, 0
    ptr = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(ptr):
        with open(ptr) as f:
            cv = int(_json.load(f)["version"])
        if cv <= version:
            try:
                with open(os.path.join(log_dir,
                                       f"_checkpoint.{cv}.json")) as f:
                    seed = set(_json.load(f)["active"])
                start, ckpt_v = cv + 1, cv
            except FileNotFoundError:
                seed, start, ckpt_v = set(), 1, 0
    dirs, reads = set(seed), 0
    for v in range(start, version + 1):
        c = _txn_manifest(log_dir, v)
        reads += 1
        dirs |= set(c["add"])
        dirs -= set(c["remove"])
    return sorted(dirs), reads, ckpt_v


def txn_active_dirs(log_dir: str, version: int) -> list[str]:
    """Snapshot resolution: fold add/remove sets of manifests
    ``1..version``, seeded from the last checkpoint when one covers the
    request (see :func:`txn_resolve`). Raises FileNotFoundError if a
    replayed manifest is missing (version never committed)."""
    return txn_resolve(log_dir, version)[0]


def txn_checkpoint(log_dir: str, version: int, *,
                   crash_before_pointer_swap: bool = False) -> None:
    """Materialize snapshot resolution at ``version`` into a manifest
    CHECKPOINT (the Delta `_last_checkpoint` idea): without one, every
    read replays the whole log — O(history); with one, reads cost
    checkpoint + suffix.

    Two steps, each independently atomic, in the only safe order:

    1. temp-write + fsync + ``os.replace`` the COMPLETE checkpoint
       object to ``_checkpoint.{version}.json`` (content is a pure
       function of the log prefix, so concurrent checkpointers of the
       same version converge byte-identically);
    2. temp-write + fsync + ``os.replace`` the ``_last_checkpoint``
       pointer — monotonic: an already-newer pointer is left alone.

    A crash BETWEEN the steps is safe by construction: the pointer
    still names the previous checkpoint (or none), resolution falls
    back to a longer replay — never a wrong answer, only a slower one —
    and re-running the checkpoint converges. The ``crash_before_pointer_
    swap`` hook stops after step 1 so tests (and the op's audit row) can
    prove exactly that window."""
    import json as _json

    dirs, _, _ = txn_resolve(log_dir, version)
    ckpt = os.path.join(log_dir, f"_checkpoint.{version}.json")
    tmp = ckpt + f".{os.getpid()}.tmp"
    # the checkpoint also records the checkpointed version's commit
    # timestamp when the manifest carries one (round 13, VERDICT r12
    # wrong #1): AS-OF resolution seeds its probe from it and walks only
    # the suffix — the metadata plane's O(history) disease, cured the
    # same way snapshot resolution was. Commit timestamps are monotone
    # by protocol (version slots serialize writers; each stamps at
    # commit time), so ts(checkpoint) <= requested implies the answer
    # is at or after the checkpoint.
    obj = {"version": version, "active": dirs}
    mf = _txn_manifest(log_dir, version)
    if "ts" in mf:
        obj["ts"] = mf["ts"]
    # ... and the resolved table schema when the history records one
    # (round 13): schema resolution then reads checkpoint + suffix
    # instead of walking back to the last schema commit.
    try:
        obj["schema"], _, _ = txn_schema_resolve(log_dir, version)
    except ValueError:
        pass  # schema-less history (most demos): nothing to record
    with open(tmp, "w") as f:
        _json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ckpt)
    if crash_before_pointer_swap:
        return
    ptr = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(ptr):
        with open(ptr) as f:
            if int(_json.load(f)["version"]) >= version:
                return
    tmp2 = ptr + f".{os.getpid()}.tmp"
    with open(tmp2, "w") as f:
        _json.dump({"version": version}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp2, ptr)


def txn_version_at_resolve(log_dir: str,
                           ts: int) -> tuple[int, int, int]:
    """Checkpoint-seeded AS-OF resolution (round 13, VERDICT r12 wrong
    #1): returns ``(version, n_manifest_reads, seed_checkpoint_version)``
    where ``version`` is the greatest committed version whose manifest
    ``ts`` is <= the requested timestamp. The r12 implementation opened
    and parsed EVERY manifest from v1 on every lookup — O(history) per
    AS-OF call, the exact metadata-plane disease ``txn_checkpoint``
    exists to cure. Two fixes, both metadata-plane (data answers are
    unchanged):

    1. **Checkpoint seed**: if ``_last_checkpoint`` names a checkpoint
       whose recorded commit ``ts`` is <= the requested timestamp, the
       probe starts AT the checkpoint (best = ckpt version) and walks
       only the suffix. Commit timestamps are monotone by protocol
       (the version slots serialize writers; each stamps at commit
       time), so nothing below the checkpoint can beat it.
    2. **Early stop**: the forward walk stops at the FIRST manifest
       stamped after the requested timestamp — by the same
       monotonicity, every later commit is newer still. A mid-history
       lookup no longer walks to the head.

    Commit timestamps are recorded IN the manifest at commit time (via
    ``txn_commit``'s ``extra``), never inferred from file mtimes.
    Raises ValueError if the timestamp precedes the first commit, or if
    a probed manifest carries no timestamp (AS-OF needs ts-stamped
    commits — fail loudly, never guess)."""
    import json as _json

    best, v, ckpt_v = None, 1, 0
    ptr = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(ptr):
        with open(ptr) as f:
            cv = int(_json.load(f)["version"])
        try:
            with open(os.path.join(log_dir,
                                   f"_checkpoint.{cv}.json")) as f:
                ck = _json.load(f)
            if "ts" in ck and ck["ts"] <= ts:
                best, v, ckpt_v = cv, cv + 1, cv
        except FileNotFoundError:
            pass  # damaged accelerator -> full probe (txn_resolve's rule)
    reads = 0
    while True:
        try:
            c = _txn_manifest(log_dir, v)
        except FileNotFoundError:
            break
        reads += 1
        if "ts" not in c:
            raise ValueError(
                f"manifest {v} in {log_dir} records no commit timestamp "
                f"— AS-OF reads need ts-stamped commits")
        if c["ts"] <= ts:
            best = v
        else:
            break  # monotone commit clock: all later commits are newer
        v += 1
    if best is None:
        raise ValueError(
            f"AS OF {ts} precedes the first commit in {log_dir} — "
            f"no snapshot existed yet")
    return best, reads, ckpt_v


def txn_version_at(log_dir: str, ts: int) -> int:
    """AS-OF resolution: the greatest committed version whose manifest
    ``ts`` is <= the requested timestamp — "AS OF <ts>" is the form
    users actually type. Checkpoint-seeded + early-stopping since round
    13; see :func:`txn_version_at_resolve` for the read-cost contract."""
    return txn_version_at_resolve(log_dir, ts)[0]


def txn_schema_resolve(log_dir: str,
                       version: int) -> tuple[dict, int, int]:
    """Checkpoint-seeded SCHEMA resolution (round 13 — closes the
    "folding the schema into the checkpoint would cap it at O(1),
    noted, not yet done" caveat `sink_txn_schema_evolve` shipped with):
    returns ``(schema_json, n_manifest_reads, seed_checkpoint_version)``
    for the newest schema recorded at-or-before ``version``.

    With a covering checkpoint that recorded a schema, resolution
    starts FROM the checkpoint's materialized schema and replays only
    the suffix (any newer schema-carrying manifest in cv+1..version
    wins) — O(suffix), the same discipline as active-dir and AS-OF
    resolution. Without one, the backward walk from ``version`` stops
    at the first schema-carrying manifest — O(distance to the last
    schema commit), worst-case O(history) when only v1 recorded one.
    Raises ValueError if no schema is recorded anywhere at-or-before
    ``version``."""
    import json as _json

    ptr = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(ptr):
        with open(ptr) as f:
            cv = int(_json.load(f)["version"])
        if cv <= version:
            try:
                with open(os.path.join(log_dir,
                                       f"_checkpoint.{cv}.json")) as f:
                    ck = _json.load(f)
            except FileNotFoundError:
                ck = {}
            if "schema" in ck:
                best, reads = ck["schema"], 0
                for v in range(cv + 1, version + 1):
                    c = _txn_manifest(log_dir, v)
                    reads += 1
                    if "schema" in c:
                        best = c["schema"]
                return best, reads, cv
    reads = 0
    for v in range(version, 0, -1):
        c = _txn_manifest(log_dir, v)
        reads += 1
        if "schema" in c:
            return c["schema"], reads, 0
    raise ValueError(
        f"no schema recorded at or before v{version} in {log_dir}")


def txn_head_version(log_dir: str) -> int:
    """The newest committed version (0 on an empty log): seeded from
    ``_last_checkpoint`` when present and probed forward — O(suffix past
    the checkpoint), the same metadata-cost discipline as
    :func:`txn_resolve`. The probe is read-only; writers race for
    head+1 via :func:`txn_commit` and rely on ITS atomicity, never on
    this probe being current."""
    import json as _json

    v = 0
    ptr = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(ptr):
        with open(ptr) as f:
            cv = int(_json.load(f)["version"])
        if os.path.exists(os.path.join(log_dir, f"{cv}.json")):
            v = cv
    while os.path.exists(os.path.join(log_dir, f"{v + 1}.json")):
        v += 1
    return v


def txn_last_epoch(log_dir: str, app_id: str) -> tuple[int | None, int]:
    """EXACTLY-ONCE streaming bookkeeping (round 13, VERDICT r12 missing
    #1 — the public Delta ``txn`` appId/version idea): a streaming
    writer stamps every commit with its ``app`` id and the micro-batch
    ``epoch`` it landed; this returns ``(last_committed_epoch,
    version)`` for the app, or ``(None, 0)`` if the app never
    committed. The scan walks BACKWARD from the head and stops at the
    app's first (i.e. newest) stamped manifest — for a streaming app
    that commits every batch, that is O(1) manifests from the head
    regardless of history length. Epochs are monotone per app (Spark
    assigns micro-batch ids monotonically), so the newest stamp alone
    decides idempotency: a replayed batch with epoch <= last must
    NO-OP."""
    for v in range(txn_head_version(log_dir), 0, -1):
        c = _txn_manifest(log_dir, v)
        if c.get("app") == app_id and "epoch" in c:
            return c["epoch"], v
    return None, 0


def txn_stream_commit(log_dir: str, app_id: str, epoch_id: int,
                      adds: list[str], *,
                      extra: dict | None = None) -> bool:
    """Idempotent commit of one micro-batch: commits ``adds`` at
    head+1 stamped ``{app, epoch}`` UNLESS the app already committed
    this (or a later) epoch — the replayed-batch case, which returns
    False without touching the log. Loses a head race to a concurrent
    writer loudly via :class:`TxnConflictError` and retries against the
    new head, re-checking idempotency each attempt (the concurrent
    winner may have been a replica of THIS app committing the same
    epoch). Returns True iff this call committed.

    The exactly-once argument composes three facts: (1) the data dir
    write is overwrite-idempotent (re-landing epoch N rewrites the same
    bytes at the same path — no reader sees it until a manifest adds
    it); (2) the manifest create is atomic (txn_commit's os.link), so
    the epoch stamp and the dir-add are one indivisible publish; (3)
    the epoch check and the commit race through the SAME version slot,
    so a replica that loses the race re-reads the log and sees the
    winner's stamp. A crash between data write and commit leaves an
    unreferenced dir — garbage for vacuum, never a duplicate row."""
    while True:
        last, _ = txn_last_epoch(log_dir, app_id)
        if last is not None and epoch_id <= last:
            return False
        try:
            txn_commit(log_dir, txn_head_version(log_dir) + 1, adds, [],
                       extra={**(extra or {}),
                              "app": app_id, "epoch": epoch_id})
            return True
        except TxnConflictError:
            continue  # lost the head race: re-check idempotency, retry


def txn_rebase_check(log_dir: str, version: int,
                     removal_set: list[str]) -> None:
    """Validate an OPTIMIZE/rewrite rebase after losing a commit race:
    every dir the rewrite intends to REMOVE must still be active in the
    snapshot at ``version`` (the concurrent winner's), else the rewrite
    was prepared against data a concurrent transaction already retired
    and recommitting would resurrect it. Raises
    :class:`TxnConflictError` — an explicit check, not an ``assert``,
    because ``python -O`` strips asserts and the recommit would then
    proceed unchecked (ADVICE r12)."""
    still_active = set(txn_active_dirs(log_dir, version))
    if not set(removal_set) <= still_active:
        raise TxnConflictError(
            f"rebase invalid: dirs "
            f"{sorted(set(removal_set) - still_active)} were removed "
            f"by a concurrent transaction — re-prepare against the "
            f"new snapshot")


def _txn_canon(df: DataFrame):
    """Order-invariant exact content identity (1-row frame): per-row md5
    over every column, NULL-sentinel encoded (`compact_parquet_tree`'s
    discipline), 15 hex chars -> exact decimal sum."""
    cols = F.concat_ws(
        "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
                  for c in sorted(df.columns)])
    h = (F.conv(F.substring(F.md5(cols), 1, 15), 16, 10)
         .cast("decimal(38,0)"))
    return df.agg(F.count("*").alias("n"), F.sum(h).alias("hsum"))


@op("sink_txn_merge", oracle="""
SELECT
    CAST(1 AS INT) AS version_base,
    CAST(2 AS INT) AS version_merge,
    (SELECT count(*) FROM events WHERE event_id % 3 = 0) AS n_base,
    (SELECT count(*) FROM events WHERE event_id % 5 = 0) AS n_source,
    (SELECT count(*) FROM events
     WHERE event_id % 3 = 0 AND event_id % 5 = 0 AND event_id % 2 = 1)
        AS n_updated,
    (SELECT count(*) FROM events
     WHERE event_id % 3 <> 0 AND event_id % 5 = 0 AND event_id % 2 = 1)
        AS n_inserted,
    (SELECT count(*) FROM events
     WHERE event_id % 3 = 0 AND event_id % 5 = 0 AND event_id % 2 = 0)
        AS n_deleted,
    (SELECT count(*) FROM events
     WHERE (event_id % 3 = 0 AND event_id % 5 <> 0)
        OR (event_id % 5 = 0 AND event_id % 2 = 1)) AS n_final,
    CAST(1 AS INT) AS merge_preserves_content,
    CAST(1 AS INT) AS base_time_travel_intact
""", tier=3, section="2.37")
def sink_txn_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO a transaction-log table — the very next operation a
    `sink_txn_log_snapshot` user runs (VERDICT r10 missing #1): commit
    v1 loads a base slice (event_id % 3 == 0); a change feed
    (event_id % 5 == 0; even ids are DELETEs, odd ids UPSERTs carrying
    value + 1000) merges into the live snapshot as commit v2 — matched
    deletes vanish, matched upserts take the new value, unmatched
    upserts insert, unmatched deletes are no-ops (`cdc_apply_changes`'s
    row semantics, composed WITH the log). Copy-on-write at commit
    granularity: untouched rows = snapshot ANTI-JOIN change keys,
    merged = untouched ∪ upsert rows, written as ONE new immutable dir;
    the commit adds it and retires the base dir. The audit row reports
    every stage count, the content proof (the merged snapshot's
    order-invariant md5-sum identity vs an INDEPENDENTLY derived
    expected frame), and that time travel to v1 still returns the
    pre-merge base exactly.

    The DuckDB oracle states all counts directly from the source
    predicates and pins both proofs at 1 — a merge bug (dropped
    untouched row, double-applied upsert, resurrecting delete, broken
    time travel) mismatches the row.

    Scale shape: the merge is one anti-join (change keys broadcast when
    bounded, shuffle equi-join otherwise — no hint forces it) + one
    union + one distributed write; at production scale the table is
    dir-partitioned and only AFFECTED dirs rewrite, which changes the
    dir arithmetic, not the log protocol. Manifests stay driver-side
    JSON. Idempotent: the whole staging tree is wiped and rebuilt."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_merge")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    base_df = ev.filter(F.col("event_id") % 3 == 0)
    base_df.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v1"))
    txn_commit(log, 1, ["v1"], [])

    # change feed: even ids delete, odd ids upsert value+1000
    src = ev.filter(F.col("event_id") % 5 == 0)
    upserts = src.filter(F.col("event_id") % 2 == 1) \
                 .withColumn("value", F.col("value") + F.lit(1000.0))
    snap1 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 1)])
    untouched = snap1.join(src.select("event_id"), "event_id",
                           "left_anti")
    merged = untouched.unionByName(upserts.select(*snap1.columns))
    merged.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v2_merge"))
    txn_commit(log, 2, ["v2_merge"], ["v1"])

    # stage counts: one map-combinable conditional aggregate
    eid = F.col("event_id")
    is_base, is_src = eid % 3 == 0, eid % 5 == 0
    is_del = is_src & (eid % 2 == 0)
    is_ups = is_src & (eid % 2 == 1)
    # coalesce: on an EMPTY events corpus F.sum returns NULL while the
    # oracle's count(*) subqueries return 0 (ADVICE r11).
    cnt = lambda c: F.coalesce(  # noqa: E731
        F.sum(c.cast("long")), F.lit(0)).cast("long")
    counts = ev.agg(
        cnt(is_base).alias("n_base"), cnt(is_src).alias("n_source"),
        cnt(is_base & is_ups).alias("n_updated"),
        cnt(~is_base & is_ups).alias("n_inserted"),
        cnt(is_base & is_del).alias("n_deleted")).collect()[0]

    # proofs: merged snapshot vs independent expectation; v1 intact
    snap2 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 2)])
    expected = (ev.filter(is_base & ~is_src)
                  .unionByName(ev.filter(is_ups).withColumn(
                      "value", F.col("value") + F.lit(1000.0))))
    got2, want2 = _txn_canon(snap2).collect()[0], \
        _txn_canon(expected).collect()[0]
    snap1_back = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 1)])
    got1, want1 = _txn_canon(snap1_back).collect()[0], \
        _txn_canon(base_df).collect()[0]
    return spark.createDataFrame(
        [(1, 2, counts["n_base"], counts["n_source"],
          counts["n_updated"], counts["n_inserted"], counts["n_deleted"],
          int(got2["n"]),
          int(tuple(got2) == tuple(want2)),
          int(tuple(got1) == tuple(want1)))],
        "version_base int, version_merge int, n_base long, "
        "n_source long, n_updated long, n_inserted long, n_deleted long, "
        "n_final long, merge_preserves_content int, "
        "base_time_travel_intact int")


#: vacuum demo dials: retention horizon (snapshots >= this stay
#: readable) over the same 3-commit history as `sink_txn_log_snapshot`.
_VACUUM_HORIZON = 3


@op("sink_txn_vacuum", oracle="""
SELECT
    CAST(3 AS BIGINT) AS n_dirs_before,
    CAST(2 AS BIGINT) AS n_dirs_after,
    CAST(1 AS BIGINT) AS n_vacuumed,
    (SELECT count(*) FROM events WHERE event_id % 3 IN (0, 1))
        AS n_rows_latest,
    CAST(1 AS INT) AS latest_content_intact,
    CAST(1 AS INT) AS pre_horizon_unreadable
""", tier=3, section="2.37")
def sink_txn_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM for the transaction-log table (VERDICT r10 missing #1):
    data dirs retired by a rewrite commit stay on disk so OLDER
    snapshots keep resolving (time travel) — vacuum is the retention
    pass that reclaims them. Stage `sink_txn_log_snapshot`'s 3-commit
    history (v1 load, v2 append, v3 rewrites v1), then vacuum with
    horizon = version 3: every dir referenced by ANY snapshot >= the
    horizon survives ({v2, v3}); dirs referenced only by pre-horizon
    snapshots (v1) are deleted from disk. The audit row proves the
    invariant both ways: the post-horizon snapshot still resolves with
    byte-identical content (order-invariant md5-sum vs an independent
    derivation), AND the pre-horizon snapshot now fails loudly to
    read — retention is a contract, not a hope.

    Scale shape: vacuum is pure driver-side set arithmetic over the
    (driver-scale) manifests + directory deletes; no data is read or
    shuffled. The content proof is one multi-dir scan + one
    map-combinable aggregate. Idempotent: the staging tree is wiped
    and rebuilt, and re-vacuuming an already-vacuumed table removes
    nothing."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_vacuum")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    ev.filter(F.col("event_id") % 3 == 0).repartition(1) \
      .write.mode("overwrite").parquet(os.path.join(data, "v1"))
    txn_commit(log, 1, ["v1"], [])
    ev.filter(F.col("event_id") % 3 == 1).repartition(1) \
      .write.mode("overwrite").parquet(os.path.join(data, "v2"))
    txn_commit(log, 2, ["v2"], [])
    v1_back = spark.read.schema(ev.schema).parquet(os.path.join(data, "v1"))
    v1_back.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v3"))
    txn_commit(log, 3, ["v3"], ["v1"])

    latest = 3
    n_before = len(os.listdir(data))
    referenced: set[str] = set()
    for v in range(_VACUUM_HORIZON, latest + 1):
        referenced |= set(txn_active_dirs(log, v))
    vacuumed = sorted(set(os.listdir(data)) - referenced)
    for d in vacuumed:
        _shutil.rmtree(os.path.join(data, d))
    n_after = len(os.listdir(data))

    snap3 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, latest)])
    expected = ev.filter(F.col("event_id") % 3 < 2)
    got, want = _txn_canon(snap3).collect()[0], \
        _txn_canon(expected).collect()[0]
    try:
        spark.read.schema(ev.schema).parquet(
            *[os.path.join(data, d)
              for d in txn_active_dirs(log, 1)]).count()
        pre_unreadable = 0
    except Exception:
        pre_unreadable = 1
    return spark.createDataFrame(
        [(n_before, n_after, len(vacuumed), int(got["n"]),
          int(tuple(got) == tuple(want)), pre_unreadable)],
        "n_dirs_before long, n_dirs_after long, n_vacuumed long, "
        "n_rows_latest long, latest_content_intact int, "
        "pre_horizon_unreadable int")


# ==========================================================================
# Round-12 wave (SURVEY.md §2.38): the transaction log grows manifest
# CHECKPOINTING (O(suffix) snapshot reads), OPTIMIZE as a conflict-checked
# commit, ADD-COLUMN schema evolution, and timestamp time travel — VERDICT
# r11 "what's missing" #2/#3/#4.
# ==========================================================================

#: checkpoint cadence of the demo history: checkpoint after this commit.
_TXN_CKPT_AT = 5
#: number of append commits staged by `sink_txn_checkpoint`.
_TXN_CKPT_COMMITS = 7


@op("sink_txn_checkpoint", oracle=f"""
SELECT CAST({_TXN_CKPT_COMMITS} AS INT) AS n_commits,
       CAST({_TXN_CKPT_AT} AS INT) AS ckpt_version,
       CAST({_TXN_CKPT_COMMITS} AS BIGINT) AS n_manifests_full,
       CAST({_TXN_CKPT_COMMITS - _TXN_CKPT_AT} AS BIGINT)
           AS n_manifests_with_ckpt,
       CAST(0 AS BIGINT) AS n_manifests_after_recovery,
       (SELECT count(*) FROM events) AS n_rows_latest,
       CAST(1 AS INT) AS ckpt_matches_replay,
       CAST(1 AS INT) AS crash_window_safe,
       CAST(1 AS INT) AS pointerless_fallback
""", tier=3, section="2.38")
def sink_txn_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest CHECKPOINT for the transaction log (VERDICT r11 missing
    #2): before this, every snapshot read replayed every JSON manifest
    from v1 — O(history) per read; a `_last_checkpoint`-style pointer +
    a materialized active-dir set makes reads O(suffix). Stage
    7 append commits (commit vi adds the event_id % 7 == i-1 slice),
    checkpoint after commit 5 (the _TXN_CKPT_* dials), and prove the
    whole contract in one audit row: (a) resolution cost drops from 7
    manifest reads to 2 with the checkpoint and
    to 0 after a checkpoint AT the head; (b) the checkpoint-seeded
    snapshot is byte-identical (order-invariant md5-sum) to the full
    replay; (c) a crash BETWEEN checkpoint-file write and pointer swap
    leaves reads correct (pointer still names the old checkpoint) and a
    re-run converges; (d) deleting the pointer entirely falls back to
    the full replay with identical content.

    The DuckDB oracle pins the commit/manifest-count arithmetic
    directly and every proof at 1 — a checkpoint bug (stale seed,
    wrong suffix start, pointer published before content is durable)
    mismatches the row.

    Scale shape: the checkpoint is driver-side JSON over driver-scale
    metadata (that's the log design's point); each snapshot read stays
    one multi-dir parquet scan — the checkpoint changes how many
    manifests resolution READS, never which dirs it returns. Idempotent:
    the staging tree is wiped and rebuilt; re-checkpointing the same
    version rewrites identical bytes."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_checkpoint")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    k = _TXN_CKPT_COMMITS
    for v in range(1, k + 1):
        ev.filter(F.col("event_id") % k == v - 1).repartition(1) \
          .write.mode("overwrite").parquet(os.path.join(data, f"v{v}"))
        txn_commit(log, v, [f"v{v}"], [])

    def snap_canon(version: int):
        dirs, reads, ckpt_v = txn_resolve(log, version)
        df = spark.read.schema(ev.schema).parquet(
            *[os.path.join(data, d) for d in dirs])
        r = _txn_canon(df).collect()[0]
        return (int(r["n"]), r["hsum"]), reads, ckpt_v

    full_canon, full_reads, _ = snap_canon(k)          # no checkpoint yet
    txn_checkpoint(log, _TXN_CKPT_AT)
    ckpt_canon, ckpt_reads, seed_v = snap_canon(k)
    ckpt_ok = int(ckpt_canon == full_canon and seed_v == _TXN_CKPT_AT)

    # crash window: checkpoint at the head, but die before the pointer
    # swap — reads must still resolve via the OLD checkpoint, identically
    txn_checkpoint(log, k, crash_before_pointer_swap=True)
    crash_canon, crash_reads, crash_seed = snap_canon(k)
    crash_ok = int(crash_canon == full_canon
                   and crash_seed == _TXN_CKPT_AT
                   and crash_reads == ckpt_reads)
    # recovery: re-run the interrupted checkpoint; now reads seed at the
    # head and replay zero manifests
    txn_checkpoint(log, k)
    rec_canon, rec_reads, rec_seed = snap_canon(k)
    crash_ok = int(crash_ok and rec_canon == full_canon and rec_seed == k)

    # pointerless fallback: drop the pointer -> full replay, same content
    os.remove(os.path.join(log, "_last_checkpoint"))
    fb_canon, fb_reads, fb_seed = snap_canon(k)
    fb_ok = int(fb_canon == full_canon and fb_seed == 0
                and fb_reads == full_reads)

    return spark.createDataFrame(
        [(k, _TXN_CKPT_AT, full_reads, ckpt_reads, rec_reads,
          full_canon[0], ckpt_ok, crash_ok, fb_ok)],
        "n_commits int, ckpt_version int, n_manifests_full long, "
        "n_manifests_with_ckpt long, n_manifests_after_recovery long, "
        "n_rows_latest long, ckpt_matches_replay int, "
        "crash_window_safe int, pointerless_fallback int")


@op("sink_txn_optimize", oracle="""
SELECT CAST(4 AS INT) AS version_base,
       CAST(1 AS INT) AS conflict_detected,
       CAST(6 AS INT) AS version_optimize,
       CAST(5 AS BIGINT) AS n_dirs_before,
       CAST(2 AS BIGINT) AS n_dirs_after,
       (SELECT count(*) FROM events) AS n_rows_latest,
       CAST(1 AS INT) AS optimize_preserves_content,
       CAST(1 AS INT) AS pre_optimize_time_travel_intact
""", tier=3, section="2.38")
def sink_txn_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE (small-file/small-dir compaction) as a CONFLICT-CHECKED
    COMMIT (VERDICT r11 missing #2): `sink_compact_small_files` lives
    OUTSIDE the log — a lakehouse user needs compaction to be a
    transaction so readers never see a half-swapped table and a
    concurrent writer loses LOUDLY instead of being silently clobbered.
    Stage 4 append commits (event_id % 5 == 0..3); OPTIMIZE prepares
    against base version 4 by compacting exactly snapshot(4)'s active
    dirs (`compact_parquet_tree` over the dir LIST) into one dir; before
    it commits, a concurrent writer wins version 5 (appending the
    % 5 == 4 slice) — OPTIMIZE's commit raises TxnConflictError, and it
    REBASES: its removal set (the 4 dirs it compacted) is still active
    in v5 and disjoint from the writer's add, so the rewrite is still
    valid and recommits as version 6. The audit row carries the
    conflict proof, dir counts before/after, and the two content
    proofs: snapshot(6) equals the full expected table and time travel
    to the pre-OPTIMIZE version 4 still returns exactly the 4 slices.

    The DuckDB oracle pins the version/dir arithmetic and both proofs
    at 1 — a lost concurrent commit, a compaction that drops/duplicates
    rows, or a broken rebase mismatches the row.

    Scale shape: the compaction read is one multi-dir scan + bounded-
    file rewrite (distributed); conflict detection is the manifest
    create — driver-side, O(1); at production scale OPTIMIZE picks
    affected dirs by size stats instead of all of them, which changes
    the dir choice, not the protocol. Idempotent: staging wiped per
    run; a re-run after a crash mid-compaction rewrites the same
    bytes and re-attempts the same commit."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_optimize")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    for v in range(1, 5):
        ev.filter(F.col("event_id") % 5 == v - 1).repartition(1) \
          .write.mode("overwrite").parquet(os.path.join(data, f"v{v}"))
        txn_commit(log, v, [f"v{v}"], [])

    # OPTIMIZE prepares against base version 4
    base_version = 4
    opt_dirs = txn_active_dirs(log, base_version)
    audit = compact_parquet_tree(
        spark, [os.path.join(data, d) for d in opt_dirs],
        os.path.join(data, "opt"), ev.schema, target_files=1)

    # ... meanwhile a concurrent writer commits version 5
    ev.filter(F.col("event_id") % 5 == 4).repartition(1) \
      .write.mode("overwrite").parquet(os.path.join(data, "v5"))
    txn_commit(log, 5, ["v5"], [])

    # OPTIMIZE tries to commit version 5 -> loses loudly, rebases to 6
    conflict = 0
    opt_version = base_version + 1
    try:
        txn_commit(log, opt_version, ["opt"], opt_dirs)
    except TxnConflictError:
        conflict = 1
        # rebase: the compacted dirs are still active in v5 and the
        # concurrent add is disjoint from the removal set -> recommit
        txn_rebase_check(log, opt_version, opt_dirs)
        opt_version += 1
        txn_commit(log, opt_version, ["opt"], opt_dirs)

    n_before = len(txn_active_dirs(log, 5))
    after_dirs = txn_active_dirs(log, opt_version)
    snap = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in after_dirs])
    got, want = _txn_canon(snap).collect()[0], \
        _txn_canon(ev).collect()[0]
    content_ok = int(tuple(got) == tuple(want)
                     and audit["value_match"] == 1)
    snap4 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 4)])
    got4, want4 = _txn_canon(snap4).collect()[0], \
        _txn_canon(ev.filter(F.col("event_id") % 5 < 4)).collect()[0]
    return spark.createDataFrame(
        [(base_version, conflict, opt_version, n_before,
          len(after_dirs), int(got["n"]), content_ok,
          int(tuple(got4) == tuple(want4)))],
        "version_base int, conflict_detected int, version_optimize int, "
        "n_dirs_before long, n_dirs_after long, n_rows_latest long, "
        "optimize_preserves_content int, "
        "pre_optimize_time_travel_intact int")


@op("sink_txn_schema_evolve", oracle="""
SELECT CAST(1 AS INT) AS version_base, CAST(2 AS INT) AS version_evolve,
       (SELECT count(*) FROM events WHERE event_id % 2 = 0) AS n_rows_v1,
       (SELECT count(*) FROM events) AS n_rows_v2,
       CAST(6 AS INT) AS n_cols_v1, CAST(7 AS INT) AS n_cols_v2,
       (SELECT count(*) FROM events WHERE event_id % 2 = 0)
           AS n_newcol_nulls,
       CAST(1 AS INT) AS evolve_preserves_content,
       CAST(1 AS INT) AS pre_evolve_schema_intact,
       CAST(4 AS BIGINT) AS n_schema_reads_full,
       CAST(0 AS BIGINT) AS n_schema_reads_ckpt,
       CAST(1 AS INT) AS ckpt_schema_same
""", tier=3, section="2.38")
def sink_txn_schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD-COLUMN schema evolution on the transaction log (VERDICT r11
    missing #3): every long-lived table eventually grows a column, and
    the r11 log assumed a frozen schema (snapshot reads used the source
    schema verbatim). The schema is now part of the COMMIT: each
    manifest may record the table schema as of that version (via
    ``txn_commit``'s ``extra``), and a snapshot read resolves the
    newest schema at-or-before its version — RECORDED mergeSchema
    semantics, not footer inference. Commit v1 writes the base slice
    (event_id % 2 == 0, 6 columns); commit v2 appends the odd slice
    WITH a new ``value_eur = round(value * 0.9, 6)`` column and records
    the evolved 7-column schema. Reading snapshot(2) with the evolved
    schema null-fills the new column across v1's old files (parquet
    missing-column semantics — exactly mergeSchema's add-column case);
    time travel to v1 still reads the ORIGINAL 6-column shape. The
    audit row pins the row/column/null arithmetic plus two content
    proofs: snapshot(2) equals an independently derived
    base-null-filled ∪ evolved frame, and snapshot(1) equals the
    pre-evolution base exactly.

    The DuckDB oracle states every count from the source predicates
    and pins both proofs at 1 — a read that infers instead of resolving
    the recorded schema, drops old rows, or back-fills the wrong
    default mismatches the row.

    Scale shape: schema resolution is driver-side metadata. Round 13
    closed the caveat this op shipped with ("folding the schema into
    the checkpoint would cap it at O(1), noted, not yet done"):
    checkpoints now record the resolved schema and
    :func:`txn_schema_resolve` reads checkpoint + suffix — the audit
    row pins the arithmetic on a history with three schema-less
    metadata commits after the evolution (backward walk from v5 reads
    4 manifests; a checkpoint AT v5 drops it to 0, same schema). The
    null-fill costs NOTHING at read time (parquet scans simply project
    the missing column as null per file, no rewrite of old dirs — the
    whole point of add-column evolution). Idempotent: staging wiped
    per run."""
    import shutil as _shutil

    from pyspark.sql.types import StructType

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_schema_evolve")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    base_df = ev.filter(F.col("event_id") % 2 == 0)
    base_df.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v1"))
    txn_commit(log, 1, ["v1"], [],
               extra={"schema": base_df.schema.jsonValue()})

    evolved_df = (ev.filter(F.col("event_id") % 2 == 1)
                    .withColumn("value_eur",
                                F.round(F.col("value") * 0.9, 6)))
    evolved_df.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v2"))
    txn_commit(log, 2, ["v2"], [],
               extra={"schema": evolved_df.schema.jsonValue()})

    # three schema-less metadata commits (commitInfo-style: empty
    # add/remove — content unchanged) distance the head from the last
    # schema commit, so the read-cost arithmetic below is non-trivial
    for v in (3, 4, 5):
        txn_commit(log, v, [], [])

    def schema_at(version: int) -> StructType:
        return StructType.fromJson(
            txn_schema_resolve(log, version)[0])

    def snap(version: int) -> DataFrame:
        return spark.read.schema(schema_at(version)).parquet(
            *[os.path.join(data, d)
              for d in txn_active_dirs(log, version)])

    s2 = snap(2)
    n_v2 = s2.count()
    n_nulls = s2.filter(F.col("value_eur").isNull()).count()
    expected2 = (base_df.withColumn(
                     "value_eur", F.lit(None).cast("double"))
                 .unionByName(evolved_df))
    got2, want2 = _txn_canon(s2).collect()[0], \
        _txn_canon(expected2).collect()[0]
    s1 = snap(1)
    got1, want1 = _txn_canon(s1).collect()[0], \
        _txn_canon(base_df).collect()[0]
    pre_ok = int(tuple(got1) == tuple(want1)
                 and len(s1.columns) == len(base_df.columns))

    # read-cost contract (round 13): resolving the schema at the head
    # walks back v5, v4, v3, v2 — 4 manifest reads; a checkpoint at the
    # head materializes the resolved schema and drops it to 0, with the
    # SAME schema either way (the accelerator never changes the answer)
    sch_full, reads_full, _ = txn_schema_resolve(log, 5)
    txn_checkpoint(log, 5)
    sch_ck, reads_ck, seed = txn_schema_resolve(log, 5)
    ck_same = int(sch_ck == sch_full and seed == 5)
    return spark.createDataFrame(
        [(1, 2, int(got1["n"]), n_v2, len(s1.columns), len(s2.columns),
          n_nulls, int(tuple(got2) == tuple(want2)), pre_ok,
          reads_full, reads_ck, ck_same)],
        "version_base int, version_evolve int, n_rows_v1 long, "
        "n_rows_v2 long, n_cols_v1 int, n_cols_v2 int, "
        "n_newcol_nulls long, evolve_preserves_content int, "
        "pre_evolve_schema_intact int, n_schema_reads_full long, "
        "n_schema_reads_ckpt long, ckpt_schema_same int")


#: synthetic commit clock of the AS-OF demo: commit v is stamped
#: _TXN_TS_BASE + 100*v (deterministic — manifests record the ts, the
#: demo never reads a wall clock).
_TXN_TS_BASE = 1700000000


@op("sink_txn_timetravel_ts", oracle=f"""
SELECT CAST(2 AS INT) AS asof_mid_version,
       CAST(3 AS INT) AS asof_boundary_version,
       (SELECT count(*) FROM events WHERE event_id % 3 IN (0, 1))
           AS n_rows_asof_mid,
       CAST(1 AS INT) AS asof_content_ok,
       CAST(1 AS INT) AS asof_before_first_raises,
       CAST(3 AS BIGINT) AS n_manifests_full,
       CAST(1 AS BIGINT) AS n_manifests_with_ckpt,
       CAST(2 AS INT) AS ckpt_seed_version,
       CAST(1 AS INT) AS ckpt_same_answer
""", tier=3, section="2.38")
def sink_txn_timetravel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-addressed TIME TRAVEL (VERDICT r11 missing #4):
    version-addressed snapshots exist since r10, but "AS OF <ts>" is
    the form users actually type. Commits now record a timestamp IN
    the manifest (``txn_commit`` extra — never file mtimes, which move
    under copies/restores); ``txn_version_at(ts)`` resolves the
    greatest version committed at-or-before ts. Stage the canonical
    3-commit history (v1 load % 3 == 0, v2 append % 3 == 1, v3
    rewrites v1) on the synthetic clock ts(v) = base + 100·v, then
    prove: a mid-window ts (base+250) resolves to version 2 with
    exactly v2's content (order-invariant md5-sum vs an independent
    derivation), an EXACT-boundary ts (base+300) resolves to version 3
    (<=, not <), and a ts before the first commit raises loudly
    instead of inventing an empty table.

    Round 13 (VERDICT r12 wrong #1) adds the READ-COST contract: the
    r12 resolver opened every manifest from v1 on every lookup —
    O(history) per AS-OF call. :func:`txn_version_at_resolve` now
    early-stops at the first manifest stamped after the requested ts
    (monotone commit clock) and seeds from the checkpoint's recorded
    commit ts, walking only the suffix. The audit row mirrors
    `sink_txn_checkpoint`'s arithmetic: the mid-window lookup reads 3
    manifests un-checkpointed, and 1 after a checkpoint at v2 — with
    the SAME resolved version and content (the accelerator never
    changes the answer).

    The DuckDB oracle pins the resolved versions, the mid-window row
    count from the source predicate, the manifest-read arithmetic and
    every proof at 1.

    Scale shape: AS-OF resolution is a driver-side scan over
    driver-scale manifests, now O(suffix past the checkpoint) like
    snapshot resolution; the data read is the ordinary snapshot
    multi-dir scan. Idempotent: staging wiped per run."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_timetravel_ts")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    slices = {1: ev.filter(F.col("event_id") % 3 == 0),
              2: ev.filter(F.col("event_id") % 3 == 1)}
    slices[1].repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v1"))
    txn_commit(log, 1, ["v1"], [], extra={"ts": _TXN_TS_BASE + 100})
    slices[2].repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v2"))
    txn_commit(log, 2, ["v2"], [], extra={"ts": _TXN_TS_BASE + 200})
    v1_back = spark.read.schema(ev.schema).parquet(
        os.path.join(data, "v1"))
    v1_back.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v3"))
    txn_commit(log, 3, ["v3"], ["v1"], extra={"ts": _TXN_TS_BASE + 300})

    def snap_at(ts: int):
        v, reads, seed = txn_version_at_resolve(log, ts)
        return v, reads, seed, spark.read.schema(ev.schema).parquet(
            *[os.path.join(data, d) for d in txn_active_dirs(log, v)])

    # un-checkpointed: the mid-window lookup walks v1, v2 and stops AT
    # v3 (first commit stamped after the request) — 3 manifest reads
    mid_v, full_reads, _, mid = snap_at(_TXN_TS_BASE + 250)
    boundary_v, _, _, _ = snap_at(_TXN_TS_BASE + 300)
    expected_mid = ev.filter(F.col("event_id") % 3 < 2)
    got, want = _txn_canon(mid).collect()[0], \
        _txn_canon(expected_mid).collect()[0]
    try:
        txn_version_at(log, _TXN_TS_BASE + 99)
        before_raises = 0
    except ValueError:
        before_raises = 1
    # checkpoint at v2: the same lookup seeds at the checkpoint (its
    # recorded commit ts <= the request) and reads ONLY the v3 suffix
    txn_checkpoint(log, 2)
    ck_v, ck_reads, ck_seed, ck_mid = snap_at(_TXN_TS_BASE + 250)
    ck_got = _txn_canon(ck_mid).collect()[0]
    ck_same = int(ck_v == mid_v and tuple(ck_got) == tuple(got))
    return spark.createDataFrame(
        [(mid_v, boundary_v, int(got["n"]),
          int(tuple(got) == tuple(want)), before_raises,
          full_reads, ck_reads, ck_seed, ck_same)],
        "asof_mid_version int, asof_boundary_version int, "
        "n_rows_asof_mid long, asof_content_ok int, "
        "asof_before_first_raises int, n_manifests_full long, "
        "n_manifests_with_ckpt long, ckpt_seed_version int, "
        "ckpt_same_answer int")


def txn_prune_dirs(log_dir: str, version: int,
                   lo_us: int, hi_us: int) -> tuple[list[str], list[str]]:
    """STATS-BASED DATA SKIPPING on the transaction log (round 12): each
    manifest may record per-dir column stats (here: the written data's
    ts min/max, epoch-µs — computed FROM the data before commit, never
    trusted from the writer's intent); a predicate read resolves the
    snapshot and keeps only dirs whose [min, max] overlaps
    [lo_us, hi_us). A dir with NO recorded stats is always kept — the
    safe default (skipping is an optimization; absence of evidence must
    never drop data). Returns (active_dirs, scanned_dirs).

    Stats fold MIRRORS the add/remove fold (ADVICE r12): a manifest
    that removes a dir also drops its recorded stats, so a dir NAME
    reused after remove+re-add (a recurring OPTIMIZE output dir) never
    inherits the retired incarnation's ranges — stale stats applied to
    new data could wrongly prune a live dir, violating the safety rule
    above."""
    active = txn_active_dirs(log_dir, version)
    stats: dict[str, dict] = {}
    for v in range(1, version + 1):
        c = _txn_manifest(log_dir, v)
        for d in c.get("remove", []):
            stats.pop(d, None)
        stats.update(c.get("stats", {}))
    scanned = [d for d in active
               if d not in stats
               or (stats[d]["ts_min"] < hi_us
                   and stats[d]["ts_max"] >= lo_us)]
    return active, scanned


#: the stats-prune demo's predicate window (inside week 2 of the
#: 4-week commit layout): [Jan 10, Jan 12) 2024, epoch-µs.
_PRUNE_LO = 1704844800000000   # 2024-01-10 00:00:00 UTC
_PRUNE_HI = 1705017600000000   # 2024-01-12 00:00:00 UTC


@op("sink_txn_stats_prune", oracle="""
SELECT CAST(4 AS BIGINT) AS n_dirs_active,
       CAST(1 AS BIGINT) AS n_dirs_scanned,
       (SELECT count(*) FROM events
        WHERE ts >= TIMESTAMP '2024-01-10'
          AND ts < TIMESTAMP '2024-01-12') AS n_rows_pred,
       CAST(1 AS INT) AS prune_matches_full,
       CAST(1 AS INT) AS statless_dir_never_pruned
""", tier=3, section="2.38")
def sink_txn_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DIR COLUMN STATS + predicate-pruned snapshot reads — the
    data-skipping half of the lakehouse design (Delta file stats /
    Iceberg manifests' value ranges), composed with the r10-r12 log:
    each of 4 weekly commits records the WRITTEN data's ts min/max in
    its manifest (aggregated from the slice itself before commit), and
    a [Jan 10, Jan 12) predicate read prunes the snapshot to exactly
    the week-2 dir BEFORE any parquet footer is touched — metadata
    pruning above the format, which is what makes a 100 TB time-range
    query open 1/52nd of the table. The audit row pins the dir
    arithmetic (4 active, 1 scanned), the predicate row count, the
    content proof (pruned-scan + filter equals full-scan + filter,
    order-invariant md5-sum), and the SAFETY rule: a dir committed
    WITHOUT stats is always scanned (proved by re-running the prune
    against a 5th stats-less commit and checking it stays in the
    scan set).

    Scale shape: stats ride the driver-scale manifests (two numbers
    per dir per column); pruning is pure driver-side interval
    arithmetic at resolution time; the data read is the ordinary
    multi-dir scan over the SURVIVING dirs, with the residual filter
    pushed to parquet as usual. Idempotent: staging wiped per run."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_stats_prune")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    day0 = F.lit("2024-01-01").cast("timestamp")
    week = F.floor(
        (F.unix_micros("ts") - F.unix_micros(day0))
        / F.lit(7 * 86_400_000_000)).cast("int")
    tagged = ev.withColumn("_wk", F.least(week, F.lit(3)))
    for v in range(1, 5):
        sl = tagged.filter(F.col("_wk") == v - 1).drop("_wk")
        sl.repartition(1).write.mode("overwrite") \
          .parquet(os.path.join(data, f"w{v}"))
        st = sl.agg(F.min(F.unix_micros("ts")).alias("lo"),
                    F.max(F.unix_micros("ts")).alias("hi")).collect()[0]
        extra = {}
        if st["lo"] is not None:
            extra = {"stats": {f"w{v}": {"ts_min": int(st["lo"]),
                                         "ts_max": int(st["hi"])}}}
        txn_commit(log, v, [f"w{v}"], [], extra=extra)

    active, scanned = txn_prune_dirs(log, 4, _PRUNE_LO, _PRUNE_HI)
    pred = (F.col("ts") >= F.timestamp_micros(F.lit(_PRUNE_LO))) & \
           (F.col("ts") < F.timestamp_micros(F.lit(_PRUNE_HI)))
    pruned = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in scanned]).filter(pred) \
        if scanned else spark.createDataFrame([], ev.schema)
    full = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in active]).filter(pred)
    got, want = _txn_canon(pruned).collect()[0], \
        _txn_canon(full).collect()[0]

    # safety rule: a 5th commit WITHOUT stats must always be scanned,
    # even though its data (a copy of week 4) lies outside the window
    w4_back = spark.read.schema(ev.schema).parquet(
        os.path.join(data, "w4"))
    w4_back.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "nostats"))
    txn_commit(log, 5, ["nostats"], [])
    _, scanned5 = txn_prune_dirs(log, 5, _PRUNE_LO, _PRUNE_HI)
    statless_kept = int("nostats" in scanned5
                        and set(scanned) <= set(scanned5))

    return spark.createDataFrame(
        [(len(active), len(scanned), int(got["n"]),
          int(tuple(got) == tuple(want)), statless_kept)],
        "n_dirs_active long, n_dirs_scanned long, n_rows_pred long, "
        "prune_matches_full int, statless_dir_never_pruned int")


# ==========================================================================
# Round-13 wave (SURVEY.md §2.39): the lakehouse ring completes — change
# data feed between versions, OPTIMIZE ZORDER as a commit with 2-column
# data skipping, and partition values in the manifest (VERDICT r12
# missing #2/#3/#4). The exactly-once streaming writer lives in
# streaming.py (`sink_txn_stream_exactly_once`).
# ==========================================================================


def txn_changes(spark: SparkSession, data_root: str, log_dir: str,
                schema, key_col: str, v_from: int,
                v_to: int) -> DataFrame:
    """ROW-LEVEL CHANGE DATA FEED between two transaction-log versions
    (round 13, VERDICT r12 missing #2 — how downstream incremental
    consumers subscribe to a lakehouse table): diff snapshot(v_from)
    against snapshot(v_to) keyed on the table's natural key and emit
    one row per semantic change — ``insert`` (key only in v_to),
    ``delete`` (key only in v_from), ``update`` (key in both, any
    non-key column differs, null-safely). Deriving the feed FROM the
    snapshots — never from the dir lists — is what makes a pure
    REWRITE commit (OPTIMIZE, clustering) emit ZERO change rows: the
    dirs all changed, the DATA did not. A naive dir-diff reports the
    whole table as churn across every compaction; this op's test pins
    exactly that trap.

    Scale shape: two multi-dir snapshot scans + ONE full-outer
    shuffle join on the natural key, with the row comparison a
    null-safe struct equality evaluated JVM-side — the unavoidable
    diff shape when the log records only adds/removes of dirs. At
    production scale two cheap prunes apply first: versions' UNCHANGED
    dirs (present in both snapshots) can be skipped entirely —
    identical immutable bytes cannot produce a change row — so the
    join reads only the dirs the range actually touched; engines that
    must avoid even that write per-commit change files at commit time
    (the Delta CDF design), trading write amplification for read cost.
    The dir-level prune is implemented here (``changed_only``
    resolution below); the change-file variant is a write-path choice
    this demo's history doesn't need."""
    from_dirs = set(txn_active_dirs(log_dir, v_from))
    to_dirs = set(txn_active_dirs(log_dir, v_to))
    # dir-level prune: dirs present in BOTH snapshots hold identical
    # immutable bytes — rows there pair with themselves and cannot
    # produce a change row, UNLESS their key also appears in a changed
    # dir (a rewrite moved/updated it). Keys are globally unique per
    # snapshot (natural key), so a key in an unchanged dir appears in
    # both snapshots with identical content -> never a change row, and
    # the prune is exact, not heuristic.
    f_changed = sorted(from_dirs - to_dirs)
    t_changed = sorted(to_dirs - from_dirs)

    def read_dirs(dirs: list[str]) -> DataFrame:
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(data_root, d) for d in dirs])

    nonkey = [c for c in [f.name for f in schema.fields]
              if c != key_col]
    f = read_dirs(f_changed).select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in nonkey]).alias("row_f"),
        F.col("value").alias("value_before"))
    t = read_dirs(t_changed).select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in nonkey]).alias("row_t"),
        F.col("value").alias("value_after"))
    j = f.join(t, key_col, "full_outer")
    return (j.filter(F.col("row_f").isNull() | F.col("row_t").isNull()
                     | ~F.col("row_f").eqNullSafe(F.col("row_t")))
             .select(
                 F.col(key_col),
                 F.when(F.col("row_f").isNull(), F.lit("insert"))
                  .when(F.col("row_t").isNull(), F.lit("delete"))
                  .otherwise(F.lit("update")).alias("change_type"),
                 F.col("value_before"), F.col("value_after")))


@op("sink_txn_changes", oracle="""
SELECT event_id, 'delete' AS change_type,
       CAST(value AS DOUBLE) AS value_before,
       CAST(NULL AS DOUBLE) AS value_after
FROM events
WHERE event_id % 3 = 0 AND event_id % 5 = 0 AND event_id % 2 = 0
UNION ALL
SELECT event_id, 'update' AS change_type,
       CAST(value AS DOUBLE) AS value_before,
       CAST(value + 1000 AS DOUBLE) AS value_after
FROM events
WHERE event_id % 3 = 0 AND event_id % 5 = 0 AND event_id % 2 = 1
UNION ALL
SELECT event_id, 'insert' AS change_type,
       CAST(NULL AS DOUBLE) AS value_before,
       CAST(value + 1000 AS DOUBLE) AS value_after
FROM events
WHERE event_id % 3 <> 0 AND event_id % 5 = 0 AND event_id % 2 = 1
""", tier=3, section="2.39")
def sink_txn_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED read on the transaction log (VERDICT r12
    missing #2): stage the canonical merge history — v1 loads the base
    slice (event_id % 3 == 0), v2 MERGEs a change feed (even
    event_id % 5 == 0 ids delete, odd ones upsert value + 1000 —
    `sink_txn_merge`'s exact semantics), v3 OPTIMIZEs (a pure
    compaction rewrite of snapshot(2), zero semantic change) — then
    emit ``txn_changes(1, 3)``: the row-level insert/update/delete
    feed ACROSS the OPTIMIZE commit. Because the feed diffs SNAPSHOT
    CONTENT (never dir lists), the compaction contributes nothing and
    the result is exactly the merge's semantic changes; a dir-diffing
    implementation would report the whole table as churn. The
    strictly-zero feed across the pure rewrite alone
    (``txn_changes(2, 3)``) is pinned in tests/test_wave_r13b.py.

    The DuckDB oracle states the change-row set directly from the
    source predicates — every insert/update/delete row with its
    before/after values.

    Scale shape: see :func:`txn_changes` — two snapshot scans pruned
    to CHANGED dirs + one full-outer key join; manifests stay
    driver-side. Idempotent: staging wiped per run."""
    configure(spark)
    ev = load(spark, sf_dir, "events")
    data, log = _txn_stage_merge_history(
        spark, ev, _scratch("sink_txn_changes"))
    return txn_changes(spark, data, log, ev.schema, "event_id", 1, 3)


def txn_prune_dirs_full(log_dir: str, version: int, *,
                        part_eq: dict | None = None,
                        col_preds: dict | None = None
                        ) -> tuple[list[str], list[str], list[str]]:
    """GENERALIZED metadata pruning for snapshot reads (round 13,
    VERDICT r12 missing #3/#4), applied in the order every real
    lakehouse applies it — cheapest evidence first:

    1. **Partition equality** (``part_eq``: {col: value}): manifests may
       record per-dir partition VALUES (``parts`` field); a dir whose
       recorded value mismatches any predicate column is dropped
       without touching stats. Dirs with NO recorded partition value
       for a predicate column are always kept (the stats-prune safety
       rule, applied to partitions).
    2. **Column-stats intervals** (``col_preds``: {col: [lo, hi)}):
       per-dir min/max recorded in the ``colstats`` manifest field
       (multi-column — the ZORDER commit records both clustering
       dimensions); a surviving dir is scanned only if every
       predicated column's [min, max] overlaps its interval, with
       absent stats again meaning "keep".

    Both folds MIRROR add/remove (the r13 `txn_prune_dirs` rule): a
    manifest that removes a dir drops its partition values and stats,
    so re-used dir names never inherit a retired incarnation's
    metadata. Returns ``(active, after_partition_prune, scanned)``."""
    active = txn_active_dirs(log_dir, version)
    parts: dict[str, dict] = {}
    colstats: dict[str, dict] = {}
    for v in range(1, version + 1):
        c = _txn_manifest(log_dir, v)
        for d in c.get("remove", []):
            parts.pop(d, None)
            colstats.pop(d, None)
        parts.update(c.get("parts", {}))
        colstats.update(c.get("colstats", {}))

    def part_keep(d: str) -> bool:
        rec = parts.get(d)
        if rec is None or not part_eq:
            return True
        return all(col not in rec or rec[col] == val
                   for col, val in part_eq.items())

    def stats_keep(d: str) -> bool:
        st = colstats.get(d)
        if st is None or not col_preds:
            return True
        for col, (lo, hi) in col_preds.items():
            cs = st.get(col)
            if cs is not None and not (cs["min"] < hi
                                       and cs["max"] >= lo):
                return False
        return True

    after_parts = [d for d in active if part_keep(d)]
    scanned = [d for d in after_parts if stats_keep(d)]
    return active, after_parts, scanned


@op("sink_txn_optimize_zorder", oracle="""
WITH b AS (
    SELECT min(user_id) AS ulo, max(user_id) AS uhi,
           min(epoch_us(ts)) AS tlo, max(epoch_us(ts)) AS thi
    FROM events
), cut AS (
    SELECT ulo + (8 * (uhi - ulo + 1) - 1) // 16 AS ucut,
           tlo + (8 * (thi - tlo + 1) - 1) // 16 AS tcut
    FROM b
)
SELECT CAST(5 AS INT) AS version_optimize,
       CAST(4 AS BIGINT) AS n_dirs_active,
       CAST(2 AS BIGINT) AS n_scanned_user,
       (SELECT count(*) FROM events, cut WHERE user_id <= ucut)
           AS n_rows_user,
       CAST(1 AS INT) AS user_prune_matches_full,
       CAST(2 AS BIGINT) AS n_scanned_ts,
       (SELECT count(*) FROM events, cut WHERE epoch_us(ts) <= tcut)
           AS n_rows_ts,
       CAST(1 AS INT) AS ts_prune_matches_full,
       CAST(1 AS INT) AS optimize_preserves_content
""", tier=3, section="2.39")
def sink_txn_optimize_zorder(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER as a TRANSACTION-LOG COMMIT (VERDICT r12 missing
    #3 — the composition `layout_zorder_stats` proved the arithmetic
    for and `sink_txn_optimize` proved the protocol for): rewrite a
    snapshot clustered on the Morton interleave of TWO query dimensions
    (user_id, ts), land the rewrite as z-RANGE dirs whose manifest
    records per-dir min/max for BOTH columns, and prove that a
    single-column predicate on EITHER dimension prunes dirs through
    `txn_prune_dirs_full` — the one-sort-order-serves-two-columns
    property that makes ZORDER worth a rewrite at 100 TB.

    Stage: 4 commits slice events by event_id % 4, so NEITHER dimension
    clusters and no pre-OPTIMIZE predicate can skip anything. OPTIMIZE
    reads snapshot(4), bands each dimension to 4 bits over its observed
    range, interleaves them into the 8-bit Morton code
    (`layout_zorder_stats`' bit arithmetic, JVM-side), and writes ONE
    pass partitioned by the code's top two bits — four contiguous
    z-ranges, i.e. the four quadrants of the 16x16 grid, each with
    tight (half-range) bounds on BOTH columns. Commit v5 adds the four
    z-dirs, retires the four unclustered ones, and records both
    columns' per-dir min/max (computed FROM the written data). The
    audit row pins: the half-range predicate on user_id alone scans 2
    of 4 dirs, the half-range predicate on ts alone scans 2 of 4 dirs,
    both pruned scans equal the full scans exactly (order-invariant
    md5-sum), and the rewrite preserved the table.

    The DuckDB oracle derives the SAME band boundaries from min/max
    with identical integer arithmetic (band < 8 on a 16-wide grid over
    range W ⟺ x <= lo + (8W-1)//16) and states both predicate row
    counts from the source table.

    Scale shape: the rewrite is one distributed pass — band/interleave
    are integer expressions inside whole-stage codegen, the write
    range-partitions on the code's high bits (at production,
    ``repartitionByRange(zval)`` into ~1 GB files); per-dir stats are
    one 4-row aggregate; pruning stays driver-side interval arithmetic
    over driver-scale manifests. Idempotent: staging wiped per run."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_optimize_zorder")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    for v in range(1, 5):
        ev.filter(F.col("event_id") % 4 == v - 1).repartition(1) \
          .write.mode("overwrite").parquet(os.path.join(data, f"s{v}"))
        txn_commit(log, v, [f"s{v}"], [])

    # OPTIMIZE ZORDER BY (user_id, ts) against base version 4
    snap4 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 4)])
    b = snap4.agg(F.min("user_id").alias("ulo"),
                  F.max("user_id").alias("uhi"),
                  F.min(F.unix_micros("ts")).alias("tlo"),
                  F.max(F.unix_micros("ts")).alias("thi")).collect()[0]
    # degenerate-corpus guard: an EMPTY snapshot has no bounds — band
    # everything into quadrant 0 with unit-width ranges (the audit's
    # 0-row identities still hold; the oracle's constants only bind on
    # populated corpora)
    if b["ulo"] is None:
        ulo, uw, tlo, tw = 0, 1, 0, 1
    else:
        ulo, uw = int(b["ulo"]), int(b["uhi"]) - int(b["ulo"]) + 1
        tlo, tw = int(b["tlo"]), int(b["thi"]) - int(b["tlo"]) + 1
    ub = F.floor((F.col("user_id") - F.lit(ulo)) * 16 / F.lit(uw)) \
          .cast("long")
    tb = F.floor((F.unix_micros("ts") - F.lit(tlo)) * 16 / F.lit(tw)) \
          .cast("long")
    zval = F.lit(0)
    for i in range(4):
        zval = (zval
                + (F.shiftright(ub, i).bitwiseAND(1) * (1 << (2 * i + 1)))
                + (F.shiftright(tb, i).bitwiseAND(1) * (1 << (2 * i))))
    zdf = snap4.withColumn("_zq", (zval.cast("long") / 64)
                           .cast("long"))
    (zdf.repartition(1).sortWithinPartitions("_zq")
        .write.mode("overwrite").partitionBy("_zq")
        .parquet(os.path.join(data, "zopt")))
    # only quadrants that materialized (an empty snapshot writes none)
    zdirs = [f"zopt/_zq={q}" for q in range(4)
             if os.path.isdir(os.path.join(data, f"zopt/_zq={q}"))]
    st = (zdf.groupBy("_zq")
             .agg(F.min("user_id").alias("umin"),
                  F.max("user_id").alias("umax"),
                  F.min(F.unix_micros("ts")).alias("tmin"),
                  F.max(F.unix_micros("ts")).alias("tmax"))
             .collect())
    colstats = {f"zopt/_zq={int(r['_zq'])}": {
        "user_id": {"min": int(r["umin"]), "max": int(r["umax"])},
        "ts": {"min": int(r["tmin"]), "max": int(r["tmax"])}}
        for r in st}
    txn_rebase_check(log, 4, [f"s{v}" for v in range(1, 5)])
    txn_commit(log, 5, zdirs, [f"s{v}" for v in range(1, 5)],
               extra={"colstats": colstats})

    ucut = ulo + (8 * uw - 1) // 16   # max user_id with band < 8
    tcut = tlo + (8 * tw - 1) // 16   # max epoch-us with band < 8

    def pruned_vs_full(col_preds: dict, pred):
        active, _, scanned = txn_prune_dirs_full(log, 5,
                                                 col_preds=col_preds)
        full = spark.read.schema(ev.schema).parquet(
            *[os.path.join(data, d) for d in active]).filter(pred) \
            if active else spark.createDataFrame([], ev.schema)
        pr = spark.read.schema(ev.schema).parquet(
            *[os.path.join(data, d) for d in scanned]).filter(pred) \
            if scanned else spark.createDataFrame([], ev.schema)
        g, w = _txn_canon(pr).collect()[0], _txn_canon(full).collect()[0]
        return len(active), len(scanned), int(g["n"]), \
            int(tuple(g) == tuple(w))

    n_active, n_scan_u, n_rows_u, ok_u = pruned_vs_full(
        {"user_id": (ulo, ucut + 1)}, F.col("user_id") <= F.lit(ucut))
    _, n_scan_t, n_rows_t, ok_t = pruned_vs_full(
        {"ts": (tlo, tcut + 1)},
        F.unix_micros("ts") <= F.lit(tcut))

    dirs5 = txn_active_dirs(log, 5)
    snap5 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in dirs5]) \
        if dirs5 else spark.createDataFrame([], ev.schema)
    got, want = _txn_canon(snap5).collect()[0], \
        _txn_canon(ev).collect()[0]
    return spark.createDataFrame(
        [(5, n_active, n_scan_u, n_rows_u, ok_u,
          n_scan_t, n_rows_t, ok_t,
          int(tuple(got) == tuple(want)))],
        "version_optimize int, n_dirs_active long, n_scanned_user long, "
        "n_rows_user long, user_prune_matches_full int, "
        "n_scanned_ts long, n_rows_ts long, ts_prune_matches_full int, "
        "optimize_preserves_content int")


#: the partition-prune demo's predicate window (inside the first
#: half-month of the layout): [Jan 5, Jan 10) 2024, epoch-µs.
_PART_LO = 1704412800000000   # 2024-01-05 00:00:00 UTC
_PART_HI = 1704844800000000   # 2024-01-10 00:00:00 UTC
#: the half-month boundary the demo's dirs split on.
_PART_SPLIT = "2024-01-16"


@op("sink_txn_partition_prune", oracle="""
SELECT CAST(10 AS BIGINT) AS n_dirs_active,
       CAST(2 AS BIGINT) AS n_dirs_after_partition,
       CAST(1 AS BIGINT) AS n_dirs_scanned,
       (SELECT count(*) FROM events
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP '2024-01-05'
          AND ts < TIMESTAMP '2024-01-10') AS n_rows_pred,
       CAST(1 AS INT) AS prune_matches_full,
       CAST(1 AS INT) AS partless_dir_never_pruned
""", tier=3, section="2.39")
def sink_txn_partition_prune(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """PARTITION VALUES IN THE MANIFEST (VERDICT r12 missing #4 — how
    every real lakehouse table is laid out): commits record each dir's
    partition value (``parts`` manifest field) alongside its column
    stats, and a predicate read prunes in the cheap-evidence order —
    partition EQUALITY first (no interval arithmetic, drops whole
    partitions), column-stats intervals second, residual filter pushed
    to parquet last. Stage a (event_type × half-month) layout: 10
    commits, each adding one dir stamped with its event_type partition
    value and its written ts min/max. The predicate
    ``event_type = 'click' AND ts in [Jan 5, Jan 10)`` must prune
    10 -> 2 on the partition value BEFORE any stats are consulted,
    then 2 -> 1 on the ts interval — and the pruned scan must equal
    the full scan exactly (order-invariant md5-sum). The safety rule
    extends to partitions: an 11th commit WITHOUT partition metadata
    survives BOTH stages (absence of evidence never drops data),
    proved by re-running the prune against it.

    The DuckDB oracle pins the 10/2/1 dir arithmetic, the predicate
    row count from the source table, and both proofs at 1.

    Scale shape: partition values are one string per dir in the
    driver-scale manifests; equality pruning is a dict compare per
    dir — strictly cheaper than interval stats, which is why it runs
    first (at 100 TB a daily-partitioned table drops 364/365 of its
    dirs before a single min/max is read). The surviving scan is the
    ordinary multi-dir read with the residual filter pushed down.
    Idempotent: staging wiped per run."""
    import shutil as _shutil

    configure(spark)
    ev = load(spark, sf_dir, "events")
    base = _scratch("sink_txn_partition_prune")
    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    split = F.lit(_PART_SPLIT).cast("timestamp")
    types = [r["event_type"] for r in
             ev.select("event_type").distinct()
               .orderBy("event_type").collect()]
    v = 0
    for et in types:
        for half, cond in (("h1", F.col("ts") < split),
                           ("h2", F.col("ts") >= split)):
            v += 1
            d = f"{et}_{half}"
            sl = ev.filter((F.col("event_type") == et) & cond)
            sl.repartition(1).write.mode("overwrite") \
              .parquet(os.path.join(data, d))
            st = sl.agg(F.min(F.unix_micros("ts")).alias("lo"),
                        F.max(F.unix_micros("ts")).alias("hi")) \
                   .collect()[0]
            extra = {"parts": {d: {"event_type": et}}}
            if st["lo"] is not None:
                extra["colstats"] = {d: {"ts": {"min": int(st["lo"]),
                                                "max": int(st["hi"])}}}
            txn_commit(log, v, [d], [], extra=extra)

    active, after_parts, scanned = txn_prune_dirs_full(
        log, v, part_eq={"event_type": "click"},
        col_preds={"ts": (_PART_LO, _PART_HI)})
    pred = ((F.col("event_type") == "click")
            & (F.col("ts") >= F.timestamp_micros(F.lit(_PART_LO)))
            & (F.col("ts") < F.timestamp_micros(F.lit(_PART_HI))))
    full = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in active]).filter(pred) \
        if active else spark.createDataFrame([], ev.schema)
    pruned = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in scanned]).filter(pred) \
        if scanned else spark.createDataFrame([], ev.schema)
    got, want = _txn_canon(pruned).collect()[0], \
        _txn_canon(full).collect()[0]

    # safety: a dir committed with NO partition value and NO stats
    # must survive both prune stages even though its data (a copy of
    # the click h2 slice; empty-corpus guard: an empty frame) matches
    # neither predicate leg
    src_dir = os.path.join(data, "click_h2")
    back = spark.read.schema(ev.schema).parquet(src_dir) \
        if os.path.isdir(src_dir) else spark.createDataFrame([], ev.schema)
    back.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "nometa"))
    txn_commit(log, v + 1, ["nometa"], [])
    _, ap2, sc2 = txn_prune_dirs_full(
        log, v + 1, part_eq={"event_type": "click"},
        col_preds={"ts": (_PART_LO, _PART_HI)})
    partless_kept = int("nometa" in ap2 and "nometa" in sc2
                        and set(scanned) <= set(sc2))

    return spark.createDataFrame(
        [(len(active), len(after_parts), len(scanned), int(got["n"]),
          int(tuple(got) == tuple(want)), partless_kept)],
        "n_dirs_active long, n_dirs_after_partition long, "
        "n_dirs_scanned long, n_rows_pred long, "
        "prune_matches_full int, partless_dir_never_pruned int")


def _txn_stage_merge_history(spark: SparkSession, ev: DataFrame,
                             base: str) -> tuple[str, str]:
    """Shared staging for the CDF-family demos: v1 loads the base slice
    (event_id % 3 == 0), v2 MERGEs the % 5 change feed (even ids
    delete, odd ids upsert value + 1000 — `sink_txn_merge`'s
    semantics), v3 OPTIMIZEs (pure rewrite, zero semantic change).
    Returns (data_root, log_dir)."""
    import shutil as _shutil

    data, log = os.path.join(base, "data"), os.path.join(base, "_log")
    if os.path.exists(base):
        _shutil.rmtree(base)
    os.makedirs(log, exist_ok=True)

    base_df = ev.filter(F.col("event_id") % 3 == 0)
    base_df.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v1"))
    txn_commit(log, 1, ["v1"], [])

    src = ev.filter(F.col("event_id") % 5 == 0)
    upserts = src.filter(F.col("event_id") % 2 == 1) \
                 .withColumn("value", F.col("value") + F.lit(1000.0))
    snap1 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 1)])
    merged = (snap1.join(src.select("event_id"), "event_id", "left_anti")
                   .unionByName(upserts.select(*snap1.columns)))
    merged.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v2_merge"))
    txn_commit(log, 2, ["v2_merge"], ["v1"])

    snap2 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 2)])
    snap2.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "opt"))
    txn_commit(log, 3, ["opt"], ["v2_merge"])
    return data, log


@op("sink_txn_changes_feed", oracle="""
SELECT CAST(2 AS INT) AS commit_version, event_id,
       'delete' AS change_type,
       CAST(value AS DOUBLE) AS value_before,
       CAST(NULL AS DOUBLE) AS value_after
FROM events
WHERE event_id % 3 = 0 AND event_id % 5 = 0 AND event_id % 2 = 0
UNION ALL
SELECT 2, event_id, 'update', CAST(value AS DOUBLE),
       CAST(value + 1000 AS DOUBLE)
FROM events
WHERE event_id % 3 = 0 AND event_id % 5 = 0 AND event_id % 2 = 1
UNION ALL
SELECT 2, event_id, 'insert', CAST(NULL AS DOUBLE),
       CAST(value + 1000 AS DOUBLE)
FROM events
WHERE event_id % 3 <> 0 AND event_id % 5 = 0 AND event_id % 2 = 1
UNION ALL
SELECT 4, event_id, 'delete', CAST(value AS DOUBLE),
       CAST(NULL AS DOUBLE)
FROM events
WHERE event_id % 2 = 0 AND event_id % 7 = 0
  AND event_id % 3 = 0 AND event_id % 5 <> 0
UNION ALL
SELECT 4, event_id, 'update',
       CAST(CASE WHEN event_id % 5 = 0 THEN value + 1000
                 ELSE value END AS DOUBLE),
       CAST(value + 2000 AS DOUBLE)
FROM events
WHERE event_id % 2 = 1 AND event_id % 7 = 0
  AND (event_id % 3 = 0 OR event_id % 5 = 0)
UNION ALL
SELECT 4, event_id, 'insert', CAST(NULL AS DOUBLE),
       CAST(value + 2000 AS DOUBLE)
FROM events
WHERE event_id % 2 = 1 AND event_id % 7 = 0
  AND event_id % 3 <> 0 AND event_id % 5 <> 0
""", tier=3, section="2.39")
def sink_txn_changes_feed(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """PER-COMMIT ORDERED change feed (round 13 — the incremental-
    consumer form of `sink_txn_changes`): a downstream subscriber
    doesn't want one endpoint diff, it wants the changes OF EACH
    COMMIT in order, tagged with the commit version, so it can apply
    them transactionally and checkpoint its own progress mid-range.
    The feed over (v_from, v_to] is the union of per-step snapshot
    diffs ``txn_changes(v-1, v)`` with a ``commit_version`` column.

    History: the shared merge staging (v1 base, v2 merge % 5, v3 pure
    OPTIMIZE) plus a SECOND merge at v4 (% 7 feed against snapshot(3):
    even ids delete, odd ids upsert value + 2000). The feed over
    (1, 4] must carry v2's changes, NOTHING for v3 (the rewrite), and
    v4's changes — including the row updated at BOTH v2 and v4, whose
    v4 ``value_before`` must be the v2-updated value (+1000), proving
    each step diffs against its own predecessor, not the range start.

    The DuckDB oracle states the whole feed from the source
    predicates, with the double-update's CASE on value_before.

    Scale shape: per step it inherits `txn_changes`' pruning — only
    CHANGED dirs read, one key join per step; steps are independent
    jobs a consumer runs incrementally (never a k-way union at once
    in production; the demo unions three for one audit frame).
    Idempotent: staging wiped per run."""
    configure(spark)
    ev = load(spark, sf_dir, "events")
    data, log = _txn_stage_merge_history(
        spark, ev, _scratch("sink_txn_changes_feed"))

    # v4: second merge (% 7 feed) against snapshot(3)
    src = ev.filter(F.col("event_id") % 7 == 0)
    upserts = src.filter(F.col("event_id") % 2 == 1) \
                 .withColumn("value", F.col("value") + F.lit(2000.0))
    snap3 = spark.read.schema(ev.schema).parquet(
        *[os.path.join(data, d) for d in txn_active_dirs(log, 3)])
    merged = (snap3.join(src.select("event_id"), "event_id", "left_anti")
                   .unionByName(upserts.select(*snap3.columns)))
    merged.repartition(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "v4_merge"))
    txn_commit(log, 4, ["v4_merge"], ["opt"])

    feeds = [txn_changes(spark, data, log, ev.schema, "event_id",
                         v - 1, v)
             .select(F.lit(v).alias("commit_version"), "*")
             for v in range(2, 5)]
    out = feeds[0]
    for f in feeds[1:]:
        out = out.unionByName(f)
    return out


@op("sink_txn_restore", oracle="""
SELECT CAST(4 AS INT) AS version_restore,
       (SELECT count(*) FROM events WHERE event_id % 3 = 0)
           AS n_rows_restored,
       CAST(1 AS INT) AS restore_matches_v1,
       CAST(1 AS INT) AS history_intact,
       CAST(1 AS INT) AS metadata_only,
       (SELECT count(*) FROM events
        WHERE event_id % 5 = 0
          AND (event_id % 3 = 0 OR event_id % 2 = 1)) AS n_changes_undo,
       CAST(1 AS INT) AS undo_is_inverse
""", tier=3, section="2.39")
def sink_txn_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE TO VERSION — the lakehouse undo button (the public
    Delta RESTORE semantics): re-commit an OLD snapshot's dir set as
    the NEW head. Restore is pure METADATA — the old dirs still exist
    (vacuum hasn't reclaimed them), so the commit adds them back and
    retires the current head's dirs without writing a byte of data;
    history stays intact (the bad versions remain time-travelable for
    the post-mortem — restore is roll-FORWARD to old content, never
    history rewrite).

    History: the shared merge staging (v1 base, v2 merge, v3 pure
    OPTIMIZE); RESTORE TO VERSION 1 commits as v4 with
    adds = active(1), removes = active(3). The audit row pins:
    snapshot(4) content-identical to snapshot(1) (order-invariant
    md5-sum), snapshot(3) still resolves to the merged content
    (history intact), zero data dirs created by the restore
    (metadata_only — the data tree listing is unchanged), and the CDF
    across the restore is exactly the merge's change feed INVERTED
    (inserts become deletes, deletes become inserts, updates swap
    before/after) — the proof that restore semantically UNDOES the
    merge, stated through the same `txn_changes` machinery consumers
    subscribe with.

    The DuckDB oracle pins the version/row arithmetic, the undo-feed
    row count from the merge predicates, and every proof at 1.

    Scale shape: the restore commit is one atomic manifest create over
    driver-scale metadata — O(1) regardless of table size (that's the
    point: un-doing a bad 100 TB merge costs nothing); the proofs are
    ordinary snapshot scans + the pruned CDF join. Idempotent: staging
    wiped per run."""
    configure(spark)
    ev = load(spark, sf_dir, "events")
    data, log = _txn_stage_merge_history(
        spark, ev, _scratch("sink_txn_restore"))

    dirs_before = sorted(os.listdir(data))
    restore_to = txn_active_dirs(log, 1)
    removing = txn_active_dirs(log, 3)
    # same discipline as OPTIMIZE: the dirs the restore retires must
    # still be active at the head it commits against
    txn_rebase_check(log, 3, removing)
    txn_commit(log, 4, restore_to, removing)
    dirs_after = sorted(os.listdir(data))

    def snap(version: int) -> DataFrame:
        return spark.read.schema(ev.schema).parquet(
            *[os.path.join(data, d)
              for d in txn_active_dirs(log, version)])

    got4, got1 = _txn_canon(snap(4)).collect()[0], \
        _txn_canon(snap(1)).collect()[0]
    restore_ok = int(tuple(got4) == tuple(got1))
    # history intact: v3 still resolves to the merged content
    eid = F.col("event_id")
    expected3 = (ev.filter((eid % 3 == 0) & ~(eid % 5 == 0))
                   .unionByName(
                       ev.filter((eid % 5 == 0) & (eid % 2 == 1))
                         .withColumn("value",
                                     F.col("value") + F.lit(1000.0))))
    got3, want3 = _txn_canon(snap(3)).collect()[0], \
        _txn_canon(expected3).collect()[0]
    history_ok = int(tuple(got3) == tuple(want3))

    # the restore's CDF is the merge's CDF inverted
    undo = txn_changes(spark, data, log, ev.schema, "event_id", 3, 4)
    merge_feed = txn_changes(spark, data, log, ev.schema,
                             "event_id", 1, 2)
    inverted = merge_feed.select(
        "event_id",
        F.when(F.col("change_type") == "insert", F.lit("delete"))
         .when(F.col("change_type") == "delete", F.lit("insert"))
         .otherwise(F.lit("update")).alias("change_type"),
        F.col("value_after").alias("value_before"),
        F.col("value_before").alias("value_after"))
    gu, wu = _txn_canon(undo).collect()[0], \
        _txn_canon(inverted).collect()[0]
    return spark.createDataFrame(
        [(4, int(got4["n"]), restore_ok, history_ok,
          int(dirs_before == dirs_after), int(gu["n"]),
          int(tuple(gu) == tuple(wu)))],
        "version_restore int, n_rows_restored long, "
        "restore_matches_v1 int, history_intact int, metadata_only int, "
        "n_changes_undo long, undo_is_inverse int")
