"""The public api.py surface: doctests run against a live session
(VERDICT r4 #7 — the primitives are the engine's public face, so their
documented examples must execute), plus equivalence pins proving the
operator modules' thin wrappers delegate without behavior change.
"""
import doctest

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark import api


def test_api_doctests(spark):
    results = doctest.testmod(
        api, extraglobs={"spark": spark, "F": F},
        optionflags=doctest.NORMALIZE_WHITESPACE, verbose=False)
    assert results.attempted >= 8, "api.py lost its documented examples"
    assert results.failed == 0, f"{results.failed} api.py doctests failed"


def test_hash32_matches_duckdb(spark):
    import duckdb
    vals = ["", "a", "hello world", "42"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in
           df.select("s", api.hash32("s").alias("h")).collect()}
    for v in vals:
        want = duckdb.sql(
            f"SELECT ('0x' || substr(md5('{v}'), 1, 8))::BIGINT"
        ).fetchone()[0]
        assert got[v] == want, (v, got[v], want)


def test_bucketed_rank_equals_unpartitioned_rank(spark):
    from pyspark.sql import Window
    df = spark.range(500).select(
        F.col("id"), (api.hash32(F.col("id").cast("string")) % 37)
        .alias("v"))
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy("v", "id")))
    got = api.bucketed_global_rank(
        df, (F.col("v") / 10).cast("long"), [F.col("v"), F.col("id")],
        rank_name="rk")
    assert sorted(map(tuple, want.collect())) == \
        sorted(map(tuple, got.collect()))


def test_bucketed_ntile_equals_sql_ntile(spark):
    from pyspark.sql import Window
    for n in (500, 7, 10, 503):
        df = spark.range(n).select(
            F.col("id"), (api.hash32(F.col("id").cast("string")) % 37)
            .alias("v"))
        want = df.withColumn(
            "t", F.ntile(7).over(Window.orderBy("v", "id")))
        got = api.bucketed_ntile(
            df, (F.col("v") / 10).cast("long"), [F.col("v"), F.col("id")],
            7, tile_name="t")
        assert sorted(map(tuple, want.collect())) == \
            sorted(map(tuple, got.collect())), f"n={n}"


def test_grouped_bucketed_ntile_equals_partitioned_ntile(spark):
    from pyspark.sql import Window
    df = spark.range(400).select(
        F.col("id"), (F.col("id") % 3).alias("g"),
        (api.hash32(F.col("id").cast("string")) % 37).alias("v"))
    want = df.withColumn(
        "t", F.ntile(4).over(Window.partitionBy("g").orderBy("v", "id")))
    got = api.bucketed_ntile(
        df, (F.col("v") / 10).cast("long"), [F.col("v"), F.col("id")], 4,
        tile_name="t", group_cols=["g"]).select("id", "g", "v", "t")
    assert sorted(map(tuple, want.collect())) == \
        sorted(map(tuple, got.collect()))


def test_bucketed_order_statistic_picks_exact_row(spark):
    from pyspark.sql import Window
    df = spark.range(1000).select(
        F.col("id"), (api.hash32(F.col("id").cast("string")) % 997)
        .alias("v"))
    want = (df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id")))
        .filter(F.col("rn") == 800).select("id", "v").first())
    got = api.bucketed_order_statistic(
        df, (F.col("v") / 100).cast("long"),
        [F.col("v"), F.col("id")], 0.8).select("id", "v").collect()
    assert len(got) == 1 and tuple(got[0]) == tuple(want)


def test_bucketed_rank_hot_value_corpus(spark):
    """The bucket expression is the skew dial: a corpus where 50% of
    rows share ONE value would collapse a floor(value) bucket into a
    single partition (the original problem). The documented treatment —
    bucket on (exact value, id-band), lexicographically monotone under
    the (value, id) order — splits the hot value across bands and stays
    value-identical to the unpartitioned rank."""
    from pyspark.sql import Window
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 42.0)   # 50% hot value
         .otherwise((api.hash32(F.col("id").cast("string")) % 97)
                    .cast("double")).alias("v"))
    bucket = F.struct(F.col("v").alias("bv"),
                      (F.col("id") / 100).cast("long").alias("band"))
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy("v", "id")))
    got = api.bucketed_global_rank(df, bucket, [F.col("v"), F.col("id")],
                                   rank_name="rk").select("id", "v", "rk")
    assert sorted(map(tuple, want.collect())) == \
        sorted(map(tuple, got.collect()))
    # and the ntile arithmetic on top of it
    want_t = df.withColumn(
        "t", F.ntile(10).over(Window.orderBy("v", "id")))
    got_t = api.bucketed_ntile(df, bucket, [F.col("v"), F.col("id")], 10,
                               tile_name="t").select("id", "v", "t")
    assert sorted(map(tuple, want_t.collect())) == \
        sorted(map(tuple, got_t.collect()))


def test_strip_boilerplate_adversarial_footer(spark):
    """The REMOVING path of text_remove_boilerplate (inert on the
    natural corpus — every sentence there is doc-unique): a footer
    shared by 3 of 5 docs crosses the max(2, ...) cap and is stripped
    everywhere; a line shared by only 2 docs stays; a doc that was all
    boilerplate cleans to the empty string."""
    rows = [
        (0, "alpha zero. THE FOOTER. tail zero"),
        (1, "alpha one. THE FOOTER"),
        (2, "THE FOOTER"),
        (3, "twice shared. body three"),
        (4, "twice shared. body four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.asDict() for r in
           api.strip_boilerplate_lines(df, "doc_id", "text").collect()}
    assert out[0]["cleaned"] == "alpha zero. tail zero"
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (3, 1)
    assert out[1]["cleaned"] == "alpha one"
    assert out[2] == {"doc_id": 2, "n_lines": 1, "n_removed": 1,
                      "cleaned": ""}
    assert out[3]["cleaned"] == "twice shared. body three"  # df=2 <= cap
    assert out[4]["n_removed"] == 0


def test_bucketed_running_sum_equals_unpartitioned(spark):
    from pyspark.sql import Window
    df = spark.range(300).select(
        F.col("id"), (api.hash32(F.col("id").cast("string")) % 37)
        .alias("v"))
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cs", F.sum("v").over(w))
    got = api.bucketed_running_sum(
        df, (F.col("id") / 50).cast("long"), [F.col("id")], F.col("v"),
        out_name="cs")
    assert sorted(map(tuple, want.collect())) == \
        sorted(map(tuple, got.collect()))
