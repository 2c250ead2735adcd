"""The engine's reusable DataFrame->DataFrame transform library.

The registered demo queries (``operators/*``) load the test tables and
call these; a user brings their own DataFrames and calls them directly.
Every transform is lazy, declarative, and partition-aware — no collect,
no driver-side loops, safe at any scale.

Time semantics: ``ts_col`` is a TimestampType column; gap arithmetic is
integer microseconds (``unix_micros``) end to end.

Doctests run against a live session in ``tests/test_api.py`` (the
``spark`` name in examples is injected there).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash32(c: Column) -> Column:
    """The engine's portable pseudo-random draw: first 8 hex digits of
    md5 as a long — identical in DuckDB as
    ``('0x' || substr(md5(c), 1, 8))::BIGINT``, which is what makes
    every sampler/minhash/sketch in this repo value-verifiable
    cross-engine (and stable under re-runs and appends, unlike rand()).

    >>> df = spark.createDataFrame([("a",), ("b",)], "s string")
    >>> [r.h for r in df.select(hash32("s").alias("h")).collect()]
    [214005177, 2464899070]
    """
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


#: DuckDB twin of `hash32` — the SQL every oracle must use for the
#: portable draw. ONE definition: if the draw ever changes, this string
#: and `hash32` change together and every oracle follows.
DUCK_H32 = "('0x' || substr(md5({c}), 1, 8))::BIGINT"


def fixed_point(c: Column, grid: float = 1e9) -> Column:
    """Floor a double onto an integer grid — the repo-wide determinism
    discipline: floats floored to exact longs make every downstream SUM
    / min / rank order-invariant and engine-exact (floor, never round:
    half-even vs half-up rounding flips values across engines).

    >>> df = spark.createDataFrame([(0.1234567891,)], "x double")
    >>> df.select(fixed_point("x").alias("fx")).first().fx
    123456789
    """
    return F.floor(F.col(c) * F.lit(grid) if isinstance(c, str)
                   else c * F.lit(grid)).cast("long")


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                  df_cap_floor: int = 1000,
                  df_cap_frac: float = 0.005) -> DataFrame:
    """(id, s): distinct n-gram word shingles per document, with
    high-document-frequency shingles removed — the production guard that
    keeps every shingle-join dedup sub-quadratic (a shingle shared by df
    documents fans its inverted-index join out df²-fold; boilerplate
    headers/footers carry no near-dup signal anyway). The cap is
    ``max(df_cap_floor, ceil(df_cap_frac * n_docs))``, computed
    distributively and applied via a broadcast anti-join — no collect.

    The split is hoisted through a projection before the shingle
    transform (inline ``split`` in the lambda re-splits the text per
    element access — O(len²) per document, measured 3.5 s vs 0.6 s at
    sf0.1).

    >>> df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    >>> sorted(r.s for r in word_shingles(df, "doc_id", "text").collect())
    ['a b c', 'b c d']
    """
    raw = word_shingles_raw(df, id_col, text_col, n)
    n_docs = df.agg(F.count("*").alias("__n_docs"))
    hot = hot_shingles(raw, n_docs, df_cap_floor, df_cap_frac)
    return (raw.join(F.broadcast(hot), "s", "left_anti")
               .select(id_col, "s"))


def word_shingles_raw(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3) -> DataFrame:
    """(id, s): distinct n-gram word shingles per document, UNCAPPED —
    the raw stream :func:`word_shingles` filters. Exposed separately so
    an incremental-ingest pipeline can shingle arriving batches and
    anti-join them against a hot-shingle set computed ONCE from the full
    corpus (the artifact shipped with the corpus index) instead of
    re-deriving caps per batch — re-derived per-batch caps silently
    diverge from the corpus-wide cap the moment any shingle crosses it.

    >>> df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    >>> sorted(r.s for r in word_shingles_raw(df, "doc_id", "text").collect())
    ['a b c', 'b c d']
    """
    toks = df.select(F.col(id_col).alias("__id"),
                     F.split(text_col, " ").alias("tk"))
    sh = F.expr(
        "transform(sequence(0, size(tk) - {n}), i -> concat_ws(' ', {parts}))"
        .format(n=n, parts=", ".join(f"tk[i+{j}]" for j in range(n))))
    return (toks.select("__id", F.explode(sh).alias("s")).distinct()
                .select(F.col("__id").alias(id_col), "s"))


def hot_shingles(raw: DataFrame, n_docs: DataFrame,
                 df_cap_floor: int = 1000,
                 df_cap_frac: float = 0.005) -> DataFrame:
    """(s): the high-document-frequency shingle kill set — shingles
    present in more than ``max(df_cap_floor, ceil(df_cap_frac * n_docs))``
    documents of ``raw`` (a :func:`word_shingles_raw` frame). ``n_docs``
    is a 1-row ``(__n_docs)`` aggregate of the SOURCE document frame (not
    of ``raw`` — empty documents still count toward the corpus size).
    Tiny by construction (each hot shingle needs cap·n_docs rows), so
    callers broadcast it into a LEFT ANTI join. No collect anywhere."""
    cap = F.greatest(
        F.lit(df_cap_floor).cast("long"),
        F.ceil(F.lit(df_cap_frac) * F.col("__n_docs")).cast("long"))
    return (raw.groupBy("s").agg(F.count("*").alias("__df"))
               .crossJoin(F.broadcast(n_docs))
               .filter(F.col("__df") > cap)
               .select("s"))


def strip_boilerplate_lines(df: DataFrame, id_col: str, text_col: str,
                            sep: str = ". ", df_cap_floor: int = 2,
                            df_cap_frac: float = 0.005) -> DataFrame:
    """(id, n_lines, n_removed, cleaned): corpus-level boilerplate
    removal, the C4-style line filter — a line (``sep``-split segment,
    trimmed) present in more than ``max(df_cap_floor,
    ceil(df_cap_frac * n_docs))`` DISTINCT documents is template
    boilerplate (cookie banners, licence footers) and is dropped from
    every document; survivors reassemble in original order. Same
    distributive-cap + broadcast-anti-join shape as
    :func:`word_shingles` — the hot-line set is tiny by construction
    (each hot line needs cap·n_docs occurrences), no collect anywhere.

    >>> df = spark.createDataFrame(
    ...     [(i, f"unique {i}. SHARED FOOTER") for i in range(4)],
    ...     "doc_id long, text string")
    >>> out = strip_boilerplate_lines(df, "doc_id", "text").orderBy("doc_id")
    >>> r = out.first()
    >>> (r.n_lines, r.n_removed, r.cleaned)
    (2, 1, 'unique 0')
    """
    import re as _re

    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(text_col, _re.escape(sep)))
         .alias("__pos", "__line"))
    n_docs = df.agg(F.count("*").alias("__n_docs"))
    cap = F.greatest(
        F.lit(df_cap_floor).cast("long"),
        F.ceil(F.lit(df_cap_frac) * F.col("__n_docs")).cast("long"))
    hot = (lines.filter(F.length(F.trim("__line")) > 0)
                .select(F.trim("__line").alias("__l"), "__id").distinct()
                .groupBy("__l").agg(F.count("*").alias("__df"))
                .crossJoin(F.broadcast(n_docs))
                .filter(F.col("__df") > cap)
                .select("__l"))
    kept = lines.join(F.broadcast(hot),
                      F.trim(F.col("__line")) == F.col("__l"), "left_anti")
    agg = kept.groupBy("__id").agg(
        F.count("*").alias("__n_kept"),
        F.concat_ws(sep, F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
            lambda s: s["__line"])).alias("cleaned"))
    tot = lines.groupBy("__id").agg(F.count("*").alias("n_lines"))
    return (tot.join(agg, "__id", "left")
               .select(F.col("__id").alias(id_col), "n_lines",
                       (F.col("n_lines")
                        - F.coalesce("__n_kept", F.lit(0))).cast("long")
                       .alias("n_removed"),
                       F.coalesce("cleaned", F.lit("")).alias("cleaned")))


def minhash_band_signatures(tok: DataFrame, id_col: str, token_col: str,
                            k: int = 16, bands: int = 4) -> DataFrame:
    """(id, band, sig): LSH band signatures — k portable minhashes per
    document over a (id, token) stream, folded into ``bands`` bands of
    k/bands rows (ordered concat). Two documents share a band signature
    iff all of that band's minhashes agree, so an equi-join on
    (band, sig) yields the near-dup candidate pairs without any
    all-pairs comparison — the (k, bands) pair is the precision/recall
    dial (4x4 catches Jaccard >= ~0.7).

    >>> df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "x"), (2, "y")],
    ...                            "doc_id long, token string")
    >>> out = minhash_band_signatures(df, "doc_id", "token")
    >>> sigs = {(r.doc_id, r.band): r.sig for r in out.collect()}
    >>> len(sigs), sigs[(1, 0)] == sigs[(2, 0)]  # identical docs collide
    (8, True)
    """
    rows_per_band = k // bands
    mh = (tok.select(F.col(id_col).alias("__id"),
                     F.col(token_col).alias("__t"))
             .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
             .groupBy("__id", "i")
             .agg(F.min(hash32(F.concat_ws(":", F.col("i"), F.col("__t"))))
                   .alias("mh")))
    return (mh.withColumn("band", F.expr(f"i div {rows_per_band}"))
              .groupBy("__id", "band")
              .agg(F.array_join(
                  F.transform(
                      F.array_sort(F.collect_list(F.struct("i", "mh"))),
                      lambda s: s["mh"].cast("string")),
                  ",").alias("sig"))
              .select(F.col("__id").alias(id_col), "band", "sig"))


def sessionize(df: DataFrame, key: str, ts_col: str, gap_minutes: float,
               tiebreak: str | None = None) -> DataFrame:
    """Assign ``session_seq`` (1-based per key) splitting at gaps strictly
    greater than ``gap_minutes``. One shuffle on ``key``; downstream
    per-session aggregation reuses the partitioning.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    t = F.unix_micros(F.col(ts_col))
    gap = t - F.lag(t).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    return df.withColumn("session_seq", F.sum(new_session).over(wc).cast("long"))


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str, right_ts: str,
                       value_cols: Sequence[str]) -> DataFrame:
    """As-of (backward) join: attach to each left row the ``value_cols``
    of the latest right row with ``right_ts <= left_ts`` for the same key.

    Algorithm (SURVEY.md §4.3): tag sides, unionByName, carry right
    values forward with last(ignorenulls) over (key ORDER BY t, side) —
    ONE shuffle on the key, no range explosion, skew-safe. The right side
    must be unique per (key, right_ts); pre-aggregate it if not.

    Left columns are preserved; ``right_ts`` is surfaced alongside the
    value columns. At equal timestamps the right row wins (as-of is <=).
    """
    carried = [right_ts, *value_cols]
    l_tagged = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in carried],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )
    w = Window.partitionBy("__k").orderBy("__t", "__is_left") \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = l_tagged.unionByName(r_tagged).select(
        "__is_left", *left.columns,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
          for c in carried],
    )
    return merged.filter("__is_left = 1").select(
        *left.columns,
        *[F.col(f"__r_{c}").alias(c) for c in carried],
    )


def asof_join_forward(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      value_cols: Sequence[str]) -> DataFrame:
    """As-of (forward) join: attach to each left row the ``value_cols`` of
    the EARLIEST right row with ``right_ts >= left_ts`` for the same key.

    Mirror of :func:`asof_join_backward`: tag sides, unionByName, then
    carry right values BACKWARD with first(ignorenulls) over the
    current-row..unbounded-following frame. At equal timestamps the right
    row wins (forward as-of is >=), so left rows sort BEFORE right rows
    at the same ``__t`` — the frame starting at a left row then includes
    the tied right row. One shuffle on the key, no range explosion.
    """
    carried = [right_ts, *value_cols]
    l_tagged = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in carried],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )
    w = Window.partitionBy("__k").orderBy("__t", F.col("__is_left").desc()) \
              .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged = l_tagged.unionByName(r_tagged).select(
        "__is_left", *left.columns,
        *[F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
          for c in carried],
    )
    return merged.filter("__is_left = 1").select(
        *left.columns,
        *[F.col(f"__r_{c}").alias(c) for c in carried],
    )


def topk_per_group(df: DataFrame, group_cols: Sequence[str],
                   order_by: Sequence[Column], k: int,
                   rank_col: str = "rnk") -> DataFrame:
    """Deterministic top-k rows per group (``order_by`` must totally
    order within groups — include a unique tiebreak)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)) \
             .filter(F.col(rank_col) <= k)


def dedup_latest(df: DataFrame, keys: Sequence[str | Column],
                 order_by: Sequence[Column]) -> DataFrame:
    """Keep exactly one row per key set: the first under ``order_by``
    (pass descending columns for 'latest')."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)) \
             .filter("__rn = 1").drop("__rn")


def forward_fill(df: DataFrame, key: str, ts_col: str, value_col: str,
                 filled_col: str | None = None,
                 tiebreak: str | None = None) -> DataFrame:
    """Carry the last non-null ``value_col`` forward per key in time
    order (sensor-dropout repair)."""
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order) \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(filled_col or f"{value_col}_filled",
                         F.last(value_col, ignorenulls=True).over(w))


def resample(df: DataFrame, key: str, ts_col: str, every: str,
             aggs: Sequence[Column]) -> DataFrame:
    """Downsample to ``every`` buckets ('hour', 'day', ...; date_trunc
    units) per key with the given aggregate columns."""
    return df.groupBy(key, F.date_trunc(every, ts_col).alias("bucket")) \
             .agg(*aggs)


def bucketed_global_rank(df: DataFrame, bucket: Column,
                         order_by: Sequence[Column],
                         rank_name: str = "global_rank",
                         total_name: str | None = None,
                         group_cols: Sequence[str] = (),
                         broadcast_offsets: bool = True) -> DataFrame:
    """Exact global ``row_number`` over ``order_by`` WITHOUT a
    single-partition sort — the two-phase rank (the quantile/rank twin of
    the bucketed-sessionize discipline):

    1. one hash aggregate counts rows per ``bucket`` (map-side combinable);
    2. a cumulative sum over the TINY bucket-count table turns counts into
       per-bucket start offsets (the only ordered window runs over bucket
       cardinality, never fact rows);
    3. each row's global rank = its row_number within its bucket (a
       bounded partition) + the bucket's offset, attached by a broadcast
       join.

    ``bucket`` MUST be a monotone non-decreasing function of the leading
    ``order_by`` key(s) so bucket-major + within-bucket order equals the
    global order. Bucket granularity is the scale dial: the largest
    partition Spark ever sorts is one bucket, so pick hour vs day /
    1.0 vs 0.1 value steps to bound it at your corpus size. A HOT single
    value (one value = 50% of the corpus) defeats any value-derived
    bucket; the treatment is a composite ``struct(value, id div B)``
    bucket — lexicographically monotone under the (value, id) order —
    which splits the hot value across id-bands
    (tests/test_api.py::test_bucketed_rank_hot_value_corpus proves
    value-identity on exactly that corpus).

    ``total_name`` additionally attaches the global row count (taken from
    the bucket-count table, NOT from a window over the facts).

    ``group_cols`` turns the rank into a per-group rank (the
    ``PARTITION BY g ORDER BY ...`` shape): counts, offsets and totals
    all scope to the group, so even a constant-corpus-fraction partition
    key (an event_type-style channel) never sorts more than one
    (group, bucket) cell at a time — the fix for the low-cardinality
    window-key hazard class in SCALE.md.

    BUCKET-CARDINALITY CONTRACT (ADVICE r5): the offsets table holds one
    row per distinct (group, bucket) pair and is broadcast by default —
    it must stay broadcast-sized. Time- or value-granularity buckets
    hold that by construction; the hot-value composite bucket
    ``struct(value, id div B)`` does NOT in the worst case (a continuous
    value column drives distinct (value, id-band) pairs toward the row
    count). When the bucket function cannot guarantee a bounded bucket
    count, pass ``broadcast_offsets=False``: the offsets attach by a
    plain shuffle equi-join on the bucket key (the fact side shuffles
    once on a key it is already partitioned by for the within-bucket
    window — no extra exchange in practice), and the offsets window
    still runs over bucket cardinality, never fact rows.

    Unbounded-id example (VERDICT r10): ``dq_sequence_islands`` buckets
    a unique-id stream — a FIXED ``id div 1024`` bucket leaves the
    offsets table Θ(n/1024) rows (linear, merely rescaled), so it
    derives the width from the observed id range
    (``max(1024, range div 65536)``, one bounded min/max probe) and
    passes ``broadcast_offsets=False``: offsets stay ≤ ~65536 rows for
    any id domain while unique ids bound the within-bucket sort at
    ``width`` rows. Any bucket function whose cardinality tracks the
    row count must follow that pattern.
    """
    g = list(group_cols)
    b = "__bgr_b"
    tagged = df.withColumn(b, bucket)
    counts = tagged.groupBy(*g, b).agg(F.count("*").alias("__n"))
    # bucket-cardinality table, not fact rows:
    wo = Window.partitionBy(*g).orderBy(b)
    offs = [(F.sum("__n").over(wo) - F.col("__n")).alias("__off")]
    if total_name is not None:
        offs.append(F.sum("__n").over(Window.partitionBy(*g))
                     .alias(total_name))
    offsets = counts.select(*g, b, *offs)
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    w = Window.partitionBy(*g, b).orderBy(*order_by)
    return (tagged.join(offsets, [*g, b])
                  .withColumn(rank_name, (F.row_number().over(w)
                                          + F.col("__off")).cast("long"))
                  .drop(b, "__off"))


def bucketed_ntile(df: DataFrame, bucket: Column,
                   order_by: Sequence[Column], n_tiles: int,
                   tile_name: str = "tile",
                   group_cols: Sequence[str] = ()) -> DataFrame:
    """Exact SQL ``ntile(n_tiles)`` over a global (or, with
    ``group_cols``, per-group) order, built on
    :func:`bucketed_global_rank` (so: no unpartitioned window over fact
    rows, and no constant-corpus-fraction partitions either). Tile
    arithmetic replicates ntile exactly: with n rows and k tiles,
    ``q = n div k``, ``r = n mod k``; the first r tiles take q+1 rows
    each, the rest q — so the result is value-identical to the engine's
    ntile at any parallelism."""
    ranked = bucketed_global_rank(df, bucket, order_by,
                                  rank_name="__grank", total_name="__tot",
                                  group_cols=group_cols)
    q = F.floor(F.col("__tot") / n_tiles).cast("long")
    r = F.col("__tot") % n_tiles
    big = r * (q + 1)  # rows living in the first r (fat) tiles
    tile = F.when(F.col("__grank") <= big,
                  F.ceil(F.col("__grank") / (q + 1))) \
            .otherwise(r + F.ceil((F.col("__grank") - big)
                                  / F.greatest(q, F.lit(1))))
    return ranked.withColumn(tile_name, tile.cast("int")) \
                 .drop("__grank", "__tot")


def bucketed_order_statistic(df: DataFrame, bucket: Column,
                             order_by: Sequence[Column],
                             frac: float) -> DataFrame:
    """The single row at exact global rank ``floor(frac * n)`` under
    ``order_by`` (the leakage-safe split-cutoff shape), without a global
    sort: per-bucket counts -> cumulative offsets locate the ONE bucket
    containing the target rank; a broadcast join PRUNES the fact side to
    that bucket; one bounded within-bucket sort picks the row. Unlike an
    approx_percentile cutoff this selects a real data value exactly, so
    it is value-identical to the ``row_number() = floor(frac*n)``
    formulation cross-engine."""
    b = "__bos_b"
    tagged = df.withColumn(b, bucket)
    counts = tagged.groupBy(b).agg(F.count("*").alias("__n"))
    wo = Window.orderBy(b)  # bucket-cardinality table, not fact rows
    target = (counts
              .withColumn("__cum", F.sum("__n").over(wo))
              .withColumn("__k", F.floor(
                  frac * F.sum("__n").over(Window.partitionBy()))
                  .cast("long"))
              .filter((F.col("__cum") - F.col("__n") < F.col("__k"))
                      & (F.col("__k") <= F.col("__cum")))
              .select(b, (F.col("__k") - F.col("__cum")
                          + F.col("__n")).alias("__lk")))
    w = Window.partitionBy(b).orderBy(*order_by)
    return (tagged.join(F.broadcast(target), b)
                  .withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == F.col("__lk"))
                  .drop(b, "__lk", "__rn"))


def bucketed_running_sum(df: DataFrame, bucket: Column,
                         order_by: Sequence[Column], value: Column,
                         out_name: str = "running_sum",
                         group_cols: Sequence[str] = ()) -> DataFrame:
    """Exact global (or, with ``group_cols``, per-group) running sum of
    ``value`` over ``order_by`` without a single-partition window:
    per-bucket sums -> cumulative offsets over the tiny bucket table ->
    within-bucket running sum (bounded partition) + offset. Same
    monotone-bucket contract as :func:`bucketed_global_rank`."""
    g = list(group_cols)
    b = "__brs_b"
    tagged = df.withColumn(b, bucket).withColumn("__v", value)
    sums = tagged.groupBy(*g, b).agg(F.sum("__v").alias("__s"))
    # bucket-cardinality table, not fact rows:
    wo = Window.partitionBy(*g).orderBy(b)
    offsets = sums.select(
        *g, b, (F.sum("__s").over(wo) - F.col("__s")).alias("__off"))
    w = Window.partitionBy(*g, b).orderBy(*order_by) \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (tagged.join(F.broadcast(offsets), [*g, b])
                  .withColumn(out_name,
                              F.sum("__v").over(w) + F.col("__off"))
                  .drop(b, "__off", "__v"))


def zscore_flags(df: DataFrame, group_col: str, value_col: str,
                 n_sigma: float = 3.0) -> DataFrame:
    """Per-group z-scores + |z| > n_sigma anomaly flags. The per-group
    stats aggregate is broadcast back onto the fact side — the big table
    never shuffles."""
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sigma"),
    )
    v = F.col(value_col)
    return (df.join(F.broadcast(stats), group_col)
              # try_divide: a constant-valued group has sigma 0; NULL z
              # beats an ANSI DIVIDE_BY_ZERO crash on degenerate slices
              .withColumn("zscore",
                          F.try_divide(v - F.col("__mu"), F.col("__sigma")))
              .withColumn("is_anomaly",
                          F.abs(v - F.col("__mu")) > n_sigma * F.col("__sigma"))
              .drop("__mu", "__sigma"))
