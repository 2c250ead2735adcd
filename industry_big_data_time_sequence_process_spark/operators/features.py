"""Feature-engineering operators — the step between the curated corpus and
the model: turning raw events/documents into bounded, reproducible feature
columns (SURVEY.md §2.11 adjunct; LLM/ML-pipeline surface like sampling.py).

Design notes (100 TB posture):

- Encodings are computed from ONE aggregation pass over the fact table and
  joined back (or returned) as a tiny broadcast dimension — never a
  per-row lookup loop.
- The hashing trick bounds feature dimensionality by construction: the
  width is a constant of the pipeline, not a function of the vocabulary,
  so the feature matrix never grows a shuffle as the corpus grows.
- Same portable ``hash32`` as text.py/sampling.py (md5-derived) so every
  hashed feature is value-verifiable cross-engine.
- Double sums over ``value`` go through decimal(18,2) first
  (order-insensitive exact sums — the repo-wide determinism discipline).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..registry import op
from ..sources.io import load

#: DuckDB: first 8 hex digits of md5 as int64 (portable hash32).
_DUCK_H32 = "('0x' || substr(md5({c}), 1, 8))::BIGINT"

#: Smoothing pseudo-count for target encoding (the prior's weight).
_TE_PRIOR_M = 20


def _h32(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


@op("feat_target_encode", oracle=f"""
WITH per AS (
    SELECT event_type,
           count(*) AS n,
           SUM(CAST(value AS DECIMAL(18,2))) AS s
    FROM events GROUP BY event_type
), g AS (
    SELECT CAST(SUM(s) AS DOUBLE) / SUM(n) AS gmean FROM per
)
SELECT event_type, n,
       round(CAST(s AS DOUBLE) / n, 6) AS raw_mean,
       round((CAST(s AS DOUBLE) + {_TE_PRIOR_M} * g.gmean)
             / (n + {_TE_PRIOR_M}), 6) AS encoded,
       round(g.gmean, 6) AS global_mean
FROM per CROSS JOIN g
""", tier=3, section="2.11")
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical key — the
    standard leakage-prone-if-done-naively feature, done as one pass:
    ``enc(k) = (sum_k + m·global_mean) / (n_k + m)`` with pseudo-count
    m=20, shrinking rare categories toward the global mean
    (empirical-Bayes shrinkage).

    Scale: EXACTLY ONE aggregate pass over the fact table (map-side
    partials, plan-pinned in tests/test_plans.py); the global mean is
    then an unpartitioned window over the category-sized encoding table
    — deriving it from a second ``per.agg(...)`` would re-compute the
    whole lineage and scan the facts twice (the first version did; the
    plan test caught it). The encoding table is what a training job
    broadcast-joins back onto the facts. Sums are decimal-exact
    (order-insensitive), so the encoded values are reproducible at any
    parallelism; the only double ops are one add and one divide over
    exact operands, identical in both engines.
    """
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
    )
    w = Window.partitionBy()
    return (
        per.withColumn("gmean", F.sum("s").over(w).cast("double")
                                / F.sum("n").over(w))
           .select(
               "event_type", "n",
               F.round(F.col("s").cast("double") / F.col("n"), 6)
                .alias("raw_mean"),
               F.round((F.col("s").cast("double")
                        + _TE_PRIOR_M * F.col("gmean"))
                       / (F.col("n") + _TE_PRIOR_M), 6).alias("encoded"),
               F.round("gmean", 6).alias("global_mean"),
           )
    )


@op("feat_hashing_vectorize", oracle=f"""
SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
FROM (
    SELECT doc_id,
           {_DUCK_H32.format(c="token")} % 64 AS bucket
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < 40
    )
)
GROUP BY doc_id, bucket
""", tier=3, section="2.11")
def feat_hashing_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: token-count vectors in a FIXED 64-dim hashed
    space (``bucket = hash32(token) % 64``), sparse (doc, bucket, count)
    layout. Demonstrated on doc_id < 40 to bound the checked output; the
    plan is corpus-size-independent.

    Why this beats a vocabulary dictionary at 100 TB: no vocab build, no
    vocab broadcast, no OOV handling — the feature width is a pipeline
    constant, new tokens land in existing buckets, and the whole thing is
    tokenize -> narrow hash -> ONE shuffle on (doc, bucket) with map-side
    partial counts. The md5-derived hash keeps the vectors identical
    across engines and runs (a requirement for cached-feature reuse).
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token"))
    return (
        toks.select("doc_id", (_h32(F.col("token")) % 64).alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").cast("long").alias("cnt"))
    )
