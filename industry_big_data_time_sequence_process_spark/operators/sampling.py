"""Deterministic sampling / split operators — the training-data-pipeline
staples (SURVEY.md §2.11 adjunct; driver-mandated LLM-pipeline surface).

Random sampling is useless at 100 TB if it isn't REPRODUCIBLE: re-running
the pipeline must keep every document in the same split, and adding new
documents must not reshuffle old ones. So nothing here uses rand() — the
randomness is ``hash32(id) = int(md5(id)[:8], 16)``, the same portable
md5-derived hash the dedup/similarity operators use (text.py module
docstring). Fully deterministic, stable under appends, identical across
engines — which is what makes these ops value-hash verifiable at all.

Scale posture: hash-bucket sampling is a pure narrow filter (pushed to the
scan, no shuffle); stratified sampling shuffles once on the stratum key.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..registry import op
from ..sources.io import load

#: DuckDB: first 8 hex digits of md5 as int64 (portable hash32).
_DUCK_H32 = "('0x' || substr(md5({c}), 1, 8))::BIGINT"


def _h32(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


@op("sample_hash_bucket", oracle=f"""
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id, lang,
           {_DUCK_H32.format(c="CAST(doc_id AS VARCHAR)")} % 100 AS bucket
    FROM documents
)
WHERE bucket < 10 OR bucket >= 90
""", tier=1, section="2.11")
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket sampling + train/val/test split labels.

    ``bucket = hash32(doc_id) % 100`` gives each document a stable
    0-99 bucket; a "10% sample" is ``bucket < 10`` — reproducible across
    runs and engines, stable under appends (new docs never move old ones
    between splits). Returned here: the 10% dev sample plus the test
    split, with the split label each row would get.

    A pure narrow filter over the scan — no shuffle at any scale.
    """
    d = load(spark, sf_dir, "documents")
    bucket = _h32(F.col("doc_id").cast("string")) % 100
    split = (F.when(F.col("bucket") < 80, "train")
              .when(F.col("bucket") < 90, "val")
              .otherwise("test"))
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
         .filter((F.col("bucket") < 10) | (F.col("bucket") >= 90))
         .withColumn("split", split)
    )


@op("sample_stratified", oracle=f"""
WITH ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n_lang
    FROM documents
)
SELECT doc_id, lang, rn, n_lang
FROM ranked
WHERE rn <= CAST(ceil(0.2 * n_lang) AS BIGINT)
""", tier=2, section="2.11")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample: EXACTLY ceil(0.2·n) docs per language.

    Rows are ranked within each stratum by md5(doc_id) — a deterministic
    pseudo-random order — so the sample is unbiased w.r.t. any real
    attribute, yet reproducible. Unlike ``df.sampleBy`` (Bernoulli,
    approximate counts, seed-dependent across partitionings) this
    guarantees the exact per-stratum quota. One shuffle on the stratum.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    wc = Window.partitionBy("lang")
    return (
        d.select(
            "doc_id", "lang",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n_lang"),
        )
        .filter(F.col("rn") <= F.ceil(0.2 * F.col("n_lang")).cast("long"))
    )
