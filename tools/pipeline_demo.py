"""End-to-end training-data pipeline demo: the composition story.

Every stage below is the same machinery the registry exposes as graded
operators — this script exists to show they compose into the pipeline a
100 TB corpus actually runs: ingest -> boilerplate clean -> exact dedup -> near-dedup (MinHash
LSH + connected components, keep one representative per cluster) ->
heuristic quality filter -> TRAINED quality gate (round 9: the NB
scorer, distant-supervised on the heuristic labels over this corpus's
own md5 slice) -> deterministic train/val split -> partitioned parquet.

Scale posture per stage (see SCALE.md for the measured evidence):
exact dedup is a hash-group; near-dedup is the banded LSH join (never
all-pairs) with the high-df shingle cap; the quality filter is pure
narrow row expressions; the split is a hash filter with zero shuffle
and is stable under appends; the sink is partitioned parquet. Round 5
prepends corpus-level boilerplate-line removal (broadcast anti-join of
the tiny hot-line set) so dedup hashes cleaned content.

Usage:  python tools/pipeline_demo.py [sf_dir] [out_dir]
        (defaults: /root/testdata/sf0.01, .scratch/pipeline_out)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from industry_big_data_time_sequence_process_spark.api import (  # noqa: E402
    strip_boilerplate_lines,
)
from industry_big_data_time_sequence_process_spark.operators.text import (  # noqa: E402
    _h32, _minhash_bands, _quality_model_frame, _shingles,
)
from industry_big_data_time_sequence_process_spark.session import get_session  # noqa: E402
from industry_big_data_time_sequence_process_spark.sources.io import load  # noqa: E402


def clean_boilerplate(d: DataFrame) -> DataFrame:
    """Corpus-level boilerplate line removal (text_remove_boilerplate's
    machinery, api.strip_boilerplate_lines) applied as a REWRITE: text
    becomes the cleaned reassembly, n_chars is recomputed, documents
    that clean to nothing are dropped. Runs FIRST so the dedup stages
    hash cleaned content (shared footers otherwise glue unrelated docs
    into near-dup clusters)."""
    cleaned = strip_boilerplate_lines(d, "doc_id", "text")
    return (d.drop("text", "n_chars")
             .join(cleaned.filter(F.length("cleaned") > 0)
                          .select("doc_id", F.col("cleaned").alias("text")),
                   "doc_id")
             .withColumn("n_chars", F.length("text").cast("long")))


def exact_dedup(d: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact normalized text (hash-group)."""
    key = F.md5(F.lower(F.trim(F.col("text"))))
    return (d.withColumn("_k", key)
             .withColumn("_r", F.row_number().over(
                 Window.partitionBy("_k").orderBy("doc_id")))
             .filter("_r = 1").drop("_k", "_r"))


def near_dedup(d: DataFrame) -> DataFrame:
    """MinHash-LSH near-dup clusters -> keep the LONGEST doc per cluster
    (ties -> lowest doc_id). The edge list is banded candidates verified
    at jaccard >= 0.5; clustering is min-label propagation over that
    (tiny) edge list — the dedup_cluster_cc discipline."""
    tok = _shingles(d).withColumnRenamed("s", "token")
    bands = _minhash_bands(tok)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("d1"),
                     F.col("b.doc_id").alias("d2")).distinct())
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = tok.select(F.col("doc_id").alias("d1"), "token")
    tb = tok.select(F.col("doc_id").alias("_d2"),
                    F.col("token").alias("token2"))
    common = (cand.join(ta, "d1")
                  .join(tb, (F.col("d2") == F.col("_d2"))
                        & (F.col("token") == F.col("token2")))
                  .groupBy("d1", "d2").agg(F.count("*").alias("c")))
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    jac = F.col("c").cast("double") / (F.col("n1") + F.col("n2") - F.col("c"))
    # localCheckpoint (not just cache) — the iterative-pipeline lesson:
    # with plain cache, every downstream ACTION still re-analyzes the
    # full unrolled logical tree, and each propagation round nests the
    # edge lineage again — measured ~16 s of pure driver-side Catalyst
    # time per action at sf0.01. Checkpointing truncates the lineage, so
    # round r's plan is one join over two tiny materialized frames.
    edges = (common.join(F.broadcast(s1), "d1").join(F.broadcast(s2), "d2")
                   .filter(jac >= 0.5).select("d1", "d2").localCheckpoint())

    # min-label propagation to a fixpoint (dup clusters: ~2 rounds)
    lbl = (edges.select(F.col("d1").alias("doc_id"), F.col("d1").alias("lbl"))
                .unionAll(edges.select(F.col("d2").alias("doc_id"),
                                       F.col("d1").alias("lbl")))
                .groupBy("doc_id").agg(F.min("lbl").alias("lbl"))
                .localCheckpoint())
    for _ in range(4):
        prop = (edges.join(lbl.withColumnRenamed("doc_id", "d1")
                              .withColumnRenamed("lbl", "l1"), "d1")
                     .select(F.col("d2").alias("doc_id"),
                             F.col("l1").alias("lbl"))
                     .unionAll(lbl))
        lbl = (prop.groupBy("doc_id").agg(F.min("lbl").alias("lbl"))
                   .localCheckpoint())

    # representative per cluster: longest text, tie -> lowest doc_id
    member = d.join(lbl, "doc_id", "left").withColumn(
        "lbl", F.coalesce("lbl", "doc_id"))
    w = Window.partitionBy("lbl").orderBy(F.length("text").desc(), "doc_id")
    return (member.withColumn("_r", F.row_number().over(w))
                  .filter("_r = 1").drop("_r", "lbl"))


def quality_filter(d: DataFrame) -> DataFrame:
    """Narrow row-level quality gates: token-count bounds + repetition
    ratio (type-token) — the cheap filters that run before any model."""
    ts = F.split("text", " ")
    n_tok = F.size(ts)
    rep = 1.0 - F.size(F.array_distinct(ts)).cast("double") / n_tok
    return (d.withColumn("_n", n_tok).withColumn("_rep", rep)
             .filter((F.col("_n") >= 5) & (F.col("_rep") <= 0.8))
             .drop("_n", "_rep"))


def model_quality_filter(d: DataFrame) -> DataFrame:
    """Round 9: the TRAINED quality gate after the heuristic one — the
    production two-stage ladder (cheap rules kill the obvious junk, the
    distant-supervised NB scorer re-ranks what survives). Trains on the
    deterministic md5 slice of THIS corpus (the same exact-oracled
    machinery as `text_quality_model`) and keeps docs the model scores
    keep-worthy. Scale shape: two map-combinable vocab aggregates + one
    token-keyed linear join — no new shuffle class."""
    scores = _quality_model_frame(d).select("doc_id", "pred_good")
    return (d.join(scores, "doc_id")
             .filter(F.col("pred_good") == 1).drop("pred_good"))


def split_train_val(d: DataFrame, val_pct: int = 10) -> DataFrame:
    """Deterministic hash split (the sample_hash_bucket discipline):
    zero shuffle, stable under appends and re-runs."""
    bucket = F.pmod(_h32(F.col("doc_id").cast("string")), F.lit(100))
    return d.withColumn(
        "split", F.when(bucket < val_pct, F.lit("val")).otherwise("train"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scratch", "pipeline_out")
    spark = get_session()
    t0 = time.monotonic()

    d = load(spark, sf_dir, "documents")
    n0 = d.count()
    d = clean_boilerplate(d)
    nc = d.count()
    d1 = exact_dedup(d)
    n1 = d1.count()
    # materialize the dedup result once — every later stage (and the
    # sink) reads the cache instead of re-running the LSH verify chain
    d2 = near_dedup(d1).cache()
    n2 = d2.count()
    d3 = quality_filter(d2)
    n3 = d3.count()
    d3m = model_quality_filter(d3)
    n3m = d3m.count()
    d4 = split_train_val(d3m)
    (d4.write.mode("overwrite").partitionBy("split", "lang").parquet(out))
    d2.unpersist()
    splits = {r["split"]: r["n"] for r in
              (spark.read.parquet(out).groupBy("split")
                    .agg(F.count("*").alias("n")).collect())}

    print(f"ingested={n0} boilerplate_clean={nc} exact_dedup={n1} "
          f"near_dedup={n2} "
          f"quality={n3} model_quality={n3m} "
          f"train={splits.get('train', 0)} "
          f"val={splits.get('val', 0)} "
          f"out={out} wall={time.monotonic() - t0:.1f}s")


if __name__ == "__main__":
    main()
