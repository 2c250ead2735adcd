"""Round-10 wave semantics (VERDICT r9 "Next round" items):

- the compaction pass applied to a REAL streaming sink — the tree an
  actual ``foreachBatch`` op (`stream_heavy_hitters`) left behind —
  with the merged result re-served from the COMPACTED tree and matched
  row-for-row against the pre-compaction serve (missing #2; the
  registered `sink_compact_small_files` keeps its deterministic
  synthetic stage so DuckDB can state the oracle);
- the end-to-end corpus pipeline audit op's cross-op consistency
  (next-round #5): its per-stage survivor counts must equal the
  stand-alone ops' own answers.

The WAV decode pins (missing #1) live in tests/test_multimodal.py; the
occupancy-envelope guarantee (missing #3) is pinned in
tests/test_wave_r9.py with the tightened arithmetic bound.
"""
import os

from pyspark.sql import Window, functions as F

from industry_big_data_time_sequence_process_spark.operators.sources_sinks import (
    compact_parquet_tree)
from industry_big_data_time_sequence_process_spark.operators.streaming import (
    _stream_base)
from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2


def _count_parquet_files(root: str) -> int:
    return sum(1 for d, _s, fs in os.walk(root)
               for f in fs if f.endswith(".parquet"))


def test_compact_real_streaming_sink_and_reserve(spark):
    """Stream -> compact -> re-serve: run the ACTUAL foreachBatch op,
    compact the per-batch_id sink it wrote, and prove (a) exact value
    identity between the staged and compacted trees, (b) the physical
    file population shrank to the bound, and (c) the leaderboard
    re-served from the COMPACTED tree matches the pre-compaction serve
    row-for-row — the composition VERDICT r9 said the synthetic stage
    alone couldn't prove."""
    pre = REGISTRY["stream_heavy_hitters"].fn(spark, SF_T2).collect()
    assert len(pre) == 20

    out = os.path.join(_stream_base(spark, "stream_heavy_hitters"),
                       "out")
    staged_files = _count_parquet_files(out)
    assert staged_files >= 3          # one+ file per micro-batch

    schema = spark.read.option("basePath", out).parquet(out).schema
    assert "batch_id" in schema.names  # the hive partition col surfaces
    compacted = os.path.join(os.path.dirname(out), "compacted")
    audit = compact_parquet_tree(spark, out, compacted, schema,
                                 target_files=1)
    assert audit["value_match"] == 1, audit
    assert audit["files_bounded"] == 1, audit
    assert audit["n_files"] == 1 < staged_files
    assert audit["rows_before"] == audit["rows_after"]

    # re-serve the merged leaderboard FROM THE COMPACTED TREE — same
    # merge/rank algebra as the op's own serve side
    merged = (spark.read.schema(schema).parquet(compacted)
                   .groupBy("user_id")
                   .agg(F.sum("n").cast("long").alias("n_events"),
                        F.sum("sv").cast("double").alias("total_value")))
    rk = F.row_number().over(
        Window.orderBy(F.col("n_events").desc(), "user_id")).cast("int")
    post = (merged.withColumn("rank", rk)
                  .where(F.col("rank") <= 20)
                  .select("user_id", "n_events", "total_value", "rank")
                  .collect())
    as_tuples = lambda rows: sorted(map(tuple, rows))
    assert as_tuples(post) == as_tuples(pre)


# ---- pipeline_corpus_audit -------------------------------------------------


def test_pipeline_audit_consistent_with_standalone_stages(spark):
    """Cross-op consistency: the audit row's stage counts must agree
    with the stand-alone machinery run independently — the funnel only
    narrows, the split partitions the model survivors exactly, and the
    pack accounting conserves the train split's token mass."""
    from industry_big_data_time_sequence_process_spark.operators import (
        pipeline as P)
    from industry_big_data_time_sequence_process_spark.sources.io import (
        load)

    r = REGISTRY["pipeline_corpus_audit"].fn(spark, SF_T2).collect()[0]
    # monotone funnel (the split partitions n_decontam exactly)
    assert (r["n_ingested"] >= r["n_clean"] >= r["n_exact"]
            >= r["n_near"] >= r["n_semantic"] >= r["n_quality"]
            >= r["n_model"] >= r["n_decontam"])
    assert r["n_train"] + r["n_val"] == r["n_decontam"]
    assert r["n_packs"] >= 1 and r["packed_tokens"] >= r["n_train"]
    # the semantic and decontaminate stages actually BITE on this corpus
    assert r["n_semantic"] < r["n_near"]
    assert r["n_decontam"] < r["n_model"]

    # replay the first stages independently and compare
    d0 = load(spark, SF_T2, "documents")
    emb = load(spark, SF_T2, "embeddings")
    assert d0.count() == r["n_ingested"]
    d1 = P.clean_boilerplate(d0).cache()
    assert d1.count() == r["n_clean"]
    d2 = P.exact_dedup(d1).cache()
    assert d2.count() == r["n_exact"]
    d3 = P.near_dedup(d2).cache()
    assert d3.count() == r["n_near"]
    assert P.semantic_dedup_filter(d3, emb).count() == r["n_semantic"]
    d1.unpersist(), d2.unpersist(), d3.unpersist()

    # token conservation: packed_tokens == whitespace tokens over the
    # train split of the full chain (packs never drop or split a doc)
    full = P.split_train_val(P.decontaminate_filter(
        P.model_quality_filter(P.quality_filter(P.semantic_dedup_filter(
            P.near_dedup(P.exact_dedup(P.clean_boilerplate(d0))), emb))),
        d0))
    toks = (full.filter(F.col("split") == "train")
                .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
                .collect()[0]["t"])
    assert int(toks) == r["packed_tokens"]
