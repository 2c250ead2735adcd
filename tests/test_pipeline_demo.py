"""Smoke-test the end-to-end pipeline composition (tools/pipeline_demo.py):
stages must compose, counts must be monotone non-increasing through the
dedup/filter stages, the split must be disjoint and exhaustive, and the
near-dedup stage must actually collapse the planted near-dup pairs."""
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pipeline_demo import (  # noqa: E402
    clean_boilerplate, exact_dedup, model_quality_filter, near_dedup,
    quality_filter, split_train_val,
)

from industry_big_data_time_sequence_process_spark.registry import REGISTRY  # noqa: E402
from industry_big_data_time_sequence_process_spark.sources.io import load  # noqa: E402

from .conftest import SF_T2


def test_pipeline_composes_and_dedups(spark):
    d = load(spark, SF_T2, "documents")
    n0 = d.count()
    d = clean_boilerplate(d)
    nc = d.count()
    assert n0 >= nc > 0   # inert on this corpus, but must not grow/crash
    d1 = exact_dedup(d)
    n1 = d1.count()
    d2 = near_dedup(d1).cache()
    n2 = d2.count()
    d3 = quality_filter(d2)
    n3 = d3.count()
    d3m = model_quality_filter(d3)
    n3m = d3m.count()
    assert n0 >= n1 >= n2 >= n3 >= n3m > 0

    # near-dedup must remove exactly one member of every jaccard>=0.5
    # pair that dedup_near_minhash finds (clusters keep 1 representative)
    pairs = REGISTRY["dedup_near_minhash"].fn(spark, SF_T2).collect()
    docs_in_pairs = {r["doc1"] for r in pairs} | {r["doc2"] for r in pairs}
    kept = {r["doc_id"] for r in d2.select("doc_id").collect()}
    # every pair lost at least one member; no cluster vanished entirely
    for r in pairs:
        assert not (r["doc1"] in kept and r["doc2"] in kept), r
    assert kept & docs_in_pairs, "every cluster lost ALL members"

    d4 = split_train_val(d3m)
    agg = d4.groupBy("split").agg(F.count("*").alias("n")).collect()
    by = {r["split"]: r["n"] for r in agg}
    assert set(by) <= {"train", "val"} and by.get("train", 0) > 0
    assert sum(by.values()) == n3m
    d2.unpersist()
