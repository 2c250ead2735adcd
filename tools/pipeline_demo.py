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

from pyspark.sql import functions as F  # noqa: E402

from industry_big_data_time_sequence_process_spark.operators.pipeline import (  # noqa: E402
    clean_boilerplate, exact_dedup, model_quality_filter, near_dedup,
    quality_filter, split_train_val,
)
from industry_big_data_time_sequence_process_spark.registry import REGISTRY  # noqa: E402
from industry_big_data_time_sequence_process_spark.session import get_session  # noqa: E402
from industry_big_data_time_sequence_process_spark.sources.io import load  # noqa: E402


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

    # round 10: the same chain is a GRADED operator now — run the
    # exact-oracled audit row so the demo's narrative numbers are the
    # driver-checked ones
    audit = REGISTRY["pipeline_corpus_audit"].fn(spark, sf_dir).collect()[0]
    print("audit:", audit.asDict())


if __name__ == "__main__":
    main()
