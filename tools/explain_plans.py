#!/usr/bin/env python3
"""Dump `.explain("formatted")` for a list of registry keys into
plans/<tag>/<key>_<suffix>.txt — the optimization round's evidence files
(the judge checks plan claims against these).

Usage: python tools/explain_plans.py <tag> <suffix> key1 key2 ...
       (keys default to the round-13 touched set when omitted)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    # ANN / semantic family (training + assignment rework)
    "sim_ivf_topk", "sim_ivf_scalable_topk", "sim_ivf_topk_nprobe2",
    "sim_pq_topk", "sim_ivfpq_topk",
    "dedup_semantic_embedding", "dedup_semantic_incremental",
    "sim_lsh_bucketed",
    # multimodal byte-explode rework
    "mm_audio_fingerprint_dedup", "mm_video_clip_dedup",
    "mm_video_scene_cuts", "mm_audio_offset_dedup",
    # text dedup family
    "dedup_ngram_jaccard", "dedup_near_minhash", "text_decontaminate",
    "text_substring_dedup",
    # headline set
    "agg_groupby_multi", "join_multikey_chain", "ts_resample_1h",
    "win_moving_avg_rows", "topk_per_group", "json_get", "text_word_freq",
    "ts_sessionize", "join_asof_backward", "sim_cosine_topk",
    "dedup_exact_text", "ts_sessionize_bucketed",
]


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from industry_big_data_time_sequence_process_spark.registry import REGISTRY
    from industry_big_data_time_sequence_process_spark.session import get_session
    spark = get_session("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        if key not in REGISTRY:
            print(f"skip {key}: not registered", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"explain: {key}")
        try:
            df = REGISTRY[key].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc}"
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
