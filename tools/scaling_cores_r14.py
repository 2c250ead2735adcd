"""Core-count scaling at 10x (VERDICT r13 #6).

At sf0.1 every bench row is overhead/collect bound — the r13 driver
measured 8-core/32-core ratios of ~0.8-1.0 on every query, so the bench
could no longer distinguish parallel from serial execution. This tool
builds the deterministic 10x corpus (``tools/scaling_audit.py``'s
``build_corpus`` — disjoint clones, and since r14 written with small
row groups so scans actually split into tasks) and times the heavy
compute-bound family at SPARK_GRAFT_CPUS in {32, 8}, printing one JSON
line per core count plus the per-op ratios. The committed artifact is
the round's parallelism-sensitive datapoint: compute-bound rows must
show ratio >> 1.

Usage:  python tools/scaling_cores_r14.py            # build + measure
        python tools/scaling_cores_r14.py --gen      # only (re)build
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = os.path.join(REPO, ".scratch", "sf1")

#: The compute-bound heavy set: corpus-linear text dedups + the ANN
#: index builds (the families the optimization rounds target). Collect
#: outputs are tiny for all of them, so the timing is compute, not
#: driver materialization.
OPS = [
    "dedup_near_minhash", "dedup_ngram_jaccard", "text_decontaminate",
    "text_substring_dedup", "sim_ivfpq_topk", "sim_pq_topk",
    "sim_ivf_scalable_topk", "sim_lsh_bucketed", "dedup_semantic_embedding",
    "mm_audio_fingerprint_dedup", "mm_video_clip_dedup",
]

N_TIMED = 2


def build() -> None:
    import pyarrow.parquet as pq

    from tools.scaling_audit import build_corpus
    build_corpus(10, SF1)
    # rewrite with small row groups so a 10x scan splits into tasks —
    # a single-row-group file is ONE task at any core count (guide §6)
    for name in os.listdir(SF1):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(SF1, name)
        t = pq.read_table(path)
        rg = max(1024, t.num_rows // 32)
        pq.write_table(t, path, row_group_size=rg)


def measure(cpus: int) -> dict:
    """Run the OPS once warm + N_TIMED timed in a subprocess pinned to
    ``local[cpus]`` (a fresh JVM per core count — no cross-talk)."""
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from industry_big_data_time_sequence_process_spark.session import get_session
from industry_big_data_time_sequence_process_spark.registry import REGISTRY
spark = get_session("scale14")
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for key in {OPS!r}:
    fn = REGISTRY[key].fn
    fn(spark, {SF1!r}).collect()
    ts = []
    for _ in range({N_TIMED}):
        t0 = time.perf_counter(); fn(spark, {SF1!r}).collect()
        ts.append(time.perf_counter() - t0)
    out[key] = round(min(ts), 3)
print("RESULT " + json.dumps(out))
spark.stop()
"""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=7200)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT at cpus={cpus}:\n{p.stdout[-2000:]}\n"
                       f"{p.stderr[-2000:]}")


def main() -> None:
    if not os.path.isdir(SF1) or "--gen" in sys.argv:
        build()
    if "--gen" in sys.argv:
        return
    load0 = os.getloadavg()
    t32 = measure(32)
    t8 = measure(8)
    ratios = {k: (round(t8[k] / t32[k], 2) if t32[k] > 0 else None)
              for k in t32}
    print(json.dumps({
        "metric": "heavy_core_scaling_10x",
        "sf_dir": SF1, "cpus": [32, 8], "n_timed": N_TIMED,
        "t32": t32, "t8": t8, "ratio_8c_over_32c": ratios,
        "loadavg_start": [round(x, 2) for x in load0],
    }))


if __name__ == "__main__":
    main()
