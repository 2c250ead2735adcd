"""Core-count scaling at 100x (VERDICT r13 #6).

At sf0.1 every bench row is overhead/collect bound — the r13 driver
measured 8-core/32-core ratios of ~0.8-1.0 on every query, so the
bench could no longer distinguish parallel from serial execution. Two
structural reasons, both measured on the way here (committed as
``SCALING_CORES_r14_10x_singlefile.json``): the corpora are too small
for compute to dominate fixed cost, AND each table is ONE parquet file
far below ``spark.sql.files.maxPartitionBytes`` — one scan split, one
map task, regardless of row groups, so the map side of every
corpus-linear op is serial at any core count.

This tool builds the deterministic 100x corpus (``scaling_audit``'s
``build_corpus`` clones) laid out the way a real big table is laid
out — each scaled table a DIRECTORY of per-clone part files, so scans
split naturally with no config twiddles — and times the heavy
compute-bound family at SPARK_GRAFT_CPUS in {32, 8}. The committed
artifact is the round's parallelism-sensitive datapoint: compute-bound
rows must show ratio >> 1.

Usage:  python tools/scaling_cores_r14.py            # build + measure
        python tools/scaling_cores_r14.py --gen      # only (re)build
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLONES = 100
SF1 = os.path.join(REPO, ".scratch", f"sfx{CLONES}_parts")

#: The compute-bound heavy set: corpus-linear text dedups, the pair
#: scorers, the banded LSH — the families the optimization rounds
#: target. Collect outputs are tiny for all of them, so the timing is
#: compute, not driver materialization. (The composed-ANN builds stay
#: at the 10x audit — their training caps make them constant-cost by
#: design, which is the point of the caps, not a parallelism probe.)
OPS = [
    "dedup_near_minhash", "dedup_ngram_jaccard", "text_decontaminate",
    "text_substring_dedup", "sim_lsh_bucketed",
    "dedup_semantic_embedding", "sim_cosine_topk",
]

N_TIMED = 2


def build() -> None:
    import pyarrow.parquet as pq

    from tools.scaling_audit import build_corpus
    tmp = SF1 + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(SF1, ignore_errors=True)
    build_corpus(CLONES, tmp)
    os.makedirs(SF1, exist_ok=True)
    # re-lay each table: scaled tables become DIRECTORIES of ~CLONES/2
    # part files (>= 2 row groups each) — the multi-file layout a big
    # table actually has, so Spark's scan splits without touching
    # maxPartitionBytes; small dimension tables stay single files.
    for name in sorted(os.listdir(tmp)):
        src = os.path.join(tmp, name)
        dst = os.path.join(SF1, name)
        t = pq.read_table(src)
        if t.num_rows < 100_000:
            shutil.copyfile(src, dst)
            continue
        os.makedirs(dst, exist_ok=True)
        nfiles = 50
        per = (t.num_rows + nfiles - 1) // nfiles
        for i in range(nfiles):
            part = t.slice(i * per, per)
            if part.num_rows == 0:
                break
            pq.write_table(part, os.path.join(dst, f"part-{i:04d}.parquet"),
                           row_group_size=max(1024, per // 2))
    shutil.rmtree(tmp, ignore_errors=True)


def measure(cpus: int) -> dict:
    """Run the OPS once warm + N_TIMED timed in a subprocess pinned to
    ``local[cpus]`` (a fresh JVM per core count — no cross-talk)."""
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from industry_big_data_time_sequence_process_spark.session import get_session
from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from tools.scaling_audit import _reset_semantic_memo
spark = get_session("scale14")
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for key in {OPS!r}:
    fn = REGISTRY[key].fn
    _reset_semantic_memo()   # memoized ops must pay the FULL build per pass
    fn(spark, {SF1!r}).collect()
    ts = []
    for _ in range({N_TIMED}):
        _reset_semantic_memo()
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
        "metric": "heavy_core_scaling_" + str(CLONES) + "x",
        "sf_dir": SF1, "cpus": [32, 8], "n_timed": N_TIMED,
        "t32": t32, "t8": t8, "ratio_8c_over_32c": ratios,
        "loadavg_start": [round(x, 2) for x in load0],
    }))


if __name__ == "__main__":
    main()
