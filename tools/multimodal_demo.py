"""End-to-end multimodal dedup demo (VERDICT r6 #8): the content-level
triple — image pHash dedup, audio fingerprint dedup, video scene cuts —
run together over a staged corpus with PLANTED structure, printing
found-vs-planted so one command demonstrates the family works end to
end (the media twin of tools/retrieval_demo.py for ANN).

The staging:

- **Image corpus**: ``N_BASE`` synthetic 64x64 'images' (smooth random
  2D fields rendered as ASCII bytes, so byte values ARE pixel values);
  the first ``N_PLANTED`` get a near-dup at id+100 with a small patched
  region — the pHash recipe (mean-pool -> fixed-point DCT-II ->
  rank-median bits -> pigeonhole bands -> exact Hamming verify) must
  find EXACTLY those pairs (unrelated fields measure hamming ~31.8).
- **Audio**: the real documents corpus at the chosen sf carries planted
  near-dup docs sharing long byte prefixes — aligned windows fingerprint
  identically (Haitsma-Kalker delta-sign), so the known prefix-dup
  pairs must surface with match_frac >= 0.9.
- **Video**: the same corpus read as frame streams; scene-cut labels
  must PARTITION each asset's frames (contiguous, starting at scene 0).

Usage:  python tools/multimodal_demo.py [sf_dir]
        (default /root/testdata/sf0.01)
"""
from __future__ import annotations

import math
import os
import random
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from industry_big_data_time_sequence_process_spark.registry import REGISTRY  # noqa: E402
from industry_big_data_time_sequence_process_spark.sources.io import TABLES  # noqa: E402

N_BASE = 40      # distinct synthetic "images"
N_PLANTED = 10   # of which the first N get a patched near-dup at id+100
PATCH = 8        # patched chars — planted pairs land <= hamming 8 while
#                  the closest unrelated pair measures 10


def image_text(seed: int) -> str:
    """A 64x64 'image': a smooth random 2D field rendered as ASCII bytes
    (chars 33..125 <-> brightness), so byte values ARE pixel values.
    Same construction as tests/test_multimodal.py's fixture."""
    rng = random.Random(seed)
    coef = [(rng.uniform(0.5, 1.5), rng.uniform(0, 6.28),
             rng.uniform(0.5, 1.5), rng.uniform(0, 6.28))
            for _ in range(6)]
    out = []
    for y in range(64):
        for x in range(64):
            v = sum(math.sin(a * x / 7 + p1) * math.cos(b * y / 7 + p2)
                    for a, p1, b, p2 in coef)
            out.append(chr(33 + max(0, min(92, int(46 + 7.6 * v)))))
    return "".join(out)


def planted_pairs() -> set:
    return {(i, 100 + i) for i in range(N_PLANTED)}


def stage_image_corpus(base_sf_dir: str, out_dir: str) -> str:
    """Write a documents table of synthetic images (with planted patched
    near-dups) next to copies of the other tables, so any operator can
    run against the staged dir unchanged."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t != "documents":
            shutil.copy(os.path.join(base_sf_dir, f"{t}.parquet"),
                        os.path.join(out_dir, f"{t}.parquet"))
    docs = {i: image_text(i) for i in range(N_BASE)}
    for i in range(N_PLANTED):  # near-dup: a small local patch
        t = list(docs[i])
        for j in range(PATCH):
            t[(i * 97 + j * 3) % 4096] = chr(33 + ((i + j) % 90))
        docs[100 + i] = "".join(t)
    ids = sorted(docs)
    tbl = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([docs[i] for i in ids], type=pa.string()),
        "lang": pa.array(["xx"] * len(ids), type=pa.string()),
        "source": pa.array(["synth"] * len(ids), type=pa.string()),
        "n_chars": pa.array([len(docs[i]) for i in ids], type=pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    return out_dir


def run_image_dedup(spark, image_dir: str) -> tuple[set, list]:
    rows = REGISTRY["mm_phash_dedup"].fn(spark, image_dir).collect()
    return {(r["doc1"], r["doc2"]) for r in rows}, rows


def run_audio_dedup(spark, sf_dir: str) -> list:
    return REGISTRY["mm_audio_fingerprint_dedup"].fn(spark, sf_dir) \
        .collect()


def run_scene_cuts(spark, sf_dir: str) -> dict:
    """{doc_id: [scene rows sorted by scene_id]}"""
    by_doc: dict = {}
    for r in REGISTRY["mm_video_scene_cuts"].fn(spark, sf_dir).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for scenes in by_doc.values():
        scenes.sort(key=lambda r: r["scene_id"])
    return by_doc


def scenes_partition_frames(by_doc: dict) -> bool:
    """Contiguity invariant: scene 0 starts at frame 0; each scene
    starts where the previous ended."""
    for scenes in by_doc.values():
        nxt = 0
        for i, s in enumerate(scenes):
            if s["scene_id"] != i or s["start_frame"] != nxt:
                return False
            nxt = s["start_frame"] + s["n_frames"]
    return True


def main() -> None:
    from industry_big_data_time_sequence_process_spark.session import get_session

    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else "/root/testdata/sf0.01").rstrip("/")
    spark = get_session("multimodal_demo")
    spark.sparkContext.setLogLevel("ERROR")

    image_dir = os.path.join(REPO, ".scratch", "mm_demo_images")
    stage_image_corpus(sf_dir, image_dir)

    t0 = time.monotonic()
    got, rows = run_image_dedup(spark, image_dir)
    want = planted_pairs()
    print(f"[image ] pHash dedup over {N_BASE + N_PLANTED} synthetic "
          f"images: found {len(got)} pairs, planted {len(want)} — "
          f"{'ALL FOUND, NO FALSE POSITIVES' if got == want else 'MISMATCH: ' + str(got.symmetric_difference(want))}"
          f"  (hamming {sorted(r['hamming'] for r in rows)}) "
          f"[{time.monotonic() - t0:.1f}s]")

    t0 = time.monotonic()
    arows = run_audio_dedup(spark, sf_dir)
    apairs = {(r["doc1"], r["doc2"]) for r in arows}
    print(f"[audio ] fingerprint dedup over {sf_dir}: "
          f"{len(apairs)} prefix-dup pairs, min match_frac "
          f"{min((r['match_frac'] for r in arows), default=1.0):.2f} "
          f"[{time.monotonic() - t0:.1f}s]")

    t0 = time.monotonic()
    by_doc = run_scene_cuts(spark, sf_dir)
    n_scenes = sum(len(s) for s in by_doc.values())
    ok = scenes_partition_frames(by_doc)
    print(f"[video ] scene cuts over {len(by_doc)} assets: {n_scenes} "
          f"scenes, frames partitioned = {ok} "
          f"[{time.monotonic() - t0:.1f}s]")

    if got != want or not ok or not apairs:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
