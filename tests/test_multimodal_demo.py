"""Smoke-test the end-to-end multimodal dedup demo
(tools/multimodal_demo.py — VERDICT r6 #8): the content-level triple
must run together over the staged corpus and hit its planted structure:
every planted image pair found with zero false positives, the known
audio prefix-dup pairs surfaced, and every asset's frames partitioned
into contiguous scenes."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.multimodal_demo import (  # noqa: E402
    planted_pairs, run_audio_dedup, run_image_dedup, run_scene_cuts,
    scenes_partition_frames, stage_image_corpus,
)

from .conftest import SF_T2


@pytest.mark.smoke
def test_multimodal_demo_triple(spark, tmp_path):
    image_dir = stage_image_corpus(SF_T2, str(tmp_path / "mm_demo"))
    got, rows = run_image_dedup(spark, image_dir)
    assert got == planted_pairs(), got.symmetric_difference(planted_pairs())
    assert all(r["hamming"] <= 8 for r in rows)

    arows = run_audio_dedup(spark, SF_T2)
    apairs = {(r["doc1"], r["doc2"]) for r in arows}
    known = {(152, 178), (61, 185), (8, 245), (98, 290), (285, 301)}
    assert known <= apairs, known - apairs
    assert all(r["match_frac"] >= 0.9 for r in arows)

    by_doc = run_scene_cuts(spark, SF_T2)
    assert by_doc and scenes_partition_frames(by_doc)
