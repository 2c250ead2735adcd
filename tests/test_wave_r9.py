"""Round-9 wave semantics: the CONSTANT-OCCUPANCY two-level index for
the semantic-dedup family (VERDICT r8 #1 — kill the n^1.5 candidate
asymptote).

The family's exact oracles live in tests/test_oracle_parity.py; this
file pins what the oracle can't see:

- degenerate identity: with occ >= max cell size the two-level answer
  equals the r8 single-level drop list by construction;
- sensitivity under a FORCED split (occ << cell size — the simulated
  past-clamp regime): planted duplicate clusters still resolve exactly;
- the candidate-volume bound itself: Σ|sub-cell|² stays ~n·occ where
  the single-level Σ|cell|² shape is ~n^1.5 (measured at sf0.1 in the
  default suite; the 10x exponent pin is `audit10`, the 100x
  production-occ pin is `audit100`).
"""
import math
import os as _os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators.similarity import (
    _SEMDEDUP_OCC, _SEMDEDUP_TAU, _cos, _ivf_cells_scalable,
    _semantic_dedup_frame, _twolevel_from_cells,
)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_BENCH, SF_T2

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def _group_volume(sub, keys):
    """(Σ|group|², max|group|) over the index frame grouped by keys."""
    r = (sub.groupBy(*keys).count()
            .agg(F.sum(F.col("count") * F.col("count")).alias("s2"),
                 F.max("count").alias("mx")).collect()[0])
    return int(r["s2"]), int(r["mx"])


def test_twolevel_identity_when_occ_exceeds_cells(spark):
    """occ >= every cell size => k2 = 1 everywhere, the single
    sub-centroid per cell wins every argmax, and the drop list equals
    the r8 single-level answer (computed inline here) row for row."""
    e = load(spark, SF_T2, "embeddings")
    two = {(r["vec_id"], r["kept_id"], r["cos_sim"])
           for r in _semantic_dedup_frame(e, _SEMDEDUP_TAU,
                                          occ=10**9).collect()}
    cells = _ivf_cells_scalable(e)
    a = cells.select(F.col("vec_id").alias("kept_id"),
                     F.col("embedding").alias("aemb"), "cid")
    b = cells.select("vec_id", F.col("embedding").alias("bemb"), "cid")
    pairs = (a.join(b, "cid")
              .where(F.col("kept_id") < F.col("vec_id"))
              .withColumn("c", _cos(F.col("aemb"), F.col("bemb")))
              .where(F.col("c") >= F.lit(_SEMDEDUP_TAU)))
    w = Window.partitionBy("vec_id").orderBy("kept_id")
    single = {(r["vec_id"], r["kept_id"], round(r["c"], 6))
              for r in pairs.withColumn("r", F.row_number().over(w))
                            .filter("r = 1").collect()}
    assert two == single


# ---- planted corpus under a FORCED split ---------------------------------

N_CLUSTERS, CLUSTER_SIZE, N_NOISE, DIM = 5, 4, 100, 64


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Same construction as tests/test_wave_r8.py: 5 duplicate clusters
    of 4 near-identical vectors among 100 isotropic noise vectors."""
    rng = np.random.default_rng(9)
    vecs, vid = [], []
    for c in range(N_CLUSTERS):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for j in range(CLUSTER_SIZE):
            v = base + 0.02 * rng.normal(size=DIM)
            vecs.append(v / np.linalg.norm(v))
            vid.append(c * CLUSTER_SIZE + j)
    noise = rng.normal(size=(N_NOISE, DIM))
    for i, v in enumerate(noise):
        vecs.append(v / np.linalg.norm(v))
        vid.append(N_CLUSTERS * CLUSTER_SIZE + i)
    d = tmp_path_factory.mktemp("semdedup_r9")
    pq.write_table(pa.table({
        "vec_id": pa.array(vid, type=pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(vid), type=pa.int32()),
    }), d / "embeddings.parquet")
    return str(d)


def test_forced_split_keeps_planted_sensitivity(spark, planted_dir):
    """occ=4 on the 120-vector planted corpus forces k2 > 1 in every
    nonempty cell (E|cell| ~ 120/32) — the simulated past-clamp regime.
    Near-identical clones (pairwise cosine ~0.999) must still land in
    one sub-cell (their argmax over ANY sub-centroid set coincides), so
    every planted non-minimum member is dropped against its cluster
    minimum and no noise vector is dropped."""
    e = load(spark, planted_dir, "embeddings")
    drops = {r["vec_id"]: r for r in
             _semantic_dedup_frame(e, tau=0.9, occ=4).collect()}
    expected = {c * CLUSTER_SIZE + j: c * CLUSTER_SIZE
                for c in range(N_CLUSTERS)
                for j in range(1, CLUSTER_SIZE)}
    assert set(drops) == set(expected), sorted(set(drops) ^ set(expected))
    for vec_id, kept in expected.items():
        assert drops[vec_id]["kept_id"] == kept
        assert drops[vec_id]["cos_sim"] > 0.95


def test_pastclamp_candidate_volume_bounded(spark):
    """The r9 bound itself, measured at sf0.1 with occ=8 (|cell|/occ ~
    6-18 — the ratio the production occ=256 only reaches past n ~ 1e8,
    i.e. beyond the nlist clamp): Σ|sub-cell|² must sit within the
    ~2·n·occ linear envelope AND strictly below half the single-level
    Σ|cell|² it replaces. Measured r9 values: 27,374 vs n·occ = 16,000
    and single-level 92,390."""
    e = load(spark, SF_BENCH, "embeddings")
    n = e.count()
    occ = 8
    cells = _ivf_cells_scalable(e).cache()
    s1, _ = _group_volume(cells, ["cid"])
    sub, subcent = _twolevel_from_cells(cells, occ)
    s2, mx = _group_volume(sub, ["cid", "scid"])
    sub.unpersist()
    cells.unpersist()
    assert s2 <= 2 * n * occ, (s2, n * occ)
    assert s2 < 0.5 * s1, (s2, s1)
    # round 10 (VERDICT r9 missing #3): the occupancy envelope is a
    # GUARANTEE now — sub-cells above 2·occ rank-chunk into <= occ
    # pieces, so no sub-cell can exceed 2·occ, period (the r9 suite
    # merely allowed <= 8·occ and measured 5·occ at the 10x audit).
    assert mx <= 2 * occ, mx


@pytest.mark.audit10
def test_pastclamp_pair_exponent_linear_at_10x(spark):
    """VERDICT r8 #1 done-criterion: candidate-pair count exponent <=
    1.1 between sf0.1 and the 10x audit corpus in the split-engaged
    (occ=8) regime, while the single-level shape measures its ~1.5
    asymptote on the same corpora. Measured r9: two-level e = 0.94
    (27,374 -> 238,368), single-level e = 1.49 (92,390 -> 2,858,030)."""
    from .test_ivf import _audit_corpus

    vols = {}
    for tag, sf_dir in (("1x", SF_BENCH), ("10x", _audit_corpus(10))):
        e = load(spark, sf_dir, "embeddings")
        cells = _ivf_cells_scalable(e).cache()
        s1, _ = _group_volume(cells, ["cid"])
        sub, _sc = _twolevel_from_cells(cells, 8)
        s2, _ = _group_volume(sub, ["cid", "scid"])
        sub.unpersist()
        cells.unpersist()
        vols[tag] = (s1, s2)
    e_single = math.log10(vols["10x"][0] / vols["1x"][0])
    e_two = math.log10(vols["10x"][1] / vols["1x"][1])
    assert e_two <= 1.1, (e_two, vols)
    assert e_single > 1.3, (e_single, vols)


@pytest.mark.audit100
def test_production_occ_splits_engage_at_100x(spark):
    """At the 200k-vector audit corpus the PRODUCTION dial (occ=256)
    crosses its split threshold for real (nlist=447, E|cell| ~ 447 >
    256) — no simulation. Pins: (a) splits actually fire (more
    sub-cells than cells), (b) Σ|sub-cell|² obeys the 2·n·occ linear
    envelope and undercuts the single-level volume, (c) planted
    duplicate clusters appended to the corpus resolve through the split
    index at τ=0.9 with >= 75% planted-drop recall and ZERO false
    positives.

    The recall bar is deliberately not 100%: at 447 trained coarse
    centroids, a clone pair whose top-2 centroid similarities sit
    within the 0.02-jitter margin can straddle a COARSE cell boundary —
    the published SemDeDup failure mode (cluster-split duplicates),
    present identically in the r8 single-level pass and unrelated to
    the r9 sub-split (measured: 12/15 planted drops found; every one a
    correct same-cluster pair; the 3 losses are coarse-cell straddles).
    What the pin DOES require: every reported planted drop names a
    lower-id SAME-CLUSTER keeper at cosine > 0.95, and every
    non-planted drop is one of the corpus's own TRUE duplicates (the
    np.roll clone builder wraps at 64 dims, so clones 64-99 exactly
    duplicate clones 0-35 — ~72k genuine cos=1.0 pairs the op must and
    does find); anything else fails."""
    import shutil

    from .test_ivf import _audit_corpus

    src = _audit_corpus(100)
    t = pq.read_table(_os.path.join(src, "embeddings.parquet"))
    base_n = t.num_rows
    rng = np.random.default_rng(99)
    vecs, vid = [], []
    for c in range(N_CLUSTERS):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for j in range(CLUSTER_SIZE):
            v = base + 0.02 * rng.normal(size=DIM)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            vid.append(base_n + c * CLUSTER_SIZE + j)
    planted = pa.table({
        "vec_id": pa.array(vid, type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(vid), type=pa.int32()),
    })
    out = _os.path.join(_REPO, ".scratch", "sf10_planted")
    shutil.rmtree(out, ignore_errors=True)
    _os.makedirs(out)
    pq.write_table(pa.concat_tables(
        [t.select(["vec_id", "embedding", "label"]), planted]),
        _os.path.join(out, "embeddings.parquet"))

    e = load(spark, out, "embeddings")
    n = e.count()
    cells = _ivf_cells_scalable(e).cache()
    s1, _ = _group_volume(cells, ["cid"])
    n_cells = cells.select("cid").distinct().count()
    sub, _sc = _twolevel_from_cells(cells, _SEMDEDUP_OCC)
    s2, mx = _group_volume(sub, ["cid", "scid"])
    n_groups = sub.select("cid", "scid").distinct().count()
    assert n_groups > n_cells, (n_groups, n_cells)          # (a)
    assert s2 <= 2 * n * _SEMDEDUP_OCC, (s2, n)             # (b)
    assert s2 < s1, (s2, s1)
    assert mx <= 8 * _SEMDEDUP_OCC, mx

    from industry_big_data_time_sequence_process_spark.operators.similarity import (
        _semantic_pairs,
    )
    all_drops = _semantic_pairs(sub, 0.9).collect()
    # Zero FALSE positives — but the audit corpus carries tens of
    # thousands of TRUE positives of its own: the 100x builder clones
    # sf0.1 embeddings via np.roll(vec, clone), and rolling a 64-dim
    # vector by 64 is the identity, so clones 64-99 EXACTLY duplicate
    # clones 0-35 (cos = 1.0). The op correctly reports those (measured:
    # ~72k drops at 200k vectors — real dedup work at scale). Every
    # non-planted drop must therefore be such a clone-duplicate: same
    # base vector (ids congruent mod 2000, the sf0.1 corpus size) at
    # cosine ~1; anything else is a genuine false positive and fails.
    sf01_n = 2000
    bad = [(r["vec_id"], r["kept_id"], r["cos_sim"])
           for r in all_drops
           if r["vec_id"] < base_n
           and not (r["vec_id"] % sf01_n == r["kept_id"] % sf01_n
                    and r["cos_sim"] >= 0.999)]
    assert not bad, bad[:5]
    drops = {r["vec_id"]: r for r in all_drops
             if r["vec_id"] >= base_n}

    def cluster(vid):
        return (vid - base_n) // CLUSTER_SIZE

    n_expected = N_CLUSTERS * (CLUSTER_SIZE - 1)
    for vid, r in drops.items():
        assert cluster(r["kept_id"]) == cluster(vid)         # (c) correct
        assert r["kept_id"] < vid
        assert r["cos_sim"] > 0.95
    assert len(drops) >= 0.75 * n_expected, (len(drops), n_expected)
    sub.unpersist()
    cells.unpersist()
