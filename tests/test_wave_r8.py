"""Round-8 wave semantics: SemDeDup-shape semantic dedup and the
domain-mixture sampler (VERDICT r7 "What's missing" #1 and #2).

Both ops are exact-oracled in tests/test_oracle_parity.py; this file pins
the SEMANTICS the oracle can't see — the planted-duplicate sensitivity /
specificity of the semantic dedup at a production threshold, and the
mixture-accuracy contract of the sampler.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.operators.similarity import (
    _SEMDEDUP_TAU, _semantic_dedup_frame,
)
from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2

# ---- planted semantic-duplicate corpus -----------------------------------
#
# 5 duplicate clusters of 4 vectors each (a base direction plus tiny
# orthogonalized jitter -> pairwise cosine ~0.999) planted among 100
# isotropic noise vectors (64-dim random cosines concentrate near 0,
# sd ~ 1/8 — never near 0.9). Deterministic seed; built the same way the
# multimodal tests plant their dup structure.

N_CLUSTERS, CLUSTER_SIZE, N_NOISE, DIM = 5, 4, 100, 64


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    rng = np.random.default_rng(8)
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
    d = tmp_path_factory.mktemp("semdedup_sf")
    pq.write_table(pa.table({
        "vec_id": pa.array(vid, type=pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(vid), type=pa.int32()),
    }), d / "embeddings.parquet")
    return str(d)


def test_semantic_dedup_finds_planted_clusters(spark, planted_dir):
    """At the production threshold (τ=0.9) every planted non-minimum
    cluster member is dropped against its cluster's minimum id, and NO
    noise vector is dropped — sensitivity and specificity in one corpus.
    (SemDeDup's known failure mode — near-identical vectors split across
    k-means cells — can't fire here: jitter 0.02 puts every clone on the
    same argmax centroid.)"""
    e = load(spark, planted_dir, "embeddings")
    drops = {r["vec_id"]: r for r in
             _semantic_dedup_frame(e, tau=0.9).collect()}
    expected = {c * CLUSTER_SIZE + j: c * CLUSTER_SIZE
                for c in range(N_CLUSTERS)
                for j in range(1, CLUSTER_SIZE)}
    assert set(drops) == set(expected), (
        sorted(set(drops) ^ set(expected)))
    for vec_id, kept in expected.items():
        assert drops[vec_id]["kept_id"] == kept
        # 0.02·N(0,1) jitter over 64 dims => pairwise cosine ~0.97-0.99
        assert drops[vec_id]["cos_sim"] > 0.95


def test_semantic_dedup_zero_on_noise(spark, planted_dir):
    """τ=0.9 on the noise-only slice (drop the planted clusters) keeps
    everything — the pass never invents duplicates on isotropic prose-
    like vectors."""
    import pyspark.sql.functions as F
    e = (load(spark, planted_dir, "embeddings")
         .filter(F.col("vec_id") >= N_CLUSTERS * CLUSTER_SIZE))
    assert _semantic_dedup_frame(e, tau=0.9).count() == 0


def test_semantic_dedup_corpus_threshold_sane(spark):
    """On the real synthetic corpus at the registered τ: every reported
    pair is actually >= τ, keepers are never themselves reported as
    keepers of HIGHER ids than their own droppers (kept_id < vec_id
    invariant), and each dropped vec appears exactly once."""
    rows = REGISTRY["dedup_semantic_embedding"].fn(spark, SF_T2).collect()
    assert len(rows) > 0
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))          # one verdict per dropped vec
    for r in rows:
        assert r["kept_id"] < r["vec_id"]
        assert r["cos_sim"] >= _SEMDEDUP_TAU - 1e-6


# ---- domain-mixture sampler -----------------------------------------------


def test_domain_mix_hits_target_within_rounding(spark):
    """The achieved mixture equals the declared target to within the
    integer-rounding bound: each cell keeps exactly floor(share·t_total)
    docs (quota met — availability is guaranteed by the t_total min
    rule), and each floor loses < 1 doc, so with C cells the achieved
    share deviates by at most (1 + C)/total_kept per cell."""
    rows = {r["lang"]: r for r in
            REGISTRY["sample_domain_mix"].fn(spark, SF_T2).collect()}
    assert set(rows) == {"en", "de", "es", "fr", "zh"}
    total_kept = sum(r["n_kept"] for r in rows.values())
    assert total_kept > 0
    bound = (1.0 + len(rows)) / total_kept + 1e-6
    for lang, r in rows.items():
        assert r["n_kept"] <= r["n_avail"]    # feasibility
        assert abs(r["achieved_share"] - r["target_share"]) \
            <= bound, (lang, dict(r.asDict()))


def test_domain_mix_deterministic_and_monotone(spark):
    """Two runs keep identical counts (md5 draw, not rand()); and the
    binding-cell rule: at least one language's quota exhausts a cell to
    within one doc of the rate its share implies (the min in t_total is
    attained somewhere)."""
    a = sorted(map(tuple, REGISTRY["sample_domain_mix"]
                   .fn(spark, SF_T2).collect()))
    b = sorted(map(tuple, REGISTRY["sample_domain_mix"]
                   .fn(spark, SF_T2).collect()))
    assert a == b
    rows = {r["lang"]: r for r in
            REGISTRY["sample_domain_mix"].fn(spark, SF_T2).collect()}
    # the binding cell keeps nearly all of its availability
    assert any(r["n_avail"] - r["n_kept"] <= max(1, int(r["target_share"]
               * len(rows))) for r in rows.values()), rows


# ---- second wave: incremental SemDeDup, Ljung-Box, Benford ---------------


def test_semantic_incremental_subset_of_batch(spark):
    """Every incremental drop must correspond to a real above-threshold
    old-corpus neighbor: kept_id < cut <= vec_id (keepers come from the
    old slice, droppers from the batch), one verdict per dropped vec,
    and the cosine bound holds."""
    import duckdb
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM read_parquet("
                    f"'{SF_T2}/embeddings.parquet')").fetchone()[0]
    con.close()
    cut = int(0.9 * n)
    rows = REGISTRY["dedup_semantic_incremental"].fn(spark, SF_T2).collect()
    assert len(rows) > 0
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r["vec_id"] >= cut > r["kept_id"]
        assert r["cos_sim"] >= _SEMDEDUP_TAU - 1e-6


def test_ljung_box_flags_structure_not_noise(spark):
    """Semantic sanity on the verdict column: Q is non-negative
    everywhere, the white-noise flag equals the literal-cutoff compare
    recomputed from the row, and at least one channel lands on each
    side at sf0.01 (the corpus has both quiet and patterned users —
    a one-sided verdict would mean the statistic degenerated)."""
    crit = {1: 3.841459, 2: 5.991465, 3: 7.814728}
    rows = REGISTRY["ts_ljung_box"].fn(spark, SF_T2).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["q_stat"] >= 0
        assert 1 <= r["n_lags"] <= 3
        assert r["white_noise"] == int(r["q_stat"] <= crit[r["n_lags"]]
                                       + 1e-6) or abs(
            r["q_stat"] - crit[r["n_lags"]]) < 2e-6
    sides = {r["white_noise"] for r in rows}
    assert sides == {0, 1}, sides


def test_benford_audit_shape(spark):
    """All nine digits reported, shares sum to ~1 on both columns, the
    expectation column IS the Benford law, and the chi2 terms correctly
    flag this uniform-ish synthetic corpus as non-Benford (total chi2
    far above the 15.51 cutoff for 8 dof)."""
    import math
    rows = {r["digit"]: r for r in
            REGISTRY["dq_benford_check"].fn(spark, SF_T2).collect()}
    assert set(rows) == set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r["exp_share"] for r in rows.values()) - 1.0) < 1e-4
    for d, r in rows.items():
        assert abs(r["exp_share"] - math.log10(1 + 1 / d)) < 1e-6
    assert sum(r["chi2_term"] for r in rows.values()) > 15.51


# ---- third wave: period detect, SBC demand classes, k-core peel ----------


def test_period_detect_is_argmax_of_acf_table(spark):
    """The detected period must dominate the lags the ACF table op
    reports (1-3h are a subset of the 1-24h scan), and land in range."""
    best = {r["user_id"]: (r["period_hours"], r["acf_at_period"])
            for r in REGISTRY["ts_period_detect_acf"].fn(spark, SF_T2)
            .collect()}
    assert best and all(1 <= p <= 24 for p, _ in best.values())
    for r in REGISTRY["ts_acf_lags"].fn(spark, SF_T2).collect():
        if r["acf"] is not None and r["user_id"] in best:
            assert best[r["user_id"]][1] >= r["acf"] - 1e-9, (
                r["user_id"], r["lag"], r["acf"], best[r["user_id"]])


def test_sbc_quadrants_consistent(spark):
    """Every classified user's quadrant matches its own reported
    (adi, cv2) against the literal cutoffs; ADI >= 1 by construction
    (span days >= demand days)."""
    rows = REGISTRY["ts_demand_classify_sbc"].fn(spark, SF_T2).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["adi"] >= 1 - 1e-9 and r["cv2"] >= 0
        want = (("smooth" if r["cv2"] < 0.49 else "erratic")
                if r["adi"] < 1.32 else
                ("intermittent" if r["cv2"] < 0.49 else "lumpy"))
        # boundary rows (rounded values printed at 6dp) tolerated
        if min(abs(r["adi"] - 1.32), abs(r["cv2"] - 0.49)) > 1e-5:
            assert r["demand_class"] == want, dict(r.asDict())


def test_kcore_survivors_have_core_degree(spark):
    """Every survivor's final-round degree >= k, survivors form a
    subgraph (each surviving part still has >= k surviving neighbors in
    the ORIGINAL edge list — the defining 2-core property at the fixed
    round count), and at least one original node was peeled."""
    from industry_big_data_time_sequence_process_spark.operators.relational import (
        _copurchase_edges,
    )
    core = {r["partkey"]: r["core_degree"] for r in
            REGISTRY["graph_kcore_peel"].fn(spark, SF_T2).collect()}
    # induced degrees: >= k except nodes whose neighbors fell in the
    # LAST peel round (the fixed-round approximation, documented)
    assert core and sum(d >= 2 for d in core.values()) >= 0.9 * len(core)
    edges = [(r["pa"], r["pb"]) for r in
             _copurchase_edges(spark, SF_T2).collect()]
    nodes = {p for e in edges for p in e}
    assert nodes - set(core), "peel removed nothing — fixture too dense?"
    import collections
    deg_in_core = collections.Counter()
    for a, b in edges:
        if a in core and b in core:
            deg_in_core[a] += 1
            deg_in_core[b] += 1
    for p, d in core.items():
        assert deg_in_core[p] == d, (p, d, deg_in_core[p])
