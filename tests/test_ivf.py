"""Trained IVF centroids (VERDICT r3 item #3; retargeted r6 per VERDICT
r5 #2).

``sim_ivf_topk`` round 3 used a stride-97 sample as "centroids"; round 4
trains them (portable hash-bucket seeds + 3 fixed-point Lloyd iterations).
Round 6 ported ``sim_ivf_recall_eval`` / ``sim_ivf_topk_nprobe2`` onto the
CAPPED trainer (constant ``_IVF_NLIST`` cells, capped training sample — the
index users deploy), so the yardstick here is the untrained hash-bucket
quantizer at the SAME cell count: k-means cells must beat random cells at
identical search cost. The untrained baseline is recomputed in DuckDB so
the comparison survives the operator's replacement.
"""
import duckdb

from industry_big_data_time_sequence_process_spark.operators.similarity import (
    _EVAL_QUERIES, _IVF_NLIST, _IVF_STRIDE, _DUCK_HV, _duck_cos,
)
from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2

_HASHCELL_RECALL_SQL = f"""
WITH assign AS (
    SELECT vec_id, ({_DUCK_HV} % {_IVF_NLIST}) AS cid FROM embeddings
), topk AS (
    SELECT q_vec_id, c_vec_id FROM (
        SELECT q.vec_id AS q_vec_id, c.vec_id AS c_vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {_duck_cos('q.embedding', 'c.embedding')} DESC,
                            c.vec_id) AS rnk
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {_EVAL_QUERIES} AND q.vec_id <> c.vec_id
    ) WHERE rnk <= 5
)
SELECT avg(CASE WHEN aq.cid = ac.cid THEN 1.0 ELSE 0.0 END) AS recall
FROM topk t
JOIN assign aq ON aq.vec_id = t.q_vec_id
JOIN assign ac ON ac.vec_id = t.c_vec_id
"""


def _hashcell_recall(sf_dir: str) -> float:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    r = con.execute(_HASHCELL_RECALL_SQL).fetchone()[0]
    con.close()
    return float(r)


def test_trained_recall_beats_untrained_same_cells(spark):
    """k-means-trained cells must beat the untrained hash-bucket
    quantizer at the SAME cell count (_IVF_NLIST) — i.e. the training
    buys recall at identical search cost."""
    rows = REGISTRY["sim_ivf_recall_eval"].fn(spark, SF_T2).collect()
    assert len(rows) == _EVAL_QUERIES
    trained = (sum(r["n_in_cell"] for r in rows)
               / sum(r["n_true"] for r in rows))
    untrained = _hashcell_recall(SF_T2)
    assert trained >= untrained, (trained, untrained)
    # random 32-cell assignment puts a neighbor with the query ~1/32 of
    # the time; data-adaptive cells must clear that by a wide margin
    assert trained > 2.0 / _IVF_NLIST, trained


def test_nprobe2_recall_dominates_nprobe1(spark):
    """nprobe=2 must dominate nprobe=1 per query (probing a superset of
    cells can only add hits) and strictly beat it in aggregate on this
    corpus."""
    rows = REGISTRY["sim_ivf_recall_eval"].fn(spark, SF_T2).collect()
    assert all(r["n_in_2cells"] >= r["n_in_cell"] for r in rows)
    r1 = sum(r["n_in_cell"] for r in rows) / sum(r["n_true"] for r in rows)
    r2 = sum(r["n_in_2cells"] for r in rows) / sum(r["n_true"] for r in rows)
    assert r2 > r1, (r1, r2)


def test_nprobe2_scores_dominate_nprobe1(spark):
    """Searching 2 cells returns, per (query, rank), a neighbor at least
    as good as the 1-cell search — monotonicity of the recall dial on
    the actual search op outputs. Both ops ride the SAME capped-trainer
    index (nprobe2 was ported off the full-corpus trainer in r6), so
    nprobe=2's candidates are a strict superset per query."""
    s1 = {(r["q_vec_id"], r["rnk"]): r["score"]
          for r in REGISTRY["sim_ivf_scalable_topk"].fn(spark, SF_T2)
          .collect()}
    s2 = {(r["q_vec_id"], r["rnk"]): r["score"]
          for r in REGISTRY["sim_ivf_topk_nprobe2"].fn(spark, SF_T2)
          .collect()}
    assert set(s1) <= set(s2)
    assert all(s2[k] >= s1[k] for k in s1)


def test_trained_cells_cover_corpus_once(spark):
    from industry_big_data_time_sequence_process_spark.operators.similarity \
        import _ivf_cells
    from industry_big_data_time_sequence_process_spark.sources.io import load
    e = load(spark, SF_T2, "embeddings")
    cells = _ivf_cells(e)
    n = e.count()
    assert cells.count() == n                       # every vector assigned
    assert cells.select("vec_id").distinct().count() == n  # exactly once
    n_cells = cells.select("cid").distinct().count()
    assert 1 <= n_cells <= -(-n // _IVF_STRIDE)     # at most ceil(n/97)


def test_scalable_cells_capacity_constant(spark):
    """The scalable index (linear-training fix from the 10x audit): every
    vector assigned exactly once, to one of at most _IVF_NLIST cells —
    nlist is a capacity constant, never derived from n."""
    from industry_big_data_time_sequence_process_spark.operators.similarity \
        import _IVF_NLIST, _ivf_cells_scalable
    from industry_big_data_time_sequence_process_spark.sources.io import load
    e = load(spark, SF_T2, "embeddings")
    cells = _ivf_cells_scalable(e)
    n = e.count()
    assert cells.count() == n
    assert cells.select("vec_id").distinct().count() == n
    assert cells.select("cid").distinct().count() <= _IVF_NLIST


def test_scalable_topk_scores_sane(spark):
    """Scalable-index search returns top-3 per query with scores bounded
    by the brute-force optimum (an ANN result can never beat exact)."""
    bf = {(r["q_vec_id"], r["rnk"]): r["score"]
          for r in REGISTRY["sim_cosine_topk"].fn(spark, SF_T2).collect()
          if r["rnk"] <= 3}
    ann = {(r["q_vec_id"], r["rnk"]): r["score"]
           for r in REGISTRY["sim_ivf_scalable_topk"].fn(spark, SF_T2)
           .collect()}
    # every query answered (queries are vec_id < 8 and cells are nonempty)
    assert {q for q, _ in ann} == {q for q, _ in bf}
    for k, s in ann.items():
        if k in bf:
            assert s <= bf[k] + 1e-9, (k, s, bf[k])


def test_recall_operating_point_production_credible(spark):
    """VERDICT r5 #1 done-criterion: the shipped ANN operating points
    must be production-credible, not just value-oracled. Composed IVF+PQ
    cascade (trained codebooks, 3x multi-assign, exact re-rank tail)
    recall@5 >= 0.5 at nprobe=2; PQ-alone cascade recall@5 >= 0.7.
    (Round-5 shipped 0.150 / 0.113 — near-random retrieval.)"""
    rows = REGISTRY["sim_ivfpq_recall_eval"].fn(spark, SF_T2).collect()
    r2 = sum(r["recall_p2"] for r in rows) / len(rows)
    r1 = sum(r["recall_p1"] for r in rows) / len(rows)
    assert r2 >= 0.5, f"composed recall@5 at nprobe=2 = {r2}"
    assert r2 >= r1, (r1, r2)   # the nprobe dial must buy recall
    rows = REGISTRY["sim_pq_recall_eval"].fn(spark, SF_T2).collect()
    rp = sum(r["recall_at_5"] for r in rows) / len(rows)
    assert rp >= 0.7, f"PQ cascade recall@5 = {rp}"
