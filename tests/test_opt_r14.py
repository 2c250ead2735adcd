"""Round-14 optimization twins: every rewrite this round ships with a
bit-identity pin against the formulation it replaced (the same
discipline as tests/test_opt_r13.py) — the oracle-parity gate re-proves
end-to-end values, these prove the REWRITE is the identity."""
import pytest
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    similarity as S)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_SMOKE, SF_T2


def _jvm_serve(qdf, corpus, cent, cb, e, nprobe):
    """The pre-r14 JVM serve cascade, inlined verbatim: probe and dtab
    as Spark subplans, then the shared ADC agg + shortlist + re-rank."""
    qprobe = S._ivf_probe(qdf, cent, nprobe)
    q = qdf.select(F.col("vec_id").alias("q_vec_id"),
                   F.col("embedding").alias("qemb"))
    dtab = S._pq_dtab_frame(q, cb).withColumnRenamed("q_vec_id", "dq")
    cand = (corpus.join(F.broadcast(qprobe), "cid")
                  .filter(F.col("vec_id") != F.col("q_vec_id")))
    scored = (cand.join(F.broadcast(dtab),
                        (F.col("q_vec_id") == F.col("dq"))
                        & (F.col("m") == F.col("qm"))
                        & (F.col("code") == F.col("k")))
                  .groupBy("q_vec_id", F.col("vec_id").alias("c_vec_id"))
                  .agg(F.min("pr").alias("pr"),
                       F.expr(f"sum(dfx) * {S._PQ_M} div count(*)")
                        .alias("adfx")))
    return (S._exact_rerank(S._pq_shortlist(scored, "pr"), q, e)
            .select("q_vec_id", "c_vec_id",
                    F.round(F.col("tfx") / F.lit(S._PQ_FX), 6).alias("dist"),
                    F.col("pr").alias("probe_rank"), "rnk"))


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_T2])
def test_serve_local_frames_equal_jvm(spark, sf_dir):
    """The driver numpy probe/dtab local relations are bit-identical to
    the JVM ``_ivf_probe`` / ``_pq_dtab_frame`` frames they replace."""
    e = load(spark, sf_dir, "embeddings")
    corpus, cent, cb = S._ivfpq_index(e)
    qdf = e.filter(F.col("vec_id") < S._N_QUERIES)
    np_auto = S._ivf_nprobe(S._ivf_nlist(e.count()))
    local = S._serve_local_frames(qdf, cent, cb, np_auto)
    assert local is not None
    lp = sorted((int(a), int(b), int(c)) for a, b, c in local[1].collect())
    jp = sorted((int(a), int(b), int(c)) for a, b, c in
                S._ivf_probe(qdf, cent, np_auto).collect())
    assert lp == jp
    q = qdf.select(F.col("vec_id").alias("q_vec_id"),
                   F.col("embedding").alias("qemb"))
    ld = sorted((int(a), int(b), int(c), int(d))
                for a, b, c, d in local[2].collect())
    jd = sorted((int(a), int(b), int(c), int(d)) for a, b, c, d in
                S._pq_dtab_frame(q, cb).collect())
    assert ld == jd
    # qemb local relation carries the exact float->double widenings
    lq = {int(r["q_vec_id"]): list(r["qemb"]) for r in local[0].collect()}
    jq = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
          for r in qdf.collect()}
    assert lq == jq


def test_gated_serve_equals_jvm_serve(spark):
    """End-to-end: the gated serve cascade returns row-identical results
    to the pre-r14 JVM cascade (which the DuckDB oracle pins)."""
    e = load(spark, SF_T2, "embeddings")
    corpus, cent, cb = S._ivfpq_index(e)
    corpus = corpus.cache()
    try:
        qdf = e.filter(F.col("vec_id") < S._N_QUERIES)
        np_auto = S._ivf_nprobe(S._ivf_nlist(e.count()))
        got = sorted(tuple(r) for r in S._ivfpq_serve_topk(
            qdf, corpus, cent, cb, e, nprobe=np_auto).collect())
        ref = sorted(tuple(r) for r in _jvm_serve(
            qdf, corpus, cent, cb, e, np_auto).collect())
        assert got == ref
    finally:
        corpus.unpersist()


def test_serve_gate_falls_back_above_cap(spark, monkeypatch):
    """Above the query cap the gate returns None and the JVM twins run
    (the scale path) — and the results are the same either way."""
    e = load(spark, SF_SMOKE, "embeddings")
    corpus, cent, cb = S._ivfpq_index(e)
    qdf = e.filter(F.col("vec_id") < S._N_QUERIES)
    monkeypatch.setattr(S, "_SERVE_DRIVER_MAX_Q", 2)  # force fallback
    assert S._serve_local_frames(qdf, cent, cb, 2) is None
    got = sorted(tuple(r) for r in S._ivfpq_serve_topk(
        qdf, corpus, cent, cb, e, nprobe=2).collect())
    monkeypatch.setattr(S, "_SERVE_DRIVER_MAX_Q", 64)
    ref = sorted(tuple(r) for r in S._ivfpq_serve_topk(
        qdf, corpus, cent, cb, e, nprobe=2).collect())
    assert got == ref


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_T2])
def test_fused_assign_code_equals_two_pass(spark, sf_dir):
    """The fused assign+code Arrow pass emits exactly the rows the
    chained _ivf_assign -> _pq_codes_with_cid twins produced."""
    e = load(spark, sf_dir, "embeddings")
    n = e.count()
    rows = (e.select("vec_id", "embedding", S._hv_col().alias("hv"))
             .orderBy("hv", "vec_id")
             .limit(max(S._ivf_train_cap(S._ivf_nlist(n)),
                        S._PQ_TRAIN_CAP)).collect())
    cent = S._ivf_train_capped(e, n=n, sample_rows=rows)
    cb = S._pq_codebook(e, sample_rows=rows)
    cids, C = S._cent_bank(cent)
    banks = S._pq_code_banks(cb)
    fused = e.select("vec_id", "embedding").mapInArrow(
        S._assign_code_batches(cids, C, S._IVF_NASSIGN, banks),
        "vec_id long, cid long, m int, code long")
    two_pass = S._pq_codes_with_cid(
        S._ivf_assign(e, cent, nprobe=S._IVF_NASSIGN), cb)
    got = sorted(tuple(r) for r in fused.collect())
    ref = sorted(tuple(r) for r in two_pass.collect())
    assert got == ref


def test_attached_banks_match_collected(spark):
    """The banks attached at build time equal what a fresh collect of
    the same frames produces (the storage-path fallback)."""
    import numpy as np
    e = load(spark, SF_SMOKE, "embeddings")
    corpus, cent, cb = S._ivfpq_index(e)
    att = S._cent_bank(cent)
    cent2 = cent.sparkSession.createDataFrame(
        cent.collect(), cent.schema)  # strips the attribute
    col = S._cent_bank(cent2)
    assert np.array_equal(att[0], col[0])
    assert np.array_equal(att[1], col[1])
    att_rows = sorted((int(m), int(k), [float(x) for x in cw])
                      for m, k, cw in cb._graft_cb_rows)
    col_rows = sorted((int(r["m"]), int(r["k"]),
                       [float(x) for x in r["cw"]]) for r in cb.collect())
    assert att_rows == col_rows
