"""Round-13 optimization twins: the driver-side numpy trainers and the
aggregation-based argmax picks must be BIT-IDENTICAL to the distributed
formulations they replaced (the oracle-parity gate re-proves every
registered op against DuckDB; these pins localize a future drift to the
exact helper that moved)."""
import pytest
from pyspark.sql import Window, functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    similarity as S,
)
from industry_big_data_time_sequence_process_spark.operators.similarity import (
    _dot, _ivf_assign, _ivf_train_capped, _pq_codebook, _pq_codebook_dist,
)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.smoke
def test_pq_codebook_driver_equals_distributed(spark):
    """The numpy PQ trainer vs the distributed twin: every (m, k)
    codeword, every component, exactly equal (IEEE-double identity —
    the fixed-point discipline makes both order-invariant)."""
    e = load(spark, SF_T2, "embeddings")
    a = _pq_codebook(e)
    b = _pq_codebook_dist(e)
    ra = _rows(a, ["m", "k", "cw"])
    rb = _rows(b, ["m", "k", "cw"])
    a.unpersist()
    b.unpersist()
    assert len(ra) > 0 and ra == rb


def test_ivf_train_capped_driver_equals_distributed(spark, monkeypatch):
    """Forcing the pair budget to 0 routes _ivf_train_capped through the
    distributed _lloyd; the default routes it through the numpy twin.
    Both centroid sets must match exactly, cid for cid."""
    e = load(spark, SF_T2, "embeddings")
    a = _ivf_train_capped(e)
    ra = _rows(a, ["cid", "cemb"])
    a.unpersist()
    monkeypatch.setattr(S, "_DRIVER_TRAIN_MAX_PAIRS", 0)
    b = _ivf_train_capped(e)
    rb = _rows(b, ["cid", "cemb"])
    b.unpersist()
    assert len(ra) > 0 and ra == rb


@pytest.mark.smoke
def test_pq_codes_arrow_equals_jvm(spark):
    """The Arrow-batched numpy PQ coder vs the JVM crossJoin/argmin
    twin: identical (vec_id, m, code) sets."""
    from industry_big_data_time_sequence_process_spark.operators.similarity import (
        _pq_codes, _pq_codes_jvm,
    )
    e = load(spark, SF_T2, "embeddings")
    cb = _pq_codebook(e)
    ra = _rows(_pq_codes(e, cb), ["vec_id", "m", "code"])
    rb = _rows(_pq_codes_jvm(e, cb), ["vec_id", "m", "code"])
    cb.unpersist()
    assert len(ra) > 0 and ra == rb


@pytest.mark.smoke
def test_afp_fps_arrow_equals_jvm(spark):
    """The numpy fingerprint windower vs the JVM byte-explode twin:
    identical (doc_id, ord, fp) streams over the decoded corpus."""
    from industry_big_data_time_sequence_process_spark.operators.multimodal import (
        _afp_fps, _afp_fps_jvm, _audio_pcm_batches,
    )
    d = load(spark, SF_T2, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob"))
    pcm = d.mapInPandas(_audio_pcm_batches, "doc_id long, pcm binary")
    ra = _rows(_afp_fps(pcm), ["doc_id", "ord", "fp"])
    rb = _rows(_afp_fps_jvm(pcm), ["doc_id", "ord", "fp"])
    assert len(ra) > 0 and ra == rb


@pytest.mark.smoke
def test_video_sigs_arrow_equals_jvm(spark):
    """The numpy block-pooling signature pass vs the JVM byte-explode
    twin: identical (doc_id, frame, sig) streams."""
    from industry_big_data_time_sequence_process_spark.operators.multimodal import (
        _video_sigs, _video_sigs_jvm,
    )
    ra = _rows(_video_sigs(spark, SF_T2), ["doc_id", "frame", "sig"])
    rb = _rows(_video_sigs_jvm(spark, SF_T2), ["doc_id", "frame", "sig"])
    assert len(ra) > 0 and ra == rb


def test_ivf_assign_agg_equals_window_pick(spark):
    """_ivf_assign's max(struct) aggregation (nprobe=1) and narrow
    window + re-join (nprobe=3) vs the original wide-row window
    formulation, on the trained centroids: identical row sets."""
    e = load(spark, SF_T2, "embeddings")
    cent = _ivf_train_capped(e)
    norm_e = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    norm_c = F.sqrt(_dot(F.col("cemb"), F.col("cemb")))
    ev = e.select("vec_id", "embedding", norm_e.alias("_nv"))
    cv = cent.select("cid", "cemb", norm_c.alias("_nc"))
    w = Window.partitionBy("vec_id").orderBy(F.col("_c").desc(), "cid")
    for nprobe in (1, 3):
        legacy = (ev.crossJoin(F.broadcast(cv))
                    .withColumn("_c", _dot(F.col("embedding"), F.col("cemb"))
                                / (F.col("_nv") * F.col("_nc")))
                    .withColumn("r", F.row_number().over(w))
                    .filter(F.col("r") <= nprobe)
                    .select("vec_id", "embedding", "cid"))
        got = _ivf_assign(e, cent, nprobe=nprobe)
        assert _rows(got, ["vec_id", "cid"]) == \
            _rows(legacy, ["vec_id", "cid"]), f"nprobe={nprobe}"
    cent.unpersist()


@pytest.mark.smoke
def test_ivf_assign_arrow_equals_jvm(spark):
    """The Arrow-batched numpy assigner (bank in the task closure) vs
    the JVM broadcast-join twin: identical (vec_id, cid) sets AND
    bit-identical embedding passthrough, at nprobe 1 and 3."""
    from industry_big_data_time_sequence_process_spark.operators.similarity import (
        _ivf_assign_jvm,
    )
    e = load(spark, SF_T2, "embeddings")
    cent = _ivf_train_capped(e)
    for nprobe in (1, 3):
        ra = _rows(_ivf_assign(e, cent, nprobe),
                   ["vec_id", "cid", "embedding"])
        rb = _rows(_ivf_assign_jvm(e, cent, nprobe),
                   ["vec_id", "cid", "embedding"])
        assert len(ra) > 0 and ra == rb, f"nprobe={nprobe}"
    cent.unpersist()


@pytest.mark.smoke
def test_unit_vectors_arrow_equals_jvm(spark):
    """The Arrow numpy unit normalizer vs the inline-HOF twin: every
    component of every unit vector exactly equal (same LTR norm fold,
    same per-element IEEE division)."""
    from industry_big_data_time_sequence_process_spark.operators.similarity import (
        _unit_vectors, _unit_vectors_jvm,
    )
    e = load(spark, SF_T2, "embeddings")
    ra = _rows(_unit_vectors(e), ["vec_id", "ue"])
    rb = _rows(_unit_vectors_jvm(e), ["vec_id", "ue"])
    assert len(ra) > 0 and ra == rb


@pytest.mark.smoke
def test_embcos_bank_equals_join(spark):
    """The Arrow bank all-pairs cosine vs the join twin: identical
    (vec1, vec2, cosine) rows (same LTR folds, same HALF_UP round)."""
    from industry_big_data_time_sequence_process_spark.operators.similarity import (
        _emb_bank, _embcos_batches, _embcos_pairs_jvm,
    )
    e = load(spark, SF_T2, "embeddings")
    ids, U = _emb_bank(e)
    got = (e.select("vec_id", "embedding")
            .mapInArrow(_embcos_batches(ids, U, 0.35),
                        "vec1 long, vec2 long, score double")
            .select("vec1", "vec2", F.round("score", 6).alias("cosine")))
    ra = _rows(got, ["vec1", "vec2", "cosine"])
    rb = _rows(_embcos_pairs_jvm(e), ["vec1", "vec2", "cosine"])
    assert len(ra) > 0 and ra == rb
