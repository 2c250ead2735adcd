"""Multimodal-column plumbing (driver-mandated, SURVEY.md §2 preface):
image/audio/video as opaque ``binary`` columns with typed metadata.

Image DECODE (round 5) carries a REAL PIL branch behind a capability
probe (:func:`_codec`): blobs a present codec decodes report true
width/height/bands, everything else falls back to a deterministic
byte-length fake — so the op runs identically on this codec-less
container and on a codec-equipped cluster, and the real branch is
goldened on synthetic PNG bytes (tests/test_multimodal.py). Audio/video
remain plan-level stubs (no librosa/cv2 anywhere), but all Spark-side
plumbing is real and tested: binary columns, schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning.

The ``documents`` table stands in for a media table: ``text`` bytes play
the role of an encoded blob; ``n_chars`` plays the byte-size metadata.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import op
from ..sources.io import load


@op("mm_binary_meta", oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(hex(encode(text))) AS content_md5,
       substr(hex(encode(text)), 1, 16) AS magic_hex
FROM documents
""", tier=2, section="2.11")
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction: byte length, content hash,
    magic-bytes prefix — the scan-side triage every media pipeline runs
    before decode. All JVM-side built-ins over a true BinaryType column.

    (Hash is md5-of-hex: DuckDB 1.0 has no md5 over BLOB, and Spark's
    base64 MIME-chunks long values with CRLFs — hex is the stable common
    string form, identical uppercase on both engines.)
    """
    d = load(spark, sf_dir, "documents")
    bin_col = F.encode("text", "utf-8")
    hx = F.hex(bin_col)
    return d.select(
        "doc_id",
        F.length(bin_col).cast("long").alias("n_bytes"),
        F.md5(hx).alias("content_md5"),
        F.substring(hx, 1, 16).alias("magic_hex"),
    )


@op("mm_frame_sample", oracle="""
SELECT doc_id,
       unnest(generate_series(0, CAST(n_chars % 100 AS INT), 10)) AS frame_idx,
       CAST(n_chars % 100 + 1 AS BIGINT) AS n_frames
FROM documents
""", tier=2, section="2.11")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for a 'video' column: emit every 10th frame
    index per asset (frame count derived from metadata; here a
    deterministic fake ``n_chars % 100 + 1``). The explode(sequence)
    shape is exactly the real op — per-asset fan-out rows that a decode
    UDF then maps over. JVM-side, no UDF needed for the PLAN itself."""
    d = load(spark, sf_dir, "documents")
    n_frames = (F.col("n_chars") % 100 + 1).cast("long")
    return d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_chars") % 100).cast("int"),
                       F.lit(10))
        ).alias("frame_idx"),
        n_frames.alias("n_frames"),
    )


def _codec():
    """The capability probe: PIL's Image module when importable, else
    None (this container ships no codec; a codec-equipped cluster flips
    the real branch on with zero code change)."""
    try:
        import PIL.Image
        return PIL.Image
    except ImportError:
        return None


def _fallback_dims(n_bytes: int):
    """Deterministic metadata for blobs the codec can't (or isn't there
    to) decode — a pure function of byte length, identical to the
    DuckDB oracle's arithmetic, so the documents demo value-checks in
    codec-less AND codec-equipped environments (utf-8 text bytes are
    not a valid image either way)."""
    return n_bytes % 640 + 1, n_bytes % 480 + 1, 3, 0


def _decode_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch image decode: real ``mapInPandas`` plumbing, REAL
    codec when present (round 5 — the r4 stub raised if PIL existed).

    Per blob: try ``Image.open`` (header-only — PIL reads size/bands
    lazily, so no pixel decode cost for metadata); on success emit true
    width/height/band-count with ``decode_ok = 1``, on failure (or with
    no codec installed) the deterministic byte-length fallback with
    ``decode_ok = 0``. Codecs are inherently per-blob, so the inner loop
    is per-row by necessity; the batching, schema, and partition
    parallelism are the production shape either way.
    """
    import io

    image_mod = _codec()

    def meta(blob):
        if blob is None:
            return _fallback_dims(0)
        if image_mod is not None:
            try:
                with image_mod.open(io.BytesIO(blob)) as im:
                    return (im.size[0], im.size[1],
                            len(im.getbands()), 1)
            except Exception:
                pass
        return _fallback_dims(len(blob))

    for pdf in batches:
        rows = [meta(b) for b in pdf["blob"]]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": pd.Series([r[0] for r in rows], dtype="int32"),
            "height": pd.Series([r[1] for r in rows], dtype="int32"),
            "n_channels": pd.Series([r[2] for r in rows], dtype="int32"),
            "decode_ok": pd.Series([r[3] for r in rows], dtype="int32"),
        })


@op("mm_image_decode", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
       3 AS n_channels,
       0 AS decode_ok
FROM documents
""", tier=2, section="2.11")
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode / feature-extract over binary columns via
    ``mapInPandas`` — Arrow-batched, partition-parallel, with a REAL
    PIL branch behind the capability probe (``_codec``; the r4
    ``mm_image_decode_stub`` inverted the guard and is gone). The demo
    feeds utf-8 text bytes, which no codec decodes, so the oracle states
    the deterministic fallback (``decode_ok = 0``) and holds in both
    codec-less and codec-equipped environments; the REAL branch is
    goldened on synthetic in-repo PNG bytes in tests/test_multimodal.py."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob"))
    return d.mapInPandas(
        _decode_meta_batches,
        "doc_id long, width int, height int, n_channels int, decode_ok int",
    )


def _resize_plan_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch letterbox-resize planner: real mapInPandas plumbing,
    arithmetic only (the actual pixel resample would live behind the same
    signature with a codec present). Deterministic: dims come from the
    same fake as ``_decode_meta_batches``."""
    target = 224.0
    for pdf in batches:
        n = pdf["blob"].str.len().fillna(0).astype("int64")
        w = (n % 640 + 1).astype("float64")
        h = (n % 480 + 1).astype("float64")
        scale = (target / w).combine(target / h, min)
        new_w = (w * scale).round(0).astype("int32")
        new_h = (h * scale).round(0).astype("int32")
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "scale": scale.round(6),
            "new_w": new_w,
            "new_h": new_h,
            "pad_x": ((224 - new_w) // 2).astype("int32"),
            "pad_y": ((224 - new_h) // 2).astype("int32"),
        })


@op("mm_resize_stub", oracle="""
SELECT doc_id,
       round(least(224.0 / w, 224.0 / h), 6) AS scale,
       CAST(round(w * least(224.0 / w, 224.0 / h), 0) AS INT) AS new_w,
       CAST(round(h * least(224.0 / w, 224.0 / h), 0) AS INT) AS new_h,
       CAST((224 - CAST(round(w * least(224.0 / w, 224.0 / h), 0) AS INT))
            // 2 AS INT) AS pad_x,
       CAST((224 - CAST(round(h * least(224.0 / w, 224.0 / h), 0) AS INT))
            // 2 AS INT) AS pad_y
FROM (
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 640 + 1 AS DOUBLE) AS w,
           CAST(octet_length(encode(text)) % 480 + 1 AS DOUBLE) AS h
    FROM documents
)
""", tier=3, section="2.11")
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving letterbox resize to 224x224 — the model-input
    prep step — as ``mapInPandas`` over the binary column. Pixel work is
    stubbed (no codec in container); the geometry math, Arrow batching,
    schema and partition-parallel shape are the production ones, and the
    oracle value-checks the geometry end to end."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob"))
    return d.mapInPandas(
        _resize_plan_batches,
        "doc_id long, scale double, new_w int, new_h int, pad_x int, pad_y int",
    )


@op("mm_audio_chunks", oracle="""
SELECT doc_id, n_samples,
       unnest(generate_series(0, n_samples - 16000, 8000)) AS start_sample,
       8000 AS hop, 16000 AS win
FROM (
    SELECT doc_id,
           CAST(octet_length(encode(text)) * 40 AS BIGINT) AS n_samples
    FROM documents
)
WHERE n_samples >= 16000
""", tier=3, section="2.11")
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing plan for an 'audio' blob column: 1-s windows
    (16 000 samples @16 kHz) hopping every 0.5 s — the feature-extraction
    fan-out (STFT/mel would map over these rows behind the same schema).
    Sample count is a deterministic fake (bytes x 40, i.e. pretending
    ~25 µs of audio per byte); the explode(sequence) fan-out, schema and
    per-asset row shape are the production ones. Windows are emitted only
    while fully inside the clip (start + win <= n_samples).
    """
    d = load(spark, sf_dir, "documents")
    n_samples = (F.length(F.encode("text", "utf-8")) * 40).cast("long")
    return (
        d.select("doc_id", n_samples.alias("n_samples"))
         .filter(F.col("n_samples") >= 16000)
         .select(
             "doc_id", "n_samples",
             F.explode(F.sequence(
                 F.lit(0).cast("long"),
                 F.col("n_samples") - 16000,
                 F.lit(8000).cast("long"))).alias("start_sample"),
             F.lit(8000).alias("hop"),
             F.lit(16000).alias("win"),
         )
    )
