"""Goldens for the image-decode capability split (VERDICT r4 #4):

- the FALLBACK path (codec absent or blob undecodable) must emit the
  deterministic byte-length metadata the DuckDB oracle states;
- the REAL branch must emit true (width, height, bands, decode_ok=1)
  for valid image bytes — exercised two ways: through a minimal
  injected codec (control-flow golden, runs everywhere) and through
  actual PIL on deterministic in-repo synthetic PNG bytes (skipped only
  where PIL is not installed).

The synthetic PNG is built from stdlib zlib+struct — no image library
needed to CREATE the fixture, only to decode it.
"""
import struct
import zlib

import pandas as pd
import pytest

from industry_big_data_time_sequence_process_spark.operators import multimodal

#: Golden image geometry: tiny, odd sizes so width/height can't be
#: confused with each other or with any fallback value.
W, H = 5, 3


def synthetic_png(width: int = W, height: int = H) -> bytes:
    """A valid minimal 8-bit RGB PNG, deterministic bytes."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 7) % 256 for x in range(width * 3))
        for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _decode(blobs):
    pdf = pd.DataFrame({"doc_id": range(len(blobs)), "blob": blobs})
    out = list(multimodal._decode_meta_batches(iter([pdf])))
    assert len(out) == 1
    return out[0]


def test_fallback_path_matches_oracle_arithmetic(monkeypatch):
    monkeypatch.setattr(multimodal, "_codec", lambda: None)
    blob = b"not an image, 27 bytes long"
    got = _decode([blob, None]).to_dict("records")
    n = len(blob)
    assert got[0] == {"doc_id": 0, "width": n % 640 + 1,
                      "height": n % 480 + 1, "n_channels": 3,
                      "decode_ok": 0}
    assert got[1] == {"doc_id": 1, "width": 1, "height": 1,
                      "n_channels": 3, "decode_ok": 0}


def test_real_branch_control_flow_with_injected_codec(monkeypatch):
    """The real branch must take codec-reported metadata on success and
    fall back per-blob on failure — verified with a minimal injected
    codec so the control flow is pinned even on codec-less containers."""

    class FakeImage:
        size = (W, H)

        def getbands(self):
            return ("R", "G", "B", "A")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeCodec:
        @staticmethod
        def open(fh):
            if fh.read(8) == b"\x89PNG\r\n\x1a\n":
                return FakeImage()
            raise OSError("cannot identify image file")

    monkeypatch.setattr(multimodal, "_codec", lambda: FakeCodec)
    good, bad = synthetic_png(), b"xx"
    got = _decode([good, bad]).to_dict("records")
    assert got[0] == {"doc_id": 0, "width": W, "height": H,
                      "n_channels": 4, "decode_ok": 1}
    assert got[1] == {"doc_id": 1, "width": len(bad) % 640 + 1,
                      "height": len(bad) % 480 + 1, "n_channels": 3,
                      "decode_ok": 0}


def test_real_codec_decodes_synthetic_png():
    """r7: the probe always returns a working codec now (PIL when
    installed, the in-repo pure-Python PNG reader otherwise — VERDICT
    r6 #5), so the real branch executes everywhere and this test never
    skips."""
    assert multimodal._codec() is not None
    got = _decode([synthetic_png()]).to_dict("records")[0]
    assert got == {"doc_id": 0, "width": W, "height": H,
                   "n_channels": 3, "decode_ok": 1}


def test_purepng_pixels_roundtrip():
    """The pure decoder must return the EXACT pixel bytes the fixture
    encoded (every scanline uses filter 0 here), and handle each other
    filter type via PIL-free re-encodings."""
    import io

    from industry_big_data_time_sequence_process_spark.operators import (
        purepng)

    im = purepng.open(io.BytesIO(synthetic_png()))
    assert im.size == (W, H) and im.getbands() == ("R", "G", "B")
    want = b"".join(bytes((x * 7) % 256 for x in range(W * 3))
                    for _ in range(H))
    assert im.tobytes() == want

    def png_with_filter(ftype: int) -> tuple[bytes, bytes]:
        """2x2 RGB image encoded with one non-zero filter row."""
        row0 = bytes([10, 20, 30, 40, 50, 60])
        row1 = bytes([15, 25, 35, 45, 55, 65])
        if ftype == 1:      # Sub: x - left
            f1 = bytes([15, 25, 35, (45 - 15) % 256, (55 - 25) % 256,
                        (65 - 35) % 256])
        elif ftype == 2:    # Up: x - up
            f1 = bytes((b - a) % 256 for a, b in zip(row0, row1))
        elif ftype == 3:    # Average
            f1 = bytearray()
            for i in range(6):
                left = row1[i - 3] if i >= 3 else 0
                f1.append((row1[i] - ((left + row0[i]) >> 1)) % 256)
            f1 = bytes(f1)
        else:               # Paeth
            f1 = bytearray()
            for i in range(6):
                a = row1[i - 3] if i >= 3 else 0
                c = row0[i - 3] if i >= 3 else 0
                f1.append((row1[i] - purepng._paeth(a, row0[i], c)) % 256)
            f1 = bytes(f1)
        raw = b"\x00" + row0 + bytes([ftype]) + f1

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload)))

        blob = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2,
                                             0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))
        return blob, row0 + row1

    for ftype in (1, 2, 3, 4):
        blob, want = png_with_filter(ftype)
        got = purepng.open(io.BytesIO(blob))
        assert got.tobytes() == want, f"filter {ftype}"


def test_purepng_rejects_garbage_and_corruption():
    import io

    import pytest as _pytest

    from industry_big_data_time_sequence_process_spark.operators import (
        purepng)

    with _pytest.raises(OSError):
        purepng.open(io.BytesIO(b"not a png"))
    good = bytearray(synthetic_png())
    good[-5] ^= 0xFF        # corrupt the IEND CRC
    with _pytest.raises(OSError):
        purepng.open(io.BytesIO(bytes(good)))
    with _pytest.raises(OSError):
        purepng.open(io.BytesIO(synthetic_png()[:30]))  # truncated


def test_synthetic_png_fixture_is_deterministic():
    assert synthetic_png() == synthetic_png()
    # pinned prefix: PNG magic + IHDR with the golden geometry
    assert synthetic_png()[:24].endswith(struct.pack(">II", W, H))


def test_mapinpandas_surface(spark):
    """End-to-end through Spark: binary column in, metadata rows out,
    real Arrow batching — the production plumbing, not just pandas."""
    df = spark.createDataFrame(
        [(1, synthetic_png()), (2, b"junk"), (3, None)],
        "doc_id long, blob binary")
    out = {r["doc_id"]: r.asDict() for r in df.mapInPandas(
        multimodal._decode_meta_batches,
        "doc_id long, width int, height int, n_channels int, decode_ok int",
    ).collect()}
    if multimodal._codec() is not None:
        assert out[1] == {"doc_id": 1, "width": W, "height": H,
                          "n_channels": 3, "decode_ok": 1}
    else:
        n = len(synthetic_png())
        assert out[1] == {"doc_id": 1, "width": n % 640 + 1,
                          "height": n % 480 + 1, "n_channels": 3,
                          "decode_ok": 0}
    assert out[2]["decode_ok"] == 0 and out[3]["width"] == 1


# ---------------------------------------------------------------------------
# Round-6 content-level ops (VERDICT r5 #5): perceptual-hash image dedup
# sensitivity on planted synthetic image blobs, and the audio-fingerprint
# twin on the real corpus's planted near-dup documents.
# ---------------------------------------------------------------------------

import math
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import SF_T2
from .parity import assert_parity

N_BASE = 40      # distinct synthetic "images"
N_PLANTED = 10   # of which the first 10 get a patched near-dup at id+100
PATCH = 8        # patched chars — tuned so planted pairs land <= hamming 8
#                  while the closest unrelated pair measures 10


def _image_text(seed: int) -> str:
    """A 64x64 'image': a smooth random 2D field rendered as ASCII bytes
    (chars 33..125 <-> brightness), so byte values ARE pixel values."""
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


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthetic_images_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    docs = {i: _image_text(i) for i in range(N_BASE)}
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
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_phash_finds_planted_image_dups(spark, image_dir):
    """Sensitivity: every planted patched pair is found; nothing else is
    (the closest unrelated pair of random fields measures hamming 10 >
    the verified threshold 8)."""
    rows = REGISTRY["mm_phash_dedup"].fn(spark, image_dir).collect()
    got = {(r["doc1"], r["doc2"]) for r in rows}
    want = {(i, 100 + i) for i in range(N_PLANTED)}
    assert got == want, got.symmetric_difference(want)
    assert all(r["hamming"] <= 8 for r in rows)


def test_phash_parity_on_image_fixture(spark, image_dir):
    """The cross-engine value check holds on a corpus where the hash
    actually fires (the prose corpus exercises only the empty case)."""
    op = REGISTRY["mm_phash_dedup"]
    assert_parity(spark, op.fn, op.oracle, image_dir, key="mm_phash@img")


def test_phash_no_false_positives_on_prose(spark):
    """Precision: prose documents contain no image-like near-dups; the
    production-width hash must report NONE (the 15-bit prototype
    reported 1954 chance collisions on this exact corpus)."""
    assert REGISTRY["mm_phash_dedup"].fn(spark, SF_T2).count() == 0


def test_audio_fingerprint_finds_prefix_dups(spark):
    """The planted near-dup documents share long byte prefixes, so their
    aligned windows fingerprint identically — all five known prefix-dup
    pairs at sf0.01 must surface with match_frac >= 0.9."""
    rows = REGISTRY["mm_audio_fingerprint_dedup"].fn(spark, SF_T2).collect()
    got = {(r["doc1"], r["doc2"]) for r in rows}
    known = {(152, 178), (61, 185), (8, 245), (98, 290), (285, 301)}
    assert known <= got, known - got
    assert all(r["match_frac"] >= 0.9 for r in rows)


def test_scene_cuts_partition_frames(spark):
    """Scenes must PARTITION each asset's frames: contiguous, starting at
    frame 0 / scene 0, lengths summing to the full frame count."""
    rows = REGISTRY["mm_video_scene_cuts"].fn(spark, SF_T2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc, scenes in by_doc.items():
        scenes.sort(key=lambda r: r["scene_id"])
        assert scenes[0]["scene_id"] == 0 and scenes[0]["start_frame"] == 0
        nxt = 0
        for i, s in enumerate(scenes):
            assert s["scene_id"] == i, (doc, scenes)
            assert s["start_frame"] == nxt, (doc, scenes)
            nxt = s["start_frame"] + s["n_frames"]


def test_purepng_malformed_ihdr_raises_oserror():
    """A CRC-valid IHDR with the wrong declared length must raise the
    documented OSError, never struct.error (the PIL.Image.open contract
    callers catch against)."""
    import io

    import pytest

    from industry_big_data_time_sequence_process_spark.operators import purepng

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">II", 4, 4))  # 8 bytes, not 13
           + chunk(b"IDAT", zlib.compress(b"\x00" * 13))
           + chunk(b"IEND", b""))
    with pytest.raises(OSError):
        purepng.open(io.BytesIO(bad))


# ---------------------------------------------------------------------------
# Round-8 (VERDICT r7 #5): second stdlib codec — BMP through the SAME
# capability-probed interface, plus the decode -> phash end-to-end proof
# for BOTH formats.
# ---------------------------------------------------------------------------


def synthetic_bmp(width: int = W, height: int = H) -> bytes:
    """A valid minimal uncompressed 24-bit BMP with the SAME pixel values
    as synthetic_png() (so decode equivalence is testable): row x carries
    bytes (x*7)%256 in RGB order, stored bottom-up BGR with 4-byte row
    padding, deterministic bytes."""
    stride = (width * 3 + 3) & ~3
    rgb_row = bytes((x * 7) % 256 for x in range(width * 3))
    bgr_row = bytes(b for px in range(width)
                    for b in (rgb_row[3 * px + 2], rgb_row[3 * px + 1],
                              rgb_row[3 * px]))
    bgr_row += b"\x00" * (stride - len(bgr_row))
    pix = bgr_row * height                      # rows identical -> order-safe
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pix), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return hdr + dib + pix


def gray_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """8-bit grayscale-palette BMP around raw top-down pixel bytes."""
    stride = (width + 3) & ~3
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    rows = [pixels[y * width:(y + 1) * width].ljust(stride, b"\x00")
            for y in range(height)]
    pix = b"".join(reversed(rows))              # stored bottom-up
    off = 14 + 40 + len(pal)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                      len(pix), 2835, 2835, 256, 0)
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    return hdr + dib + pal + pix


def gray_png(pixels: bytes, width: int, height: int) -> bytes:
    """8-bit grayscale PNG around raw top-down pixel bytes."""
    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y * width:(y + 1) * width]
                   for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_real_codec_decodes_synthetic_bmp():
    """The SAME probe that decodes PNG must decode BMP — the codec
    interface is format-generic, not shaped around one decoder."""
    got = _decode([synthetic_bmp()]).to_dict("records")[0]
    assert got == {"doc_id": 0, "width": W, "height": H,
                   "n_channels": 3, "decode_ok": 1}


def test_purebmp_pixels_roundtrip():
    """Exact pixel recovery through the BGR swizzle, bottom-up row
    order, 4-byte padding, and the grayscale-palette path; unsupported
    variants raise OSError (the documented fallback contract)."""
    import io

    from industry_big_data_time_sequence_process_spark.operators import (
        purebmp)

    im = purebmp.open(io.BytesIO(synthetic_bmp()))
    assert im.size == (W, H) and im.getbands() == ("R", "G", "B")
    want = bytes((x * 7) % 256 for x in range(W * 3)) * H
    assert im.tobytes() == want

    px = bytes(range(35))[:5 * 7]               # 5x7 distinct grays
    im = purebmp.open(io.BytesIO(gray_bmp(px, 5, 7)))
    assert im.size == (5, 7) and im.getbands() == ("L",)
    assert im.tobytes() == px                   # bottom-up undone exactly

    for bad in (b"xx", b"BM" + b"\x00" * 60,
                synthetic_png()):               # wrong signature for BMP
        with pytest.raises(OSError):
            purebmp.open(io.BytesIO(bad))


def test_codec_dispatch_routes_by_signature():
    """The dispatcher sends PNG bytes to purepng and BMP bytes to
    purebmp from ONE probe result, and raises on unknown signatures —
    pinned against the dispatcher directly so a PIL-equipped container
    still tests the in-repo routing path."""
    import io

    from industry_big_data_time_sequence_process_spark.operators.multimodal \
        import _PureCodecDispatch as d

    assert d.open(io.BytesIO(synthetic_png())).getbands() == ("R", "G", "B")
    assert d.open(io.BytesIO(synthetic_bmp())).size == (W, H)
    with pytest.raises(OSError):
        d.open(io.BytesIO(b"GIF89a not registered"))


@pytest.mark.parametrize("encoder", [gray_png, gray_bmp],
                         ids=["png", "bmp"])
def test_decode_to_phash_finds_planted_dups(spark, tmp_path, encoder):
    """END-TO-END for both formats (VERDICT r7 #5 done-criterion):
    planted near-dup IMAGES encoded as real PNG/BMP bytes -> decoded
    through the capability-probed REAL branch -> decoded pixels staged
    as the byte-grid corpus -> mm_phash_dedup finds exactly the planted
    pairs. The decode step is the real codec (pixel bytes round-trip
    through an actual container format), not the byte-sampling
    fallback."""
    import io

    codec = multimodal._codec()
    docs = {}
    for i in range(12):
        base = _image_text(i)
        docs[i] = base
        if i < 4:                               # planted near-dups
            t = list(base)
            for j in range(PATCH):
                t[(i * 97 + j * 3) % 4096] = chr(33 + ((i + j) % 90))
            docs[100 + i] = "".join(t)
    # encode -> REAL decode -> text reconstruction from decoded pixels
    decoded = {}
    for doc_id, text in docs.items():
        blob = encoder(text.encode("ascii"), 64, 64)
        with codec.open(io.BytesIO(blob)) as im:
            assert im.size == (64, 64) and im.getbands() == ("L",)
            decoded[doc_id] = im.tobytes().decode("ascii")
    assert decoded == docs                      # exact pixel round-trip
    d = tmp_path / "decoded_sf"
    d.mkdir()
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    ids = sorted(decoded)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([decoded[i] for i in ids], type=pa.string()),
        "lang": pa.array(["xx"] * len(ids), type=pa.string()),
        "source": pa.array(["synth"] * len(ids), type=pa.string()),
        "n_chars": pa.array([len(decoded[i]) for i in ids],
                            type=pa.int64()),
    }), d / "documents.parquet")
    rows = REGISTRY["mm_phash_dedup"].fn(spark, str(d)).collect()
    got = {(r["doc1"], r["doc2"]) for r in rows}
    assert got == {(i, 100 + i) for i in range(4)}, got


# --------------------------------------------------------------------------
# Round 10 (VERDICT r9 missing #1): real WAV (RIFF) decode — purewav pins,
# the audio capability probe, and the fingerprint-through-decode path.
# --------------------------------------------------------------------------

def synthetic_wav(samples, rate=8000, ch=1, bits=16, extra=b"") -> bytes:
    """A valid minimal linear-PCM RIFF/WAVE, deterministic bytes; built
    from stdlib struct only (the synthetic_png discipline). ``extra``
    injects additional chunks between fmt and data — container bytes
    change, audio does not."""
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    else:
        frames = bytes(samples)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + extra
    chunks += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


#: Golden clip: 512 samples with both fine- and coarse-scale variation so
#: sub-band energies (and therefore fingerprints) are non-degenerate.
def _clip_samples(seed: int = 0) -> list:
    return [((i * i * 37 + seed * 1009 + i * 515) % 32768)
            - 16384 for i in range(512)]


def test_purewav_exact_integer_samples():
    import io

    from industry_big_data_time_sequence_process_spark.operators import (
        purewav)

    s = [0, 1000, -1000, 32767, -32768, 5, -5, 12345]
    clip = purewav.open(io.BytesIO(synthetic_wav(s)))
    assert clip.samples() == s                      # bit-exact PCM16
    assert (clip.sample_rate, clip.n_channels, clip.n_samples) == (
        8000, 1, 8)
    assert list(clip.mono_u8()) == [((x >> 8) + 128) & 0xFF for x in s]
    # an extra LIST chunk changes container bytes, not the audio
    listed = synthetic_wav(
        s, extra=b"LIST" + struct.pack("<I", 6) + b"INFOxy")
    assert listed != synthetic_wav(s)
    assert purewav.open(io.BytesIO(listed)).samples() == s
    # stereo: channel 0; n_samples counts FRAMES
    st = purewav.open(io.BytesIO(synthetic_wav(
        [1, 100, 2, 200, 3, 300], ch=2)))
    assert st.n_samples == 3
    assert list(st.mono_u8()) == [((x >> 8) + 128) & 0xFF
                                  for x in (1, 2, 3)]
    # 8-bit: unsigned samples stored as-is
    e8 = purewav.open(io.BytesIO(synthetic_wav([10, 20, 255], bits=8)))
    assert e8.samples() == [10, 20, 255]
    assert e8.mono_u8() == bytes([10, 20, 255])


def test_purewav_rejects_prose_and_corruption():
    import io

    from industry_big_data_time_sequence_process_spark.operators import (
        purewav)

    for bad in (
        b"not audio at all, just prose bytes" * 4,
        b"RIFFxxxxWAVE",                            # no chunks
        b"RIFF" + struct.pack("<I", 1 << 20) + b"WAVE",  # size > payload
        synthetic_wav(_clip_samples())[:40],        # truncated
        # format tag 3 (IEEE float) must be refused, not misread
        synthetic_wav([1, 2, 3]).replace(
            b"fmt \x10\x00\x00\x00\x01\x00",
            b"fmt \x10\x00\x00\x00\x03\x00", 1),
    ):
        with pytest.raises(OSError):
            purewav.open(io.BytesIO(bad))


def test_audio_decode_real_and_fallback_branches(monkeypatch):
    wav = synthetic_wav(_clip_samples(), rate=16000)
    prose = b"definitely not a RIFF container"

    def run(blobs):
        pdf = pd.DataFrame({"doc_id": range(len(blobs)), "blob": blobs})
        out = list(multimodal._decode_audio_meta_batches(iter([pdf])))
        return out[0].to_dict("records")

    got = run([wav, prose, None])
    assert got[0] == {"doc_id": 0, "sample_rate": 16000, "n_channels": 1,
                      "n_samples": 512, "decode_ok": 1}
    assert got[1] == {"doc_id": 1, "sample_rate": 16000, "n_channels": 1,
                      "n_samples": len(prose) * 40, "decode_ok": 0}
    assert got[2] == {"doc_id": 2, "sample_rate": 16000, "n_channels": 1,
                      "n_samples": 0, "decode_ok": 0}
    # codec-less: even a real WAV takes the documented fallback
    monkeypatch.setattr(multimodal, "_audio_codec", lambda: None)
    assert run([wav])[0]["decode_ok"] == 0


def test_soundfile_adapter_wins_probe_when_importable(monkeypatch):
    """Control-flow pin for the codec-equipped branch: a (fake)
    importable soundfile must win the probe and be adapted to the
    PureWavClip surface — the library itself is absent here."""
    import sys
    import types

    import numpy as np

    fake = types.ModuleType("soundfile")

    def read(fh, dtype="int16", always_2d=True):
        assert dtype == "int16" and always_2d
        return np.array([[7], [-7], [300]], dtype="int16"), 22050

    fake.read = read
    monkeypatch.setitem(sys.modules, "soundfile", fake)
    codec = multimodal._audio_codec()
    assert codec is multimodal._SoundFileAdapter
    clip = codec.open(None)
    assert (clip.sample_rate, clip.n_channels, clip.n_samples) == (
        22050, 1, 3)
    assert clip.samples() == [7, -7, 300]


def test_audio_fingerprint_finds_dups_only_through_real_decode(spark):
    """THE round-10 pin: two clips with IDENTICAL audio but DIFFERENT
    container bytes (one carries an extra LIST chunk, shifting every
    byte offset after the header) are a dup pair through the decode
    path — and provably NOT through the byte-domain fallback, because
    the container shift misaligns every fingerprint window. A third,
    different clip must pair with neither."""
    s = _clip_samples(0)
    wav_a = synthetic_wav(s)
    wav_b = synthetic_wav(
        s, extra=b"LIST" + struct.pack("<I", 6) + b"INFOxy")
    wav_c = synthetic_wav(_clip_samples(9))
    assert wav_a != wav_b
    df = spark.createDataFrame(
        [(1, wav_a), (2, wav_b), (3, wav_c)], "doc_id long, blob binary")

    pcm = df.mapInPandas(multimodal._audio_pcm_batches,
                         "doc_id long, pcm binary")
    got = {(r["doc1"], r["doc2"]): r["match_frac"]
           for r in multimodal._afp_pairs(pcm).collect()}
    assert set(got) == {(1, 2)}, got
    assert got[(1, 2)] == 1.0                   # identical decoded PCM

    # byte-domain control: same frame, decode disabled -> no pair
    raw = df.selectExpr("doc_id", "blob AS pcm")
    assert multimodal._afp_pairs(raw).collect() == []


# --------------------------------------------------------------------------
# Round 10: real Y4M (YUV4MPEG2) decode — the video leg of the
# content-level triple (image: PNG/BMP, audio: WAV, video: Y4M).
# --------------------------------------------------------------------------

def synthetic_y4m(lumas, w=4, h=2, cspace="C420") -> bytes:
    """A valid minimal YUV4MPEG2 clip: one uniform-luma frame per entry
    of ``lumas``; chroma planes ride along at neutral 128 (C420/C444)
    or not at all (Cmono — keeps the whole stream ASCII for fixtures
    that must round-trip through a utf-8 text column)."""
    ysz = w * h
    chroma = {"C420": ysz // 4, "C444": ysz, "Cmono": 0}[cspace]
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 {cspace}\n".encode()]
    for v in lumas:
        out.append(b"FRAME\n" + bytes([v]) * ysz + bytes([128]) * (2 * chroma))
    return b"".join(out)


def test_purey4m_exact_luma_planes():
    import io

    from industry_big_data_time_sequence_process_spark.operators import (
        purey4m)

    clip = purey4m.open(io.BytesIO(synthetic_y4m([10, 200, 10])))
    assert clip.size == (4, 2) and clip.n_frames == 3
    assert clip.fps == (25, 1)
    assert clip.frame_luma(0) == bytes([10]) * 8      # exact Y plane
    assert clip.frame_luma(1) == bytes([200]) * 8
    assert clip.luma_sigs() == [10000, 200000, 10000]  # sum*1000//len
    # C444 and Cmono geometries parse too
    for cs in ("C444", "Cmono"):
        c = purey4m.open(io.BytesIO(synthetic_y4m([7, 9], cspace=cs)))
        assert c.n_frames == 2 and c.frame_luma(0) == bytes([7]) * 8
    # a non-uniform plane: signature is the exact integer mean
    raw = synthetic_y4m([0], w=2, h=2, cspace="Cmono")
    raw = raw.replace(b"FRAME\n" + bytes(4), b"FRAME\n" + bytes([1, 2, 3, 5]))
    assert purey4m.open(io.BytesIO(raw)).luma_sigs() == [11 * 1000 // 4]


def test_purey4m_rejects_prose_and_corruption():
    import io

    from industry_big_data_time_sequence_process_spark.operators import (
        purey4m)

    good = synthetic_y4m([10, 20])
    for bad in (
        b"just prose, nothing else" * 3,
        good[:30],                                  # truncated frame
        good.replace(b"C420", b"C999"),             # unknown colorspace
        good.replace(b"FRAME", b"FRAMA", 1),        # missing marker
        b"YUV4MPEG2 W0 H2 F25:1\n",                 # bad geometry
    ):
        with pytest.raises(OSError):
            purey4m.open(io.BytesIO(bad))


def test_video_decode_real_and_fallback_branches(monkeypatch):
    wav_like_prose = b"definitely not a video container blob"
    y4m = synthetic_y4m([10, 200, 10, 10])

    def run(blobs):
        pdf = pd.DataFrame({"doc_id": range(len(blobs)), "blob": blobs})
        out = list(multimodal._decode_video_meta_batches(iter([pdf])))
        return out[0].to_dict("records")

    got = run([y4m, wav_like_prose, None])
    assert got[0] == {"doc_id": 0, "width": 4, "height": 2,
                      "n_frames": 4, "decode_ok": 1}
    n = len(wav_like_prose)
    assert got[1] == {"doc_id": 1, "width": n % 640 + 1,
                      "height": n % 480 + 1, "n_frames": n // 32,
                      "decode_ok": 0}
    assert got[2]["decode_ok"] == 0 and got[2]["n_frames"] == 0
    monkeypatch.setattr(multimodal, "_video_codec", lambda: None)
    assert run([y4m])[0]["decode_ok"] == 0


def test_pyav_adapter_wins_probe_when_importable(monkeypatch):
    import sys
    import types

    import numpy as np

    class FakeFrame:
        def __init__(self, v):
            self._v = v

        def to_ndarray(self, format):
            assert format == "gray"
            return np.full((2, 3), self._v, dtype=np.uint8)

    class FakeContainer:
        class _St:
            class _CC:
                width, height = 3, 2
            codec_context = _CC()
            average_rate = types.SimpleNamespace(numerator=30,
                                                 denominator=1)
        streams = types.SimpleNamespace(video=[_St()])

        def decode(self, video):
            return [FakeFrame(9), FakeFrame(250)]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake = types.ModuleType("av")
    fake.open = lambda fh: FakeContainer()
    monkeypatch.setitem(sys.modules, "av", fake)
    codec = multimodal._video_codec()
    assert codec is multimodal._PyAVAdapter
    clip = codec.open(None)
    assert (clip.width, clip.height, clip.n_frames) == (3, 2, 2)
    assert clip.fps == (30, 1)
    assert clip.frame_luma(1) == bytes([250]) * 6


def test_scene_cuts_through_real_decode(spark, tmp_path):
    """THE video pin: a planted ASCII Y4M clip (valid utf-8, so it
    survives the documents table's text column) must report scene cuts
    at the EXACT planted frame boundaries through the decode path —
    boundaries the byte-block fallback cannot see, because the
    container header and FRAME markers shift every byte offset and the
    32-byte blocks straddle frames."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from industry_big_data_time_sequence_process_spark.registry import (
        REGISTRY)

    # 3 planted scenes: luma 40 x3 frames, 100 x4, 40 x2 (all ASCII)
    clip = synthetic_y4m([40] * 3 + [100] * 4 + [40] * 2,
                         w=4, h=2, cspace="Cmono").decode("ascii")
    prose = "plain prose document " * 40
    d = tmp_path / "video_sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([clip, prose], type=pa.string()),
        "lang": pa.array(["xx", "xx"], type=pa.string()),
        "source": pa.array(["synth", "synth"], type=pa.string()),
        "n_chars": pa.array([len(clip), len(prose)], type=pa.int64()),
    }), d / "documents.parquet")

    rows = REGISTRY["mm_video_scene_cuts"].fn(spark, str(d)).collect()
    scenes = sorted((r["scene_id"], r["start_frame"], r["n_frames"])
                    for r in rows if r["doc_id"] == 1)
    assert scenes == [(0, 0, 3), (1, 3, 4), (2, 7, 2)], scenes
    # the prose doc stays on the byte-block path: frames = nb // 32
    prose_frames = sum(r["n_frames"] for r in rows if r["doc_id"] == 2)
    assert prose_frames == len(prose.encode()) // 32
    # and the byte path would NOT see the planted boundaries: 9 frames
    # decoded vs a different byte-block count for the same blob
    assert sum(n for _s, _f, n in scenes) == 9
    assert len(clip.encode()) // 32 != 9


def test_video_clip_dedup_through_real_decode(spark, tmp_path):
    """The video-dedup pin (the audio test's shape for frames): two
    clips with IDENTICAL frames but DIFFERENT container bytes (one
    carries an extra header token, shifting every byte offset) pair
    through the decode path with match_frac 1.0; a third clip sharing
    only a prefix of frames falls below the 0.9 bar; byte-block framing
    alone could never align the shifted containers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from industry_big_data_time_sequence_process_spark.registry import (
        REGISTRY)

    lumas = [40, 100, 60, 90, 45, 110, 70, 95, 50, 105, 65, 85]
    clip_a = synthetic_y4m(lumas, w=4, h=2, cspace="Cmono").decode()
    # identical frames, different container: an extra X header token
    clip_b = clip_a.replace("YUV4MPEG2 W4 H2",
                            "YUV4MPEG2 W4 H2 XCOPY1", 1)
    assert clip_a != clip_b
    clip_c = synthetic_y4m(lumas[:4] + [33, 77, 42, 88, 55, 99, 35, 66],
                           w=4, h=2, cspace="Cmono").decode()
    d = tmp_path / "vdedup_sf"
    d.mkdir()
    texts = [clip_a, clip_b, clip_c]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["xx"] * 3, type=pa.string()),
        "source": pa.array(["synth"] * 3, type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), d / "documents.parquet")

    rows = REGISTRY["mm_video_clip_dedup"].fn(spark, str(d)).collect()
    got = {(r["doc1"], r["doc2"]): (r["n_match"], r["match_frac"])
           for r in rows}
    assert set(got) == {(1, 2)}, got
    assert got[(1, 2)] == (len(lumas), 1.0)


def test_audio_offset_dedup_finds_shifted_clip(spark):
    """THE shift-invariance pin: clip B = clip A's audio behind a
    hop-aligned silence prefix. The same-offset op is provably blind
    to the pair (every shared window sits at a different ord); the
    offset-histogram op must find it at EXACTLY the planted shift with
    all of the shorter clip's windows matching."""
    s = _clip_samples(3)
    pad = 64                                   # = 2 hops of mono_u8 bytes
    wav_a = synthetic_wav(s)
    wav_b = synthetic_wav([0] * pad + s)
    wav_c = synthetic_wav(_clip_samples(11))   # unrelated
    df = spark.createDataFrame(
        [(1, wav_a), (2, wav_b), (3, wav_c)], "doc_id long, blob binary")
    pcm = df.mapInPandas(multimodal._audio_pcm_batches,
                         "doc_id long, pcm binary")

    got = {(r["doc1"], r["doc2"]): (r["shift"], r["match_frac"])
           for r in multimodal._afp_offset_pairs(pcm).collect()}
    assert set(got) == {(1, 2)}, got
    shift, frac = got[(1, 2)]
    assert shift == pad // 32                  # the planted hop offset
    assert frac == 1.0                         # every A-window matches

    # control: the same-offset op cannot pair them
    assert all((r["doc1"], r["doc2"]) != (1, 2)
               for r in multimodal._afp_pairs(pcm).collect())
