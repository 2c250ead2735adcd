"""Round-13 JPEG decode pins (VERDICT r12 missing #6): the in-repo
baseline JPEG decoder (`operators/purejpg.py`) against the test-side
reference encoder (`tests/_jpegref.py` — baseline JFIF, quant=1, custom
canonical Huffman tables DEFINED in the emitted DHT, so the decoder
exercises its real table parse).

Known-pixel-value pins: flat 8x8 tiles are DC-only blocks and survive
quantize/round-trip BIT-CLEAN (grayscale exactly; 4:4:4 RGB exactly —
the color-transform rounding error is provably < 0.5); gradients bound
the full Huffman/zigzag/IDCT chain to a 2-count tolerance; 4:2:0 and
restart intervals exercise the sampling-factor MCU walk and the
RSTn/predictor-reset path. Dispatch pins prove `mm_image_decode`'s
codec probe now covers the dominant real image format on codec-less
containers, while prose bytes (no JPEG magic) keep the documented
fallback — the corpus oracles are unchanged.
"""
import io
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _jpegref import encode  # noqa: E402

from industry_big_data_time_sequence_process_spark.operators import purejpg  # noqa: E402,E501
from industry_big_data_time_sequence_process_spark.operators.multimodal import (  # noqa: E402,E501
    _decode_meta_batches,
    _PureCodecDispatch,
)


def _flat_tiles() -> np.ndarray:
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :8] = (200, 30, 100)
    img[:8, 8:] = (10, 240, 50)
    img[8:, :8] = (0, 0, 0)
    img[8:, 8:] = (255, 255, 255)
    return img


def _decode(data: bytes) -> tuple:
    im = purejpg.open(io.BytesIO(data))
    w, h = im.size
    arr = np.frombuffer(im.tobytes(), dtype=np.uint8)
    nb = len(im.getbands())
    return im, arr.reshape(h, w, nb) if nb > 1 else arr.reshape(h, w)


# ---------------------------------------------------------------------------
# known-pixel-value decode pins
# ---------------------------------------------------------------------------


def test_flat_tiles_444_decode_exact():
    """Flat 8x8 tiles are DC-only blocks: with quant=1 the round trip
    is exact to the pixel — every byte of the decoded RGB equals the
    planted image."""
    img = _flat_tiles()
    im, got = _decode(encode(img))
    assert im.size == (16, 16)
    assert im.getbands() == ("R", "G", "B")
    assert np.array_equal(got, img)


def test_gray_flat_decode_exact():
    gr = np.full((8, 8), 77, dtype=np.uint8)
    im, got = _decode(encode(None, gray=gr))
    assert im.getbands() == ("L",)
    assert np.array_equal(got, gr)


def test_gradient_444_decode_within_tolerance():
    """A two-axis gradient exercises the full AC chain (zigzag,
    run-length, EXTEND, IDCT); per-coefficient rounding bounds the
    reconstruction to a couple of counts."""
    grad = np.clip(
        np.arange(24).reshape(1, 24, 1) * 10
        + np.arange(16).reshape(16, 1, 1) * 3
        + np.array([0, 40, 80]).reshape(1, 1, 3), 0, 255).astype(np.uint8)
    im, got = _decode(encode(grad))
    assert im.size == (24, 16)
    assert int(np.abs(got.astype(int) - grad.astype(int)).max()) <= 2


def test_flat_tiles_420_subsampling():
    """4:2:0 walks the 2x2-sampling MCU path (4 Y blocks + 1 Cb + 1 Cr
    per MCU) and the nearest-neighbor chroma upsample; flat tiles stay
    within 1 count (the chroma block spans all four tiles, so its AC
    coefficients round)."""
    img = _flat_tiles()
    im, got = _decode(encode(img, subsampling="420"))
    assert im.size == (16, 16)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_restart_interval_decode():
    """DRI + RSTn markers every MCU: segment splits, byte alignment and
    the per-segment DC predictor reset all exercised; the image (4:4:4,
    6 MCUs of flat tiles) still decodes exactly."""
    img = np.zeros((16, 24, 3), dtype=np.uint8)
    for j, c in enumerate([(9, 18, 27), (99, 108, 117), (201, 210, 219)]):
        img[:8, 8 * j:8 * (j + 1)] = c
        img[8:, 8 * j:8 * (j + 1)] = tuple(v // 2 for v in c)
    im, got = _decode(encode(img, restart_interval=1))
    assert im.size == (24, 16)
    assert np.array_equal(got, img)


def test_non_multiple_of_8_dims():
    """A 10x13 image pads to MCU boundaries internally and crops back:
    the visible pixels round-trip within tolerance and the reported
    size is the true frame size."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(10, 13, 3)).astype(np.uint8)
    padded = np.zeros((16, 16, 3), dtype=np.uint8)
    padded[:10, :13] = img
    # encoder needs full blocks; replicate edges so padding is cheap
    padded[10:, :13] = img[9:10, :]
    padded[:10, 13:] = img[:, 12:13]
    padded[10:, 13:] = img[9, 12]
    data = encode(padded)
    # patch the SOF dims to the true 13x10 frame: the decoder must pad
    # its MCU grid and crop the planes
    i = data.index(b"\xff\xc0")
    data = (data[:i + 5] + (10).to_bytes(2, "big")
            + (13).to_bytes(2, "big") + data[i + 9:])
    im, got = _decode(data)
    assert im.size == (13, 10)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3


# ---------------------------------------------------------------------------
# error paths take the documented fallback
# ---------------------------------------------------------------------------


def test_truncated_scan_raises():
    data = encode(_flat_tiles())
    with pytest.raises(OSError):
        purejpg.open(io.BytesIO(data[:len(data) // 2]))


def test_progressive_marker_raises():
    data = bytearray(encode(_flat_tiles()))
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(OSError, match="non-baseline"):
        purejpg.open(io.BytesIO(bytes(data)))


def test_non_jpeg_raises():
    with pytest.raises(OSError):
        purejpg.open(io.BytesIO(b"definitely not an image"))


# ---------------------------------------------------------------------------
# dispatch: mm_image_decode's probe now covers JPEG
# ---------------------------------------------------------------------------


def test_dispatch_routes_jpeg_magic():
    data = encode(_flat_tiles())
    with _PureCodecDispatch.open(io.BytesIO(data)) as im:
        assert im.size == (16, 16)
        assert im.getbands() == ("R", "G", "B")


def test_decode_meta_batches_real_jpeg_branch():
    """The Arrow decode pass reports TRUE dimensions + decode_ok=1 for
    planted JPEG blobs and the deterministic fallback for prose bytes —
    the same contract the planted-PNG/BMP pins hold."""
    jpeg = encode(_flat_tiles())
    prose = "not an image at all".encode()
    pdf = pd.DataFrame({"doc_id": [1, 2], "blob": [jpeg, prose]})
    out = pd.concat(list(_decode_meta_batches(iter([pdf]))))
    by_id = out.set_index("doc_id")
    assert (by_id.loc[1, "width"], by_id.loc[1, "height"],
            by_id.loc[1, "n_channels"], by_id.loc[1, "decode_ok"]) \
        == (16, 16, 3, 1)
    assert by_id.loc[2, "decode_ok"] == 0
    assert by_id.loc[2, "width"] == len(prose) % 640 + 1
