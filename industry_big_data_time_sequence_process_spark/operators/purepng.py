"""Minimal pure-Python PNG decoder — stdlib ``zlib`` + ``struct`` only.

VERDICT r6 #5: this container ships no PIL/av, so the REAL branch of
``mm_image_decode`` only ever ran through an injected fake codec in
tests. This ~120-LoC reader implements the non-interlaced 8-bit
gray / gray+alpha / RGB / RGBA subset of the public PNG spec (RFC 2083 /
ISO 15948): chunk walk with CRC verification, IDAT concatenation, zlib
inflate, and per-scanline unfiltering (filter types 0-4 incl. Paeth).
Registered by :func:`multimodal._codec` as the fallback codec when PIL
is absent, so the real decode branch executes on EVERY container with a
PIL-compatible surface (``open() -> obj with .size / .getbands() /
.tobytes()``, context-manager protocol, raises on non-PNG bytes).

Scope is deliberately tiny — production clusters bring PIL/turbojpeg and
the probe prefers them; this exists so the decode control flow is never
dead code. Unsupported valid PNGs (16-bit, palette, interlaced) raise
``OSError`` like any undecodable blob and take the documented fallback.
"""
from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> band names (the PIL ``getbands()`` vocabulary)
_BANDS = {0: ("L",), 2: ("R", "G", "B"), 4: ("L", "A"),
          6: ("R", "G", "B", "A")}


class PurePNGImage:
    """Decoded image with the PIL surface the callers use."""

    def __init__(self, width: int, height: int, bands: tuple,
                 pixels: bytes):
        self.size = (width, height)
        self._bands = bands
        self._pixels = pixels

    def getbands(self) -> tuple:
        return self._bands

    def tobytes(self) -> bytes:
        """Raw interleaved samples, row-major, one byte per sample."""
        return self._pixels

    def __enter__(self) -> "PurePNGImage":
        return self

    def __exit__(self, *a) -> bool:
        return False


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse the per-scanline filters (PNG spec §6): each line is a
    filter-type byte + width*bpp filtered samples; reconstruction uses
    the left (a), up (b) and up-left (c) reconstructed neighbors."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise OSError("PNG pixel stream has wrong length")
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:      # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:    # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:    # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise OSError(f"unknown PNG filter type {ftype}")
        out += line
        prev = bytes(line)
    return bytes(out)


def open(fh) -> PurePNGImage:  # noqa: A001 — PIL-compatible name
    """Decode a PNG byte stream (file-like ``fh``). Raises ``OSError``
    on anything that isn't a supported PNG — same contract as
    ``PIL.Image.open`` for the capability-probe callers."""
    data = fh.read()
    if not data.startswith(_SIG):
        raise OSError("cannot identify image file (no PNG signature)")
    pos = len(_SIG)
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        crc_bytes = data[pos + 8 + length:pos + 12 + length]
        if len(payload) != length or len(crc_bytes) != 4:
            raise OSError("truncated PNG chunk")
        crc = struct.unpack(">I", crc_bytes)[0]
        if zlib.crc32(tag + payload) != crc:
            raise OSError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            if length != 13:  # a CRC-valid but malformed IHDR must stay
                # inside the documented OSError contract, not struct.error
                raise OSError(f"malformed IHDR chunk (length {length})")
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise OSError("PNG missing IHDR/IDAT")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise OSError("zero-dimension PNG")
    if depth != 8 or ctype not in _BANDS or comp != 0 or filt != 0 \
            or interlace != 0:
        raise OSError(
            f"unsupported PNG variant (depth={depth}, color={ctype}, "
            f"interlace={interlace}) — pure-python codec decodes the "
            f"8-bit non-interlaced subset")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise OSError(f"corrupt PNG pixel stream: {exc}") from exc
    bands = _BANDS[ctype]
    pixels = _unfilter(raw, width, height, len(bands))
    return PurePNGImage(width, height, bands, pixels)
