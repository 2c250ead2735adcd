"""Test-side reference JPEG ENCODER (baseline, quant=1, custom canonical
Huffman tables) — exists only to plant deterministic JPEG bytes for the
`purejpg` decode pins in tests/test_wave_r13c.py. Deliberately tiny:
4:4:4 (all components 1x1) or 4:2:0 (Y 2x2, chroma 1x1 via 2x2-mean
downsample), all-ones quantization so DC-only (flat) blocks survive the
round trip bit-clean. The tables are DEFINED in the emitted DHT segments
(JPEG permits any canonical table), so the decoder exercises its real
DHT parse — nothing is shared with the decoder beyond the public spec's
zigzag order and DCT basis, which is the point of a reference encoder.
"""
from __future__ import annotations

import struct

import numpy as np

from industry_big_data_time_sequence_process_spark.operators.purejpg import (
    ZIGZAG,
    _C,
)

#: canonical tables: all 12 DC categories at code length 4; all 162 AC
#: symbols (EOB, ZRL, (run 0..15) x (size 1..10)) at code length 8.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s
                           for r in range(16) for s in range(1, 11)]


def _canon(symbols: list, length: int) -> dict:
    return {sym: (length, code) for code, sym in enumerate(symbols)}


_DC_CODES = _canon(_DC_SYMS, 4)
_AC_CODES = _canon(_AC_SYMS, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:   # byte stuffing
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= (8 - self.nbits)
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, spatial: np.ndarray,
                  pred: int) -> int:
    """DCT + quant(1) + zigzag + Huffman one 8x8 block; returns new DC
    predictor."""
    coeff = np.rint(_C @ (spatial - 128.0) @ _C.T).astype(int)
    zz = [int(coeff.reshape(64)[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    t = _cat(diff)
    ln, code = _DC_CODES[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            if k > last_nz:
                break
            run += 1
            continue
        while run >= 16:
            ln, code = _AC_CODES[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = _AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = _AC_CODES[0x00]
        bw.write(code, ln)
    return zz[0]


def _dht(tc: int, th: int, symbols: list, length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode(rgb: np.ndarray | None, gray: np.ndarray | None = None,
           subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale via
    ``gray=``) to baseline JFIF bytes. 4:2:0 requires dims % 16 == 0.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset), pinning the decoder's restart
    path."""
    if gray is not None:
        h, w = gray.shape
        planes = [gray.astype(np.float64)]
        samp = [(1, 1)]
    else:
        h, w, _ = rgb.shape
        r = rgb[..., 0].astype(np.float64)
        g = rgb[..., 1].astype(np.float64)
        b = rgb[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "444":
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            assert h % 16 == 0 and w % 16 == 0
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(subsampling)
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    assert all(p.shape[0] % 8 == 0 and p.shape[1] % 8 == 0
               for p in planes)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            b"\x01\x01\x00\x00\x01\x00\x01\x00\x00")   # APP0
    out += (b"\xff\xdb" + struct.pack(">H", 67)
            + b"\x00" + bytes([1] * 64))               # DQT id0, all 1s
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
    out += _dht(0, 0, _DC_SYMS, 4)
    out += _dht(1, 0, _AC_SYMS, 8)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])                   # DC 0 / AC 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    mcux = w // (8 * hmax)
    mcuy = h // (8 * vmax)
    pred = [0] * nc
    n_rst = 0
    for mcu in range(mcuy * mcux):
        if restart_interval and mcu and mcu % restart_interval == 0:
            out += bw.flush()                          # pad to byte
            out += bytes([0xFF, 0xD0 + (n_rst % 8)])   # RSTn
            n_rst += 1
            bw = _BitWriter()
            pred = [0] * nc                            # predictors reset
        my, mx = divmod(mcu, mcux)
        for ci, ((sh, sv), plane) in enumerate(zip(samp, planes)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    block = plane[y0:y0 + 8, x0:x0 + 8]
                    pred[ci] = _encode_block(bw, block, pred[ci])
    out += bw.flush()
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)
