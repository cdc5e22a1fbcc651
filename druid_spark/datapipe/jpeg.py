"""Baseline JPEG decoder, library-free (round 7 — the same
pure-Python-public-format move as ingest/protobuf.py and the PNG
decoder in multimodal.py).

Scope: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
4:4:4 / 4:2:0 / 4:2:2 sampling, restart intervals. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise NotImplementedError —
those need a different scan machinery, not just more of this one.

Structure (ITU-T T.81):
- markers: SOI, DQT (8x8 quant tables, zigzag order), SOF0 (frame:
  dims + per-component sampling factors), DHT (huffman tables from the
  BITS/HUFFVAL spec lists), DRI (restart interval), SOS (scan), EOI
- entropy-coded scan: byte-stuffed (0xFF 0x00) huffman stream; per
  MCU, each component contributes h×v 8x8 blocks; DC is a predicted
  difference in category form, AC is run/size zigzag pairs
- reconstruction: dequantize → 2-D IDCT (separable orthonormal DCT-III
  as one matrix sandwich C.T @ B @ C) → +128, clamp → chroma
  upsample → YCbCr→RGB (JFIF / CCIR 601 full-range)

The Spark-side contract stays in multimodal.py: decode runs inside
Arrow-batched mapInPandas, payloads ride an opaque binary column.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# orthonormal DCT-II basis; IDCT of block B is C.T @ B @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * \
            (np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


def idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8x8 coefficient block."""
    return _C.T @ block @ _C


class _Huff:
    """Canonical JPEG huffman table: (BITS counts, HUFFVAL symbols) →
    a code-length-indexed lookup, decoded bit by bit (tables are tiny;
    clarity over a full LUT)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the byte-stuffed entropy stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec: pad past the end with 1s/0s — either
        b = self.data[self.pos]
        out = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return out

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1

    def decode(self, table: _Huff) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """Category-form value → signed (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, 3) RGB or (h, w, 1) grayscale uint8."""
    if not b or not b.startswith(b"\xff\xd8"):
        raise NotImplementedError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    scan_data = None
    scan_map: list[dict] = []
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64)
                tab[ZIGZAG] = np.frombuffer(
                    seg[j + 1:j + 65], dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                j += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), \
                seg[5]
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG decodes")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1:j + 17])
                n = sum(counts)
                table = _Huff(counts, seg[j + 17:j + 17 + n])
                (huff_ac if tc else huff_dc)[th] = table
                j += 17 + n
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map.append({"id": cid, "dc": tables >> 4,
                                 "ac": tables & 0xF})
            # entropy stream runs to the next non-RST marker
            j = i
            while j + 1 < len(b):
                if b[j] == 0xFF and b[j + 1] not in (0x00,) and \
                        not (0xD0 <= b[j + 1] <= 0xD7):
                    break
                j += 1
            raw = b[i:j]
            i = j
            # strip stuffing and RST markers (reader sees pure bits;
            # restart boundaries re-align + reset DC predictors, so
            # remember where they fall in the unstuffed stream)
            out = bytearray()
            rst_positions = []
            k = 0
            while k < len(raw):
                if raw[k] == 0xFF and k + 1 < len(raw):
                    if raw[k + 1] == 0x00:
                        out.append(0xFF)
                        k += 2
                        continue
                    if 0xD0 <= raw[k + 1] <= 0xD7:
                        rst_positions.append(len(out))
                        k += 2
                        continue
                out.append(raw[k])
                k += 1
            scan_data = (bytes(out), rst_positions)
    if scan_data is None or not comps:
        raise ValueError("JPEG without a scan")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        sm = next(s for s in scan_map if s["id"] == c["id"])
        c.update(dc=sm["dc"], ac=sm["ac"], pred=0)
        c["px"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))

    reader = _BitReader(scan_data[0])
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64)
                        t = reader.decode(huff_dc[c["dc"]])
                        diff = _extend(reader.read_bits(t), t)
                        c["pred"] += diff
                        coeffs[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.decode(huff_ac[c["ac"]])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0:
                                break  # EOB
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                break
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        # coeffs[k] is the k-th ZIGZAG-order value;
                        # nat[ZIGZAG[k]] = coeffs[k] restores natural
                        # row-major order before dequantization
                        blk = np.zeros(64)
                        blk[ZIGZAG] = coeffs
                        block = blk.reshape(8, 8) * qt[c["tq"]]
                        px = idct2(block) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["px"][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    planes = []
    for c in comps:
        p = c["px"]
        if c["h"] != hmax or c["v"] != vmax:  # chroma upsample
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return y.astype(np.uint8)[..., None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.stack([r, g, bl], axis=-1), 0, 255) \
        .astype(np.uint8)
