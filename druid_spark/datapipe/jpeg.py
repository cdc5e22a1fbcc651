"""JPEG decoder, library-free (round 7 — the same pure-Python
public-format move as ingest/protobuf.py and the PNG decoder in
multimodal.py).

Scope: baseline sequential DCT (SOF0) and progressive DCT (SOF2),
8-bit, 1 or 3 components, 4:4:4 / 4:2:0 / 4:2:2 sampling, restart
intervals, progressive spectral selection + successive approximation
(DC/AC first and refinement scans, EOB runs). Arithmetic coding,
hierarchical modes, and 12-bit precision raise NotImplementedError.

Structure (ITU-T T.81):
- markers: SOI, DQT (8x8 quant tables, zigzag order), SOF0/SOF2
  (frame: dims + per-component sampling factors), DHT (huffman tables
  from the BITS/HUFFVAL spec lists), DRI (restart interval), SOS
  (scan: component list + Ss/Se spectral band + Ah/Al successive
  approximation), EOI
- entropy-coded scan: byte-stuffed (0xFF 0x00) huffman stream; per
  MCU, each component contributes h×v 8x8 blocks; DC is a predicted
  difference in category form, AC is run/size zigzag pairs. A
  progressive frame carries many scans, each narrowing a spectral
  band (Ss..Se) at a bit precision (point transform Al); refinement
  scans (Ah>0) add one bit per coefficient (T.81 G.1.2).
- reconstruction: dequantize → 2-D IDCT (separable orthonormal
  DCT-III as one matrix sandwich C.T @ B @ C) → +128, clamp → chroma
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


def _unstuff(raw: bytes) -> bytes:
    """Strip 0xFF00 stuffing and RSTn markers from an entropy segment
    (the reader sees pure bits; restart boundaries are tracked by MCU
    count, which re-aligns and resets predictors)."""
    out = bytearray()
    k = 0
    while k < len(raw):
        if raw[k] == 0xFF and k + 1 < len(raw):
            if raw[k + 1] == 0x00:
                out.append(0xFF)
                k += 2
                continue
            if 0xD0 <= raw[k + 1] <= 0xD7:
                k += 2
                continue
        out.append(raw[k])
        k += 1
    return bytes(out)


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
    progressive = False
    scans: list[dict] = []
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), \
                seg[5]
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG "
                "decode")
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
            scan_map = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map.append({"id": cid, "dc": tables >> 4,
                                 "ac": tables & 0xF})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            # entropy stream runs to the next non-RST marker
            j = i
            while j + 1 < len(b):
                if b[j] == 0xFF and b[j + 1] not in (0x00,) and \
                        not (0xD0 <= b[j + 1] <= 0xD7):
                    break
                j += 1
            raw = b[i:j]
            i = j
            # tables can be redefined between scans — snapshot them
            scans.append({"map": scan_map, "ss": ss, "se": se,
                          "ah": ahal >> 4, "al": ahal & 0xF,
                          "data": _unstuff(raw), "restart": restart,
                          "dc": dict(huff_dc), "ac": dict(huff_ac)})
    if not scans or not comps:
        raise ValueError("JPEG without a scan")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        # coefficient store in ZIGZAG order, full interleaved grid
        c["rows"], c["cols"] = mcuy * c["v"], mcux * c["h"]
        c["coef"] = np.zeros((c["rows"], c["cols"], 64), dtype=np.int32)
        # non-interleaved scans cover only the component's own blocks
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        c["bw"] = -(-cw // 8)
        c["bh"] = -(-ch // 8)

    if progressive:
        for sc in scans:
            _progressive_scan(sc, comps, mcux, mcuy)
    else:
        _baseline_scan(scans[0], comps, mcux, mcuy)

    planes = []
    for c in comps:
        px = np.zeros((c["rows"] * 8, c["cols"] * 8))
        q = qt[c["tq"]]
        for by in range(c["rows"]):
            for bx in range(c["cols"]):
                zz = c["coef"][by, bx]
                if not zz.any():
                    px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = 128.0
                    continue
                blk = np.zeros(64)
                blk[ZIGZAG] = zz
                px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    idct2(blk.reshape(8, 8) * q) + 128.0
        if c["h"] != hmax or c["v"] != vmax:  # chroma upsample
            px = np.repeat(np.repeat(px, vmax // c["v"], axis=0),
                           hmax // c["h"], axis=1)
        planes.append(px[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return y.astype(np.uint8)[..., None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.stack([r, g, bl], axis=-1), 0, 255) \
        .astype(np.uint8)


def _scan_comps(sc: dict, comps: list[dict]) -> list[dict]:
    out = []
    for sm in sc["map"]:
        c = next(c for c in comps if c["id"] == sm["id"])
        c["dcid"], c["acid"] = sm["dc"], sm["ac"]
        out.append(c)
    return out


def _baseline_scan(sc: dict, comps, mcux: int, mcuy: int) -> None:
    """One interleaved full-band scan (T.81 F.2): DC difference +
    run/size AC pairs per block, into the coefficient store."""
    active = _scan_comps(sc, comps)
    reader = _BitReader(sc["data"])
    restart = sc["restart"]
    preds = {c["id"]: 0 for c in active}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align()
                preds = {c["id"]: 0 for c in active}
            for c in active:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["coef"][my * c["v"] + by,
                                       mx * c["h"] + bx]
                        t = reader.decode(sc["dc"][c["dcid"]])
                        diff = _extend(reader.read_bits(t), t)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode(sc["ac"][c["acid"]])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0:
                                break  # EOB
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                break
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu_count += 1


def _progressive_scan(sc: dict, comps, mcux: int, mcuy: int) -> None:
    """One progressive scan (T.81 G.1.2). DC scans (Ss=0) may be
    interleaved; AC scans are single-component over the component's
    own block grid. Ah=0 is a first pass at point transform Al;
    Ah>0 refines one bit."""
    active = _scan_comps(sc, comps)
    reader = _BitReader(sc["data"])
    restart = sc["restart"]
    ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
    state = {"eobrun": 0}
    preds = {c["id"]: 0 for c in active}

    if ss == 0:  # DC scan (interleaved or not)
        if se != 0:
            raise ValueError("progressive scan mixing DC and AC bands")
        dc_tables = sc["dc"]
        mcu_count = 0
        if len(active) > 1:
            grid = [(my, mx) for my in range(mcuy)
                    for mx in range(mcux)]
        else:
            c0 = active[0]
            grid = [(by, bx) for by in range(c0["bh"])
                    for bx in range(c0["bw"])]
        for gy, gx in grid:
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align()
                preds = {c["id"]: 0 for c in active}
            for c in active:
                if len(active) > 1:
                    blocks = [(gy * c["v"] + by, gx * c["h"] + bx)
                              for by in range(c["v"])
                              for bx in range(c["h"])]
                else:
                    blocks = [(gy, gx)]
                for by, bx in blocks:
                    zz = c["coef"][by, bx]
                    if ah == 0:  # DC first
                        t = reader.decode(dc_tables[c["dcid"]])
                        diff = _extend(reader.read_bits(t), t)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]] << al
                    else:  # DC refinement: one bit
                        if reader.read_bit():
                            zz[0] |= 1 << al
            mcu_count += 1
        return

    # AC scan: single component, non-interleaved (T.81 G.1.1)
    if len(active) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = active[0]
    table = sc["ac"][c["acid"]]
    mcu_count = 0
    for by in range(c["bh"]):
        for bx in range(c["bw"]):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align()
                state["eobrun"] = 0
            zz = c["coef"][by, bx]
            if ah == 0:
                _ac_first(reader, table, zz, ss, se, al, state)
            else:
                _ac_refine(reader, table, zz, ss, se, al, state)
            mcu_count += 1


def _ac_first(reader, table, zz, ss, se, al, state) -> None:
    """AC first pass (T.81 G.1.2.2): run/size pairs at precision Al,
    EOBn codes start a run of all-ends-of-band blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read_bits(r)
            break
        k += r
        if k > se:
            break
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, table, zz, ss, se, al, state) -> None:
    """AC refinement pass (T.81 G.1.2.3): correction bits for
    already-nonzero coefficients, newly-significant ±1<<Al values."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if reader.read_bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode(table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    # refinement EOB runs INCLUDE the current block —
                    # its remaining correction bits are read by the
                    # tail below, which then consumes one run unit
                    # (T.81 G.1.2.3; contrast _ac_first's (1<<r)-1)
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                # newly significant: sign bit then ±1<<al
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1
