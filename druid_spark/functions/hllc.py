"""Reference-parity hyperUnique estimates (pure Python, opt-in).

The reference's builtin APPROX_COUNT_DISTINCT plans a by-value
cardinality aggregator over the dimension
(sql/.../builtin/BuiltinApproxCountDistinctSqlAggregator.java ->
processing/.../cardinality/CardinalityAggregator.java): each string
value hashes with Guava murmur3_128().hashUnencodedChars (MurmurHash3
x64_128 over the UTF-16LE code units) into a 2048-bucket
HyperLogLogCollector (hll/HyperLogLogCollector.java), whose estimate
applies the collector's own corrections (linear counting under
5m/2 with zero registers, the 2^64 high-range fold). Golden suites
pin these ESTIMATE values, not the true distinct counts — an engine
can only match them by reproducing the collector bit-for-bit.

This module is that reproduction: same bucket selection (big-endian
short of the hash's last two bytes & 0x7ff), same positionOf1
(trailing-zero run over bytes 0..7 + 1, ByteBitLookup.LOOKUP), same
nibble-register offset/overflow handling, same correction constants.
It backs the opt-in `hyperunique_parity` engine mode — the default
approx path stays Spark's Datasketches HLL (JVM-side, fast); parity
mode trades speed for reference-equal numbers via an Arrow-batched
grouped-agg pandas UDF.
"""

from __future__ import annotations

import math
import struct

_MASK64 = (1 << 64) - 1
NUM_BUCKETS = 2048
_ALPHA = 0.7213 / (1 + 1.079 / NUM_BUCKETS)
CORRECTION_PARAMETER = _ALPHA * NUM_BUCKETS * NUM_BUCKETS
LOW_CORRECTION_THRESHOLD = 5 * NUM_BUCKETS / 2.0
TWO_TO_THE_64 = 2.0 ** 64
HIGH_CORRECTION_THRESHOLD = TWO_TO_THE_64 / 30.0
_RANGE = 15  # 4-bit register payload


def murmur3_x64_128(data: bytes, seed: int = 0) -> bytes:
    """MurmurHash3 x64_128 (Austin Appleby's public-domain function,
    what Guava's Hashing.murmur3_128 computes); little-endian h1||h2
    like Guava's asBytes(). Verified against published vectors."""
    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _MASK64

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xff51afd7ed558ccd) & _MASK64
        k ^= k >> 33
        k = (k * 0xc4ceb9fe1a85ec53) & _MASK64
        k ^= k >> 33
        return k

    c1, c2 = 0x87c37b91114253d5, 0x4cf5ad432745937f
    h1 = h2 = seed
    n = len(data) // 16
    for i in range(n):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & _MASK64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52dce729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495ab5) & _MASK64
    tail = data[n * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        for i in range(len(tail) - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * c2) & _MASK64
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if len(tail) > 0:
        for i in range(min(len(tail), 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * c1) & _MASK64
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return struct.pack("<QQ", h1, h2)


def hash_unencoded_chars(s: str) -> bytes:
    """Guava murmur3_128().hashUnencodedChars: the chars as UTF-16LE
    code units — the cardinality aggregator's per-value hash
    (StringCardinalityAggregatorColumnSelectorStrategy.java:40)."""
    return murmur3_x64_128(s.encode("utf-16-le"))


class HyperLogLogCollector:
    """Flat-register model of hll/HyperLogLogCollector.java: 2048
    4-bit registers + a shared registerOffset + one max-overflow
    (value, bucket) pair. Estimates match the Java collector exactly
    because the math is the same sum over the same clamped registers."""

    __slots__ = ("regs", "offset", "nonzero", "overflow_value",
                 "overflow_bucket")

    def __init__(self):
        self.regs = bytearray(NUM_BUCKETS)
        self.offset = 0
        self.nonzero = 0
        self.overflow_value = 0
        self.overflow_bucket = 0

    def add_hash(self, h: bytes) -> None:
        bucket = struct.unpack_from(">H", h, len(h) - 2)[0] & (
            NUM_BUCKETS - 1)
        pos = 0
        for i in range(8):
            b = h[i]
            if b == 0:
                pos += 8
                continue
            pos += (b & -b).bit_length()  # ByteBitLookup.LOOKUP
            break
        self.add_register(bucket, pos)

    def add_value(self, s: str) -> None:
        self.add_hash(hash_unencoded_chars(s))

    def add_register(self, bucket: int, position_of_1: int) -> None:
        if position_of_1 <= self.offset:
            return
        if position_of_1 > self.offset + _RANGE:
            if position_of_1 > self.overflow_value:
                if self.overflow_value and \
                        self.overflow_value <= self.offset + _RANGE:
                    self.add_register(self.overflow_bucket,
                                      self.overflow_value)
                self.overflow_value = position_of_1
                self.overflow_bucket = bucket
            return
        val = position_of_1 - self.offset
        cur = self.regs[bucket]
        if val > cur:
            if cur == 0:
                self.nonzero += 1
            self.regs[bucket] = val
            if self.nonzero == NUM_BUCKETS:
                # all registers occupied: slide the window up one
                self.offset += 1
                nz = 0
                for i in range(NUM_BUCKETS):
                    v = self.regs[i] - 1
                    self.regs[i] = v if v > 0 else 0
                    if v > 0:
                        nz += 1
                self.nonzero = nz

    def fold(self, other: "HyperLogLogCollector") -> None:
        for i in range(NUM_BUCKETS):
            v = other.regs[i]
            if v:
                self.add_register(i, v + other.offset)
        if other.overflow_value:
            self.add_register(other.overflow_bucket,
                              other.overflow_value)

    def estimate(self) -> float:
        """estimateDense (HyperLogLogCollector.java:203-236) over the
        flat registers, reproducing its per-BYTE walk: registers pack
        two per byte (bucket&1==0 -> upper nibble, :666), zeroCount
        counts RAW zero nibbles via NUM_ZERO_LOOKUP for non-overflow
        bytes, and the overflow byte uses the reference's masked
        arithmetic on the OFFSET-ADDED values — (upperNibble&0xf0)==0
        classifies any value <16 as zero, (lowerNibble&0x0f)==0 any
        multiple of 16 (:224), quirks reproduced verbatim so parity
        holds on overflow-bearing groups too."""
        e = 0.0
        zero_count = 0
        ov_byte = (self.overflow_bucket >> 1) if self.overflow_value \
            else -1
        ov_upper = (self.overflow_bucket & 1) == 0
        for pos in range(NUM_BUCKETS // 2):
            up = self.regs[2 * pos]
            lo = self.regs[2 * pos + 1]
            if pos == ov_byte:
                upper = up + self.offset
                lower = lo + self.offset
                if ov_upper:
                    upper = max(upper, self.overflow_value)
                else:
                    lower = max(lower, self.overflow_value)
                e += 1.0 / (2.0 ** upper) + 1.0 / (2.0 ** lower)
                zero_count += ((1 if (upper & 0xf0) == 0 else 0)
                               + (1 if (lower & 0x0f) == 0 else 0))
            else:
                # MIN_NUM_REGISTER_LOOKUP[offset][byte] +
                # NUM_ZERO_LOOKUP[byte]
                e += (1.0 / (2.0 ** (up + self.offset))
                      + 1.0 / (2.0 ** (lo + self.offset)))
                zero_count += ((1 if up == 0 else 0)
                               + (1 if lo == 0 else 0))
        return apply_correction(e, zero_count)


def apply_correction(e: float, zero_count: int) -> float:
    """HyperLogLogCollector.applyCorrection — verbatim math."""
    e = CORRECTION_PARAMETER / e
    if e <= LOW_CORRECTION_THRESHOLD:
        return e if zero_count == 0 else \
            NUM_BUCKETS * math.log(NUM_BUCKETS / float(zero_count))
    if e > HIGH_CORRECTION_THRESHOLD:
        ratio = e / TWO_TO_THE_64
        if ratio >= 1:
            # "very unlikely case that value is > 2^64" — the
            # reference returns Double.POSITIVE_INFINITY (:155)
            return float("inf")
        return -TWO_TO_THE_64 * math.log(1 - ratio)
    return e


def _round_long(est: float) -> int:
    """Math.round on the estimate — POSITIVE_INFINITY rounds to
    Long.MAX_VALUE like Java's Math.round."""
    if math.isinf(est):
        return (1 << 63) - 1
    return int(round(est))


def estimate_values(values) -> int:
    """Round-to-long estimate over an iterable of (string) values,
    skipping nulls (the SQL layer filters them — COUNT DISTINCT
    semantics)."""
    c = HyperLogLogCollector()
    for v in values:
        if v is None:
            continue
        c.add_value(v if isinstance(v, str) else str(v))
    return _round_long(c.estimate())


def pack_bucket_pos(s: str) -> int:
    """(bucket, positionOf1) of one value, packed as bucket<<8 | pos.
    positionOf1 <= 64 always fits the low byte."""
    h = hash_unencoded_chars(s)
    bucket = struct.unpack_from(">H", h, len(h) - 2)[0] & (
        NUM_BUCKETS - 1)
    pos = 0
    for i in range(8):
        b = h[i]
        if b == 0:
            pos += 8
            continue
        pos += (b & -b).bit_length()
        break
    return (bucket << 8) | pos


def estimate_packed(pairs) -> int:
    """Round-to-long estimate from packed (bucket, pos) pairs,
    replayed in sorted order (deterministic overflow tie-break)."""
    c = HyperLogLogCollector()
    for p in sorted(pairs):
        c.add_register(int(p) >> 8, int(p) & 0xFF)
    return _round_long(c.estimate())


_REGISTERED: set[int] = set()


def register_hllc_udf(spark) -> None:
    """Register the reference-parity estimate as a TWO-PHASE shape.
    Callers (sqlshim / aggregations.py) emit
    `druid_hllc_est(sort_array(collect_set(druid_hllc_bp(x))))`:

    - druid_hllc_bp — SCALAR Arrow-batched pandas UDF mapping each
      value to its (bucket, positionOf1) pair packed in a long. Runs
      per input batch; never materializes a group.
    - collect_set — a JVM built-in aggregate WITH map-side partial
      aggregation, and its result is hard-bounded at 2048 buckets x
      <=64 positions (~131k longs, ~1 MB) regardless of group row
      count, because the packed domain is finite. This is the
      scale-safe partial fold (round-10 note: the previous
      GROUPED_AGG form materialized each group's full value list).
    - druid_hllc_est — SCALAR pandas UDF replaying the sorted pairs
      into HyperLogLogCollector and rounding the estimate.

    Replay order is canonical (sorted), so estimates are
    deterministic; register/overflow state matches incremental adds
    except on cross-bucket overflow ties, where the reference itself
    is ingest-order-dependent (strict `>` at
    HyperLogLogCollector.java add-overflow) — same caveat the
    previous per-group form had vs segment order."""
    key = id(spark)
    if key in _REGISTERED:
        return
    global pd
    import pandas as pd  # module-global so pyspark's type-hint
    from pyspark.sql.functions import pandas_udf  # resolution sees it

    @pandas_udf("long")
    def druid_hllc_bp(v: pd.Series) -> pd.Series:
        return v.map(lambda s: None if s is None
                     else pack_bucket_pos(s), na_action="ignore") \
                .astype("Int64")

    @pandas_udf("long")
    def druid_hllc_est(arrs: pd.Series) -> pd.Series:
        return pd.Series(
            [None if a is None else estimate_packed(a) for a in arrs],
            dtype="Int64")

    spark.udf.register("druid_hllc_bp", druid_hllc_bp)
    spark.udf.register("druid_hllc_est", druid_hllc_est)
    _REGISTERED.add(key)
