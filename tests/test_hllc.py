"""Reference-parity hyperUnique estimates (functions/hllc.py).

The collector reproduces hll/HyperLogLogCollector.java (2048 nibble
registers, offset/overflow, applyCorrection) and the by-value
cardinality hash (CardinalityAggregator.HASH_FUNCTION
.hashUnencodedChars — murmur3 x64_128 over UTF-16LE). The qaSql
aggr_general A10/A11 goldens pin the engine-level estimates; here the
primitives are pinned so a refactor can't silently drift.
"""

import pytest

from druid_spark.functions.hllc import (HyperLogLogCollector,
                                        apply_correction,
                                        estimate_values,
                                        hash_unencoded_chars,
                                        murmur3_x64_128)


def test_murmur3_published_vector():
    # Austin Appleby's reference output for the canonical test string
    # with seed 0 (x64_128, little-endian h1||h2) — same vector the
    # conformance harness's copy is verified against
    h = murmur3_x64_128(b"The quick brown fox jumps over the lazy dog")
    assert h.hex() == "6c1b07bc7bbc4be347939ac4a93c437a"


def test_hash_unencoded_chars_is_utf16le():
    assert hash_unencoded_chars("abc") == \
        murmur3_x64_128("abc".encode("utf-16-le"))


def test_low_cardinality_linear_counting():
    # n far below m=2048: linear counting tracks the true count;
    # deterministic self-goldens (50 -> 51: one bucket collision
    # pushes the log curve up — the reference collector does the same)
    got = {n: estimate_values([f"v{i}" for i in range(n)])
           for n in (1, 2, 10, 50)}
    assert got == {1: 1, 2: 2, 10: 10, 50: 51}


def test_duplicates_do_not_move_the_estimate():
    assert estimate_values(["a"] * 1000 + ["b"] * 3) == \
        estimate_values(["a", "b"])


def test_nulls_skipped():
    assert estimate_values(["a", None, "b", None]) == 2


def test_estimate_within_hll_error_band():
    n = 20000
    est = estimate_values(f"k{i}" for i in range(n))
    assert abs(est - n) / n < 0.05  # 1.04/sqrt(2048) ~ 2.3% RSE


def test_fold_equals_single_collector():
    a, b, c = (HyperLogLogCollector() for _ in range(3))
    for i in range(3000):
        (a if i % 2 else b).add_value(f"x{i}")
        c.add_value(f"x{i}")
    a.fold(b)
    assert round(a.estimate()) == round(c.estimate())


def test_two_phase_packed_equals_value_order():
    # the registered SQL shape replays collect_set'ed (bucket, pos)
    # pairs in sorted order; on offset-0 states (anything below ~2048
    # occupied buckets) the final registers are order-independent, so
    # the packed estimate must equal the value-order estimate
    from druid_spark.functions.hllc import (estimate_packed,
                                            pack_bucket_pos)
    vals = [f"k{i}" for i in range(5000)]
    packed = {pack_bucket_pos(v) for v in vals}
    assert estimate_packed(packed) == estimate_values(vals)


def test_partition_fold_equals_single_pass():
    # scale-safety contract (round-11): per-partition collectors
    # merged by fold() give the same estimate as one pass — the
    # distributed partial-fold path cannot drift from the single
    # collector
    import random
    rng = random.Random(7)
    vals = [f"p{i}" for i in range(4000)]
    parts = [[], [], []]
    for v in vals:
        parts[rng.randrange(3)].append(v)
    single = HyperLogLogCollector()
    for v in vals:
        single.add_value(v)
    merged = HyperLogLogCollector()
    for p in parts:
        c = HyperLogLogCollector()
        for v in p:
            c.add_value(v)
        merged.fold(c)
    assert round(merged.estimate()) == round(single.estimate())


def test_overflow_byte_masked_zero_count():
    # estimateDense's overflow-byte quirk (HyperLogLogCollector.java:
    # 224): with an overflow register present, the overflow BYTE's
    # nibbles classify as zero via (upper&0xf0)==0 / (lower&0x0f)==0
    # on the offset-added VALUES — any upper value <16 counts as a
    # zero register. Pin it directly: same registers, overflow on
    # bucket 0 (upper nibble of byte 0) vs no overflow.
    with_ov = HyperLogLogCollector()
    with_ov.add_register(0, 20)   # overflow pair (pos>15 at offset 0)
    with_ov.add_register(1, 3)    # buddy register in the same byte
    with_ov.add_register(2, 3)
    # overflow byte: upper=max(0,20)=20 -> (20&0xf0)!=0 not zero;
    # lower=3 -> (3&0x0f)!=0 not zero. byte1: raw nibbles 3,0 -> one
    # zero. remaining 1022 bytes: 2044 zeros. zero_count = 2045.
    e = (1.0 / 2 ** 20 + 1.0 / 2 ** 3) + (1.0 / 2 ** 3 + 1.0) + 2044.0
    assert with_ov.estimate() == apply_correction(e, 2045)


def test_apply_correction_infinity():
    # ratio >= 1 returns Double.POSITIVE_INFINITY in the reference
    # (:155), and Math.round maps it to Long.MAX_VALUE
    assert apply_correction(2048.0 * 2048 / 2 ** 66, 0) == \
        float("inf")
    from druid_spark.functions.hllc import _round_long
    assert _round_long(float("inf")) == (1 << 63) - 1


def test_apply_correction_regions():
    # high e (small raw sum) passes through uncorrected in the middle
    # band; zero registers trigger linear counting below the low bound
    assert apply_correction(2048.0, 2048) == 0  # log(1) = 0 distinct
    mid = apply_correction(10.0, 0)
    assert mid > 5 * 2048 / 2  # out of linear band, uncorrected


def test_engine_parity_flag_routes_estimates(spark):
    import datetime as dt

    from pyspark.sql import types as T

    from druid_spark import DruidSparkEngine

    sch = T.StructType([T.StructField("__time", T.TimestampType()),
                        T.StructField("d", T.StringType())])
    rows = [(dt.datetime(2024, 1, 1), f"u{i}") for i in range(300)]
    df = spark.createDataFrame(rows, sch)

    eng = DruidSparkEngine(spark, exact_approx=True,
                           hyperunique_parity=True)
    eng.catalog.register_table("hllc_t", df)
    got = eng.sql("SELECT APPROX_COUNT_DISTINCT_BUILTIN(d) AS c "
                  "FROM hllc_t").collect()[0].c
    # must equal the pure-Python collector over the same values
    assert got == estimate_values(f"u{i}" for i in range(300))
    # exact mode without parity keeps COUNT(DISTINCT)
    eng2 = DruidSparkEngine(spark, exact_approx=True)
    eng2.catalog.register_table("hllc_t2", df)
    assert eng2.sql("SELECT APPROX_COUNT_DISTINCT_BUILTIN(d) AS c "
                    "FROM hllc_t2").collect()[0].c == 300
    # native hyperUnique aggregator routes through the same collector
    got_native = eng.query({
        "queryType": "timeseries", "dataSource": "hllc_t",
        "granularity": "all",
        "aggregations": [{"type": "hyperUnique", "name": "u",
                          "fieldName": "d"}],
    }).collect()[0]["u"]
    assert got_native == estimate_values(f"u{i}" for i in range(300))
