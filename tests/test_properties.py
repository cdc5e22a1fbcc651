"""Randomized property tests (seeded): vectorized over one DataFrame
per property so the Spark job count stays tiny.

- alphanumeric sort key ordering == a python reference of the
  reference's alphanumeric comparator (StringComparators.java:34-39)
- granularity bucketing: bucket <= ts < bucket + width, origin-aligned
- ipv4 parse/stringify round trip
"""

import random
import re

from pyspark.sql import functions as F


def _py_alnum_key(s):
    """python reference of the java-alphanum comparator: digit chunks
    by (significant length, digits, leading-zero count), before letter
    chunks."""
    out = []
    for t in re.findall(r"\d+|\D+", s):
        if t[0].isdigit():
            sig = t.lstrip("0")
            out.append((0, len(sig), sig, len(t) - len(sig)))
        else:
            out.append((1, 0, t, 0))
    return out


def test_alphanumeric_comparator_property(spark):
    from druid_spark.filters import alnum_sort_key
    rng = random.Random(42)
    alpha = "abxyz"
    strs = set()
    for _ in range(500):
        n = rng.randint(1, 4)
        s = "".join(
            (str(rng.randint(0, 99999)) if rng.random() < 0.5
             else rng.choice(alpha) * rng.randint(1, 2))
            for _ in range(n))
        strs.add(s)
    strs = sorted(strs)
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    got = [r["s"] for r in
           df.orderBy(alnum_sort_key(F.col("s")), F.col("s")).collect()]
    want = sorted(strs, key=lambda s: (_py_alnum_key(s), s))
    assert got == want


def test_granularity_bucket_property(spark):
    from druid_spark.granularity import bucket
    rng = random.Random(7)
    rows = [(rng.randint(1577836800000, 1735689600000),) for _ in range(500)]
    df = spark.createDataFrame(rows, ["ms"]).withColumn(
        "ts", F.timestamp_millis(F.col("ms")))
    for gran, width in [
            ({"type": "duration", "duration": 90_000}, 90_000),
            ({"type": "period", "period": "PT6H"}, 6 * 3600 * 1000),
            ({"type": "period", "period": "PT90S",
              "origin": "2020-01-01T00:00:33Z"}, 90_000)]:
        b = F.unix_millis(bucket(F.col("ts"), gran))
        bad = df.where(~((b <= F.col("ms"))
                         & (F.col("ms") < b + width))).count()
        assert bad == 0, f"{gran}: {bad} rows outside their bucket"
        if "origin" in gran:
            mis = df.where(F.pmod(b - 33_000, F.lit(width)) != 0).count()
            assert mis == 0, "bucket not aligned to origin"


def test_ipv4_roundtrip_property(spark):
    rng = random.Random(3)
    ips = ["%d.%d.%d.%d" % (rng.randint(0, 255), rng.randint(0, 255),
                            rng.randint(0, 255), rng.randint(0, 255))
           for _ in range(500)]
    df = spark.createDataFrame([(s,) for s in ips], ["ip"])
    from druid_spark.expr import compile_expr
    back = compile_expr("ipv4_stringify(ipv4_parse(ip))", F.col)
    assert df.where(back != F.col("ip")).count() == 0


def test_version_comparator_ladder(spark):
    """maven-style version ordering (StringComparators VersionComparator
    → DefaultArtifactVersion): qualifier ladder, null padding, numeric
    tokens above qualifiers."""
    from druid_spark.filters import version_sort_key
    versions = ["1.0-alpha", "1.0-beta", "1.0-milestone", "1.0-rc",
                "1.0-snapshot", "1.0", "1.0-sp", "1.0-xyz", "1.0-1",
                "1.0.1", "1.1", "0.9", "1.2.9", "1.2.10", "2"]
    df = spark.createDataFrame([(v,) for v in versions], ["v"])
    got = [r["v"] for r in df.orderBy(version_sort_key(F.col("v"))).collect()]
    assert got == ["0.9", "1.0-alpha", "1.0-beta", "1.0-milestone",
                   "1.0-rc", "1.0-snapshot", "1.0", "1.0-sp", "1.0-xyz",
                   "1.0-1", "1.0.1", "1.1", "1.2.9", "1.2.10", "2"]
    # null padding: synonymous spellings produce identical keys
    syn = spark.createDataFrame(
        [("1",), ("1.0",), ("1.0.0",), ("1.0.ga",), ("1.0.0-FINAL",)],
        ["v"])
    keys = set(r["k"] for r in
               syn.select(version_sort_key(F.col("v")).alias("k")).collect())
    assert len(keys) == 1


# ---------------------------------------------------------------- sqlshim
def test_dq_ident_pass_properties():
    """Double-quote→backtick identifier pass: string literals survive
    verbatim, doubled "" inside identifiers unescape, mixed nesting."""
    from druid_spark.functions.sqlshim import _dq_idents_to_backticks as dq

    assert dq('SELECT "a" FROM "t"') == "SELECT `a` FROM `t`"
    # double quotes inside single-quoted literals are untouched
    assert dq("SELECT 'he said \"hi\"'") == "SELECT 'he said \"hi\"'"
    # '' escape inside a literal does not end the literal
    assert dq("SELECT 'it''s \"q\"', \"c\"") == "SELECT 'it''s \"q\"', `c`"
    # "" escape inside an identifier becomes a literal quote
    assert dq('SELECT "we""ird"') == 'SELECT `we"ird`'
    # idempotent on SQL without double quotes
    s = "SELECT a, 'x' FROM t WHERE b = 'y'"
    assert dq(s) == s


def test_dq_ident_pass_hypothesis():
    """Round-trip: for random identifier/literal mixes the pass maps
    every double-quoted identifier to a backticked one and leaves
    single-quoted content byte-identical."""
    from hypothesis import given, settings, strategies as st
    from druid_spark.functions.sqlshim import _dq_idents_to_backticks as dq

    ident = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                               whitelist_characters="_ "),
        min_size=1, max_size=12)
    lit = st.text(
        alphabet=st.characters(blacklist_characters="'",
                               whitelist_categories=("Ll", "Nd"),
                               whitelist_characters=' "`'),
        max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(ident, lit), min_size=1, max_size=5))
    def run(pairs):
        sql = "SELECT " + ", ".join(
            f'"{i}", \'{s}\'' for i, s in pairs)
        out = dq(sql)
        expect = "SELECT " + ", ".join(
            f"`{i.replace(chr(96), chr(96) * 2)}`, '{s}'"
            for i, s in pairs)
        assert out == expect

    run()
