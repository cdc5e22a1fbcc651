"""Reference expression vectors — ExpressionsTest.java bindings and
expected values, run through the SQL layer.

The reference binds a one-row signature (ExpressionsTest.java:92-144:
a=10, b=25, p=3, x=2.25f, y=3, z=-2.25f, s='foo', hexstr='EF',
intstr='-100', spacey='  hey there  ', t=2000-02-03T04:05:06) and pins
each function's exact output. Here the same bindings live in a
single-row table and every vector asserts the same value.
"""

import pytest


@pytest.fixture(scope="module")
def xeng(spark):
    from druid_spark import DruidSparkEngine
    eng = DruidSparkEngine(spark, exact_approx=True)
    df = spark.createDataFrame(
        [(10, 25, 3, 2.25, 3, -2.25, "foo", "EF", "-100",
          "  hey there  ", "beep\nboop")],
        "a long, b long, p int, x double, y long, z double, s string, "
        "hexstr string, intstr string, spacey string, newliney string")
    eng.catalog.register_table("xt", df)
    return eng


def one(eng, expr):
    return eng.sql(f"SELECT {expr} AS v FROM xt").collect()[0]["v"]


def test_substring_vectors(xeng):
    """ExpressionsTest.java testSubstring (:199)."""
    assert one(xeng, "SUBSTRING(s, 1, 2)") == "fo"
    assert one(xeng, "SUBSTRING(s, 2, 1)") == "o"
    assert one(xeng, "SUBSTRING(s, 1)") == "foo"
    assert one(xeng, "SUBSTRING(s, 2)") == "oo"
    assert one(xeng, "SUBSTRING(s, 1, p)") == "foo"
    assert one(xeng, "SUBSTRING(spacey, p)") == "hey there  "
    assert one(xeng, "SUBSTRING(spacey, p, p)") == "hey"


def test_string_format_vectors(xeng):
    """testStringFormat (:715) — including the nonStrictFormat
    degradation when the literal format has more specifiers than args
    (StringUtils.java:381), and DOUBLE formatting of decimal
    literals (Druid has no DECIMAL type)."""
    assert one(xeng, "STRING_FORMAT('%x', b)") == "19"
    assert one(xeng, "STRING_FORMAT('%s %,d', s, 1234)") == "foo 1,234"
    assert one(xeng, "STRING_FORMAT('%s %,d', s)") == "%s %,d; foo"
    assert one(xeng, "STRING_FORMAT('%s %,d', s, 1234, 6789)") \
        == "foo 1,234"
    assert one(xeng, "STRING_FORMAT('%.2f %.2f %.2f', 1234.0, 123.4, "
                     "123.456789)") == "1234.00 123.40 123.46"
    assert one(xeng, "STRING_FORMAT('no args')") == "no args"


def test_strpos_position_vectors(xeng):
    """testStrpos (:774) / testPosition (:883)."""
    assert one(xeng, "STRPOS(s, 'oo')") == 2
    assert one(xeng, "STRPOS(s, 'ax')") == 0
    assert one(xeng, "STRPOS(CAST(NULL AS VARCHAR), 'ax')") is None
    assert one(xeng, "POSITION('oo' IN s)") == 2
    assert one(xeng, "POSITION('oo' IN s FROM 2)") == 2
    assert one(xeng, "POSITION('oo' IN s FROM 3)") == 0


def test_parse_long_vectors(xeng):
    """testParseLong (:808) — radix 16 strips a leading 0x; a
    non-parseable string is NULL (Function.java ParseLong:748)."""
    assert one(xeng, "PARSE_LONG(intstr)") == -100
    assert one(xeng, "PARSE_LONG(hexstr, 16)") == 239
    assert one(xeng, "PARSE_LONG('0x' || hexstr, 16)") == 239
    assert one(xeng, "PARSE_LONG(hexstr)") is None


def test_truncate_round_vectors(xeng):
    """testTruncate (:1045) / testRound (:1171)."""
    assert one(xeng, "TRUNCATE(x)") == 2.0
    assert one(xeng, "TRUNCATE(z)") == -2.0
    assert one(xeng, "TRUNCATE(x, 1)") == 2.2
    assert one(xeng, "TRUNCATE(z, 1)") == -2.2
    assert one(xeng, "ROUND(a)") == 10
    assert one(xeng, "ROUND(b)") == 25
    assert one(xeng, "ROUND(b, -1)") == 30
    assert one(xeng, "ROUND(x)") == 2.0
    assert one(xeng, "ROUND(x, 1)") == 2.3
    assert one(xeng, "ROUND(y)") == 3
    assert one(xeng, "ROUND(z)") == -2.0
    # deviation (documented in MIGRATION.md): ROUND(NaN/±Inf) passes
    # through here; the reference clamps to 0 / ±Double.MAX_VALUE
    # (Function.java Round:1492) because BigDecimal cannot hold them


def test_trim_pad_vectors(xeng):
    """testTrim (:1415) / testPad (:1452)."""
    assert one(xeng, "BTRIM(spacey)") == "hey there"
    assert one(xeng, "TRIM(LEADING ' h' FROM spacey)") == "ey there  "
    assert one(xeng, "TRIM(TRAILING ' e' FROM spacey)") == "  hey ther"
    assert one(xeng, "LPAD(s, 5, 'x')") == "xxfoo"
    assert one(xeng, "RPAD(s, 5, 'x')") == "fooxx"


def test_reverse_repeat_vectors(xeng):
    """testReverse (:2191) / testRepeat (:2391) — a repeat count below
    1 is NULL, not ''."""
    assert one(xeng, "REVERSE(s)") == "oof"
    assert one(xeng, "REVERSE(spacey)") == "  ereht yeh  "
    assert one(xeng, "REPEAT(s, 1)") == "foo"
    assert one(xeng, "REPEAT(s, 3)") == "foofoofoo"
    assert one(xeng, "REPEAT(s, -1)") is None
    assert one(xeng, "REPEAT(s, 0)") is None


def test_left_right_negative_raises(xeng):
    """testAbnormalLeftWithNegativeNumber (:2373) /
    testAbnormalRightWithNegativeNumber (:2301): a negative length is
    an error, not an empty string."""
    assert one(xeng, "LEFT(s, 2)") == "fo"
    assert one(xeng, "RIGHT(s, 2)") == "oo"
    assert one(xeng, "LEFT(s, 10)") == "foo"
    assert one(xeng, "RIGHT(s, 10)") == "foo"
    assert one(xeng, "RIGHT(s, 0)") == ""
    with pytest.raises(Exception, match=r"positive integer"):
        one(xeng, "LEFT(s, -1)")
    with pytest.raises(Exception, match=r"positive integer"):
        one(xeng, "RIGHT(s, -1)")


def test_contains_vectors(xeng):
    """testContains (:1478) / testCharacterLength (:182)."""
    assert one(xeng, "CONTAINS_STRING(s, 'oo')") is True
    assert one(xeng, "CONTAINS_STRING(s, 'ax')") is False
    assert one(xeng, "ICONTAINS_STRING(UPPER(s), 'oo')") is True
    assert one(xeng, "CHARACTER_LENGTH(s)") == 3
    assert one(xeng, "POWER(a, 2)") == 100.0


def test_native_expression_parity(xeng):
    """The native expression layer (expr.py) matches the fixed SQL
    semantics: parse_long hex strip, repeat<1 → null."""
    from druid_spark.expr import compile_expr
    from pyspark.sql import functions as F
    df = xeng.catalog.table("xt")
    row = df.select(
        compile_expr("parse_long('0xEF', 16)", F.col).alias("pl"),
        compile_expr("repeat('ab', -2)", F.col).alias("rp"),
        compile_expr("repeat('ab', 2)", F.col).alias("rp2"),
        compile_expr("left('foo', 2)", F.col).alias("lf"),
        compile_expr("right('foo', 10)", F.col).alias("rt"),
    ).collect()[0]
    assert row["pl"] == 239 and row["rp"] is None
    assert row["rp2"] == "abab" and row["lf"] == "fo" and row["rt"] == "foo"


def test_time_parse_format_vectors(xeng):
    """testTimeParse (:1945) / testTimeFormat (:1970) — tz-aware
    3-arg forms: parsing '2000-02-03 04:05:06' as LA local time is
    2000-02-03T12:05:06Z."""
    assert str(one(xeng, "TIME_PARSE('2000-02-03 04:05:06', "
                         "'yyyy-MM-dd HH:mm:ss')")) \
        == "2000-02-03 04:05:06"
    assert str(one(xeng, "TIME_PARSE('2000-02-03 04:05:06', "
                         "'yyyy-MM-dd HH:mm:ss', "
                         "'America/Los_Angeles')")) \
        == "2000-02-03 12:05:06"
    assert one(xeng, "TIME_FORMAT(TIMESTAMP '2000-02-03 04:05:06', "
                     "'yyyy-MM-dd HH:mm:ss')") == "2000-02-03 04:05:06"
    assert one(xeng, "TIME_FORMAT(TIMESTAMP '2000-02-03 04:05:06', "
                     "'yyyy-MM-dd HH:mm:ss', 'America/Los_Angeles')") \
        == "2000-02-02 20:05:06"


def test_cast_timestamp_vectors(xeng):
    """testCastAsTimestamp/FromTimestamp/AsDate/FromDate (:2019-2190):
    string↔timestamp↔date casts and the millis BIGINT identity."""
    t = "TIMESTAMP '2000-02-03 04:05:06'"
    assert str(one(xeng, "CAST('2000-02-03 04:05:06' AS TIMESTAMP)")) \
        == "2000-02-03 04:05:06"
    assert one(xeng, f"CAST({t} AS VARCHAR)") == "2000-02-03 04:05:06"
    assert one(xeng, f"CAST({t} AS BIGINT)") == 949550706000
    assert str(one(xeng, f"CAST({t} AS DATE)")) == "2000-02-03"
    assert str(one(xeng, "CAST('2000-02-03' AS DATE)")) == "2000-02-03"


def test_interval_arithmetic_vectors(xeng):
    """testTimePlus/MinusDayTimeInterval and YearMonthInterval
    (:1851-1944): joda Period calendar addition; 13 months from
    2000-02-03 is 2001-03-03 (month clamp not needed here, leap year
    covered by the P1Y1M round trip)."""
    t = "TIMESTAMP '2000-02-03 04:05:06'"
    assert str(one(xeng, f"{t} + INTERVAL '1 01:01' DAY TO MINUTE")) \
        == "2000-02-04 05:06:06"
    assert str(one(xeng, f"{t} - INTERVAL '1 01:01' DAY TO MINUTE")) \
        == "2000-02-02 03:04:06"
    assert str(one(xeng, f"{t} + INTERVAL '1-1' YEAR TO MONTH")) \
        == "2001-03-03 04:05:06"
    assert str(one(xeng, f"{t} - INTERVAL '1-1' YEAR TO MONTH")) \
        == "1999-01-03 04:05:06"
