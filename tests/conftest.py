import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("DRUID_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("druid_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    from druid_spark import DruidSparkEngine
    return DruidSparkEngine(spark, data_dir=SF_DIR, exact_approx=True)


@pytest.fixture(scope="session")
def foo(spark):
    """Druid's canonical 6-row `foo` test table (FIXTURES.md §A;
    reference TestDataBuilder.java:116)."""
    from pyspark.sql import types as T
    import datetime as dt

    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.ArrayType(T.StringType())),
        T.StructField("dim3", T.ArrayType(T.StringType())),
        T.StructField("cnt", T.LongType()),
        T.StructField("m1", T.FloatType()),
        T.StructField("m2", T.DoubleType()),
    ])
    ts = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        (ts("2000-01-01"), "", ["a"], ["a", "b"], 1, 1.0, 1.0),
        (ts("2000-01-02"), "10.1", [], ["b", "c"], 1, 2.0, 2.0),
        (ts("2000-01-03"), "2", [""], ["d"], 1, 3.0, 3.0),
        (ts("2001-01-01"), "1", ["a"], [""], 1, 4.0, 4.0),
        (ts("2001-01-02"), "def", ["abc"], None, 1, 5.0, 5.0),
        (ts("2001-01-03"), "abc", None, None, 1, 6.0, 6.0),
    ]
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="session")
def numfoo(spark):
    """Druid's canonical 6-row `numfoo` fixture (reference
    TestDataBuilder.java:350 RAW_ROWS1_WITH_NUMERIC_DIMS): foo plus
    numeric dims with nulls on rows 4-6 (and l2/dbl2/f2 null on row 1),
    single-value dim4/dim5/dim6."""
    from pyspark.sql import types as T
    import datetime as dt

    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.ArrayType(T.StringType())),
        T.StructField("dim3", T.ArrayType(T.StringType())),
        T.StructField("dim4", T.StringType()),
        T.StructField("dim5", T.StringType()),
        T.StructField("dim6", T.StringType()),
        T.StructField("dbl1", T.DoubleType()),
        T.StructField("dbl2", T.DoubleType()),
        T.StructField("f1", T.FloatType()),
        T.StructField("f2", T.FloatType()),
        T.StructField("l1", T.LongType()),
        T.StructField("l2", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("m1", T.FloatType()),
        T.StructField("m2", T.DoubleType()),
    ])
    ts = lambda s: __import__("datetime").datetime.fromisoformat(s)
    rows = [
        (ts("2000-01-01"), "", ["a"], ["a", "b"], "a", "aa", "1",
         1.0, None, 1.0, None, 7, None, 1, 1.0, 1.0),
        (ts("2000-01-02"), "10.1", [], ["b", "c"], "a", "ab", "2",
         1.7, 1.7, 0.1, 0.1, 325323, 325323, 1, 2.0, 2.0),
        (ts("2000-01-03"), "2", [""], ["d"], "a", "ba", "3",
         0.0, 0.0, 0.0, 0.0, 0, 0, 1, 3.0, 3.0),
        (ts("2001-01-01"), "1", ["a"], [""], "b", "ad", "4",
         None, None, None, None, None, None, 1, 4.0, 4.0),
        (ts("2001-01-02"), "def", ["abc"], [], "b", "aa", "5",
         None, None, None, None, None, None, 1, 5.0, 5.0),
        (ts("2001-01-03"), "abc", None, None, "b", "ab", "6",
         None, None, None, None, None, None, 1, 6.0, 6.0),
    ]
    return spark.createDataFrame(rows, schema)
