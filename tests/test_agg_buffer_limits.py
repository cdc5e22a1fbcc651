"""Round-12 aggregation buffer/size-limit contracts.

1. The windowed STRING_AGG spelling is EXEMPT from the 1024-byte
   collection cap (sqlshim deliberately leaves OVER(...) forms
   untouched). The reference corpus carries no windowed STRING_AGG
   golden, so the exemption is pinned here as the engine's contract:
   the cap models ExpressionLambdaAggregatorFactory's per-accumulate
   byte check on the AGGREGATION path
   (ExpressionLambdaAggregatorFactory.java:69), and the windowed
   rewrite never routes through that factory.

2. The aggregation-buffer capacity refusal: many buffer-sized
   ARRAY_AGGs whose declared slots exceed the reference's processing
   buffer refuse with the reference's spelling
   (ByteBufferHashTable.java:123 "Not enough capacity for even one
   row!"; QueryStackTests.COMPUTE_BUFFER_SIZE = 10 MiB), while a
   SINGLE over-capacity declaration and the same shape with
   STRING_AGG pass (array_agg_misc_test005 A06 / string_agg_misc
   _test003 A01 goldens).
"""
import pytest


@pytest.fixture(scope="module")
def wide(spark):
    # 3 rows x 600 chars: any grouped STRING_AGG exceeds 1024 bytes
    rows = [(g, "x" * 600) for g in ("a", "a", "a")]
    return spark.createDataFrame(rows, "g string, s string")


def test_grouped_string_agg_hits_cap(engine, wide):
    engine.catalog.register_table("wide_cap", wide)
    with pytest.raises(Exception, match="Exceeded memory usage"):
        engine.sql(
            "SELECT g, STRING_AGG(s, ',') AS c FROM wide_cap GROUP BY g"
        ).collect()


def test_windowed_string_agg_exempt_from_cap(engine, wide):
    engine.catalog.register_table("wide_cap", wide)
    rows = engine.sql(
        "SELECT STRING_AGG(s, ',') OVER (PARTITION BY g) AS c "
        "FROM wide_cap").collect()
    assert len(rows) == 3
    # 3 x 600 chars + separators: far past the aggregation-path cap
    assert all(len(r.c) > 1024 for r in rows)


def test_array_agg_buffer_capacity_refusal(engine, wide):
    engine.catalog.register_table("wide_cap", wide)
    aggs = ", ".join(
        f"ARRAY_LENGTH(ARRAY_AGG(s||'{i}', 100000)) AS c{i}"
        for i in range(100))
    with pytest.raises(Exception,
                       match="Not enough capacity for even one row"):
        engine.sql(f"SELECT {aggs} FROM wide_cap").collect()


def test_single_overcapacity_array_agg_passes(engine, wide):
    engine.catalog.register_table("wide_cap", wide)
    rows = engine.sql(
        "SELECT ARRAY_LENGTH(ARRAY_AGG(s, 2147483647)) AS c "
        "FROM wide_cap").collect()
    assert rows[0].c == 3


def test_many_sized_string_aggs_pass(engine, wide):
    engine.catalog.register_table("wide_cap", wide)
    aggs = ", ".join(
        f"LENGTH(STRING_AGG(s||'{i}', ',', 100000)) AS c{i}"
        for i in range(100))
    rows = engine.sql(f"SELECT {aggs} FROM wide_cap").collect()
    assert rows[0].c0 == 3 * 601 + 2
