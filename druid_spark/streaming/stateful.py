"""Stateful streaming operators beyond ingest-rollup.

The reference's streaming model is continuous ingestion into a
queryable table (SURVEY §2.10) — it has no stream-relational operators.
These are the beyond-reference pieces a training-data pipeline needs on
a live stream, built on Structured Streaming's own state store so they
scale with the shuffle (state is partitioned by group key, checkpointed,
and recovered exactly-once — nothing driver-side):

- sessionize: event-time session windows (F.session_window — JVM-side
  native session aggregation, watermark-bounded state).
- streaming_dedup: drop duplicate keys within the watermark horizon
  (dropDuplicatesWithinWatermark — the state store keeps one entry per
  key and expires it when the watermark passes; the exact-dedup
  fingerprint path of datapipe/dedup.py applied to a stream).
- running_profile: per-key running aggregates via
  applyInPandasWithState when the built-ins can't express the
  semantics (custom accumulator shape + TTL) — Arrow-batched, one
  state row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(stream: DataFrame, time_col: str = "timestamp",
               key_col: str = "user", gap: str = "5 minutes",
               watermark: str = "10 minutes") -> DataFrame:
    """Event-time sessionization: rows with the same key closer than
    `gap` merge into one session; emits one row per closed session with
    start/end/duration/event count. State is bounded by the watermark.
    Works on batch DataFrames too (session_window is a normal
    aggregation there; the watermark only applies to streams)."""
    if stream.isStreaming:
        stream = stream.withWatermark(time_col, watermark)
    return (stream
            .groupBy(F.session_window(F.col(time_col), gap).alias("sw"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("events"))
            .select(key_col,
                    F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"),
                    (F.unix_millis("sw.end")
                     - F.unix_millis("sw.start")).alias("duration_ms"),
                    "events"))


def streaming_dedup(stream: DataFrame, key_cols: list[str],
                    time_col: str = "timestamp",
                    watermark: str = "10 minutes") -> DataFrame:
    """Keep the first row per key within the watermark horizon — the
    streaming form of exact dedup (state: one entry per key, expired as
    the watermark advances, so memory is bounded at any scale)."""
    return (stream
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def running_profile(stream: DataFrame, key_col: str = "user",
                    value_col: str = "v", time_col: str = "timestamp",
                    watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator: per-key running (count, sum, max) kept
    in the state store via applyInPandasWithState — the pattern for
    accumulator shapes the built-in aggregates can't express. Emits one
    updated row per key per micro-batch; Arrow-batched both ways."""
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    out_schema = ("key string, n bigint, total double, mx double")
    state_schema = "n bigint, total double, mx double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        n, total, mx = (state.get if state.exists
                        else (0, 0.0, float("-inf")))
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += int(vals.count())
            total += float(vals.sum()) if len(vals) else 0.0
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        yield pd.DataFrame([{"key": key[0], "n": n, "total": total,
                             "mx": mx}])

    return (stream
            .withWatermark(time_col, watermark)
            .groupBy(F.col(key_col))
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))
