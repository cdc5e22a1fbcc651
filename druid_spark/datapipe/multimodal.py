"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-preserving mapInPandas,
Arrow batch shapes) is real and tested; the actual decode/resample
steps are STUBBED (image/audio libs are not in this container) behind
`decode_stub=True` → a deterministic fake derived from the bytes, or
NotImplementedError when a real decode is requested.

Pattern for 100 TB: binary payloads ride in their own column so Parquet
column pruning skips them unless the operator touches them; feature
extraction runs as Arrow-batched mapInPandas with
`spark.sql.files.maxPartitionBytes` tuned down so one task's batch of
decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),      # typed metadata
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-then-embedded feature:
    dim floats derived from the sha256 of the payload."""
    h = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(h[4 * i: 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8,
                     decode_stub: bool = True) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    With decode_stub=False this is where PIL/librosa/pyav decoding would
    run per batch; not available in this container →
    NotImplementedError (clearly-marked stub per the build contract).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/av — not in container; "
            "use decode_stub=True")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": [_fake_feature(p, dim) for p in pdf["payload"]],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
            })
            yield out

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  decode_stub: bool = True) -> DataFrame:
    """Image resize plumbing: metadata columns update JVM-side; payload
    transform is the stubbed decode step (identity bytes under stub)."""
    if not decode_stub:
        raise NotImplementedError("real resize requires PIL — use decode_stub")
    return (df.where(F.col("kind") == "image")
            .withColumn("width", F.lit(width))
            .withColumn("height", F.lit(height)))


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: emits one row per sampled timestamp with
    frame metadata; frame extraction itself is the stubbed step."""
    if not decode_stub:
        raise NotImplementedError("real frame decode requires av — use decode_stub")
    return (df.where(F.col("kind") == "video")
            .withColumn(
                "frame_ts",
                F.explode(F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"))))
            .select("media_id", "frame_ts", "mime"))


def demo_media_df(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append((i, kind, bytearray(payload), f"x/{kind}",
                     64 if kind == "image" else None,
                     48 if kind == "image" else None,
                     5000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
