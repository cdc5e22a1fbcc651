"""SparkSession factory tuned for the engine.

Defaults follow the scale guidance: AQE on (runtime re-plan + skew-join
handling), shuffle partitions sized to cores locally (on a real cluster
this should be ~2-3x total executor cores or left to AQE), Arrow on for
any pandas-UDF path, UTC session timezone (Druid's default; reference
processing/.../granularity/PeriodGranularity.java handles tz per-query).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "druid_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # read parquet TIMESTAMP(NANOS) as long; Catalog converts to timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Druid expression semantics: integer arithmetic wraps, bad casts
        # yield null — Java/legacy behavior, not ANSI errors
        .config("spark.sql.ansi.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
