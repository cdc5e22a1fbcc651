"""PySpark Python Data Source for Kafka (no JVM connector JAR needed).

Produces the SAME schema as Spark's built-in kafka source (key, value,
topic, partition, offset, timestamp, timestampType) so every consumer
of `read_stream({"type": "kafka", ...})` is identical whether the JVM
connector or this source serves it.

Scale model — this is the part that must survive a 1000-executor
cluster: `partitions(start, end)` emits ONE InputPartition per Kafka
partition with its (start, end) offset range, so each Spark task opens
its own socket and fetches only its range (the reference assigns
topic partitions to parallel indexing tasks the same way,
KafkaSupervisor.java task-group assignment). Offsets are tracked by
Structured Streaming's checkpoint (initialOffset/latestOffset/commit),
giving exactly-once together with the idempotent batch=<id> sink in
streaming/ingest.py.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

SOURCE_NAME = "druid_kafka"

_SCHEMA = ("key binary, value binary, topic string, partition int, "
           "offset bigint, timestamp timestamp, timestampType int")


class KafkaOffsetRange(InputPartition):
    def __init__(self, bootstrap: str, topic: str, partition: int,
                 start: int, end: int):
        self.bootstrap = bootstrap
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


class KafkaPythonDataSource(DataSource):
    """`spark.readStream.format("druid_kafka")` options:
    bootstrap (host:port), topic, startingOffsets earliest|latest."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> "KafkaStreamReader":
        return KafkaStreamReader(self.options)


class KafkaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.bootstrap = options.get(
            "bootstrap", options.get("kafka.bootstrap.servers"))
        if not self.bootstrap:
            raise ValueError("druid_kafka requires a bootstrap option")
        self.topic = options.get("topic") or options.get("subscribe")
        if not self.topic:
            raise ValueError("druid_kafka requires a topic option")
        self.starting = options.get("startingoffsets", "latest").lower()
        self._client = None

    def _cli(self):
        from druid_spark.streaming.kafka import KafkaClient
        if self._client is None:
            self._client = KafkaClient(self.bootstrap,
                                       client_id="druid-spark-driver")
        return self._client

    def _partitions(self) -> list[int]:
        meta = self._cli().metadata([self.topic])
        return sorted(meta["topics"][self.topic]["partitions"])

    # offsets are JSON-serializable dicts {"0": off, "1": off}
    def initialOffset(self) -> dict:
        ts = -2 if self.starting == "earliest" else -1
        return {str(p): self._cli().list_offset(self.topic, p, ts)
                for p in self._partitions()}

    def latestOffset(self) -> dict:
        return {str(p): self._cli().list_offset(self.topic, p, -1)
                for p in self._partitions()}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[KafkaOffsetRange]:
        if isinstance(start, str):  # checkpoint round-trips as JSON
            start = json.loads(start)
        if isinstance(end, str):
            end = json.loads(end)
        out = []
        for p, e in end.items():
            s = start.get(p, 0)
            if e > s:
                out.append(KafkaOffsetRange(self.bootstrap, self.topic,
                                            int(p), s, e))
        # Spark requires ≥1 partition per batch even when empty
        return out or [KafkaOffsetRange(self.bootstrap, self.topic,
                                        -1, 0, 0)]

    def read(self, part: KafkaOffsetRange) -> Iterator[tuple]:
        if part.partition < 0 or part.end <= part.start:
            return
        from druid_spark.streaming.kafka import KafkaClient
        cli = KafkaClient(part.bootstrap,
                          client_id=f"druid-spark-task-{part.partition}")
        try:
            off = part.start
            while off < part.end:
                recs = cli.fetch(part.topic, part.partition, off)
                if not recs:
                    break
                for o, ts, key, value in recs:
                    if o >= part.end:
                        return
                    yield (key, value, part.topic, part.partition, o,
                           _dt.datetime.fromtimestamp(
                               ts / 1000.0, tz=_dt.timezone.utc),
                           1)  # LOG_APPEND_TIME
                    off = o + 1
        finally:
            cli.close()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint

    def stop(self) -> None:
        if self._client is not None:
            self._client.close()


_REGISTERED: set[int] = set()


def ensure_registered(spark) -> None:
    """Idempotently register the source on this session."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.dataSource.register(KafkaPythonDataSource)
    _REGISTERED.add(key)
