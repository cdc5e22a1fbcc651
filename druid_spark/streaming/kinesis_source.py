"""PySpark Python Data Source for AWS Kinesis (no JVM connector/SDK).

Mirror of kafka_source.py for the Kinesis wire API (streaming/
kinesis.py): output schema (data, streamName, shardId, sequenceNumber,
partitionKey, approximateArrivalTimestamp) matches the fields the
reference's Kinesis indexing service consumes
(extensions-core/kinesis-indexing-service/.../
KinesisRecordSupplier.java OrderedPartitionableRecord).

Scale model: `partitions(start, end)` emits ONE InputPartition per
shard with its (afterSeq, untilSeq] range — each Spark task opens its
own HTTP session and pages GetRecords for only its shard, the same
shard→task-group assignment the reference supervisor makes
(supervisor/KinesisSupervisor.java). Offsets (per-shard sequence
numbers) live in the Structured Streaming checkpoint; together with
the idempotent batch=<id> sink in streaming/ingest.py this is
exactly-once.

Driver-side tip probe: Kinesis (unlike Kafka) has no "end offset"
API — the tip is only learnable by reading. latestOffset() advances a
per-shard probe iterator and records the last sequence number seen,
discarding the payloads; executors then re-fetch their (start, end]
ranges. The probe reads each record once on the driver — acceptable
for supervisor-scale streams; deployments with the JVM Kinesis
connector on the classpath get it via read_stream's JVM-first path.
Deterministic replay holds because a batch's (start, end] is fixed at
plan time — a task retry re-reads exactly its range.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

SOURCE_NAME = "druid_kinesis"

_SCHEMA = ("data binary, streamName string, shardId string, "
           "sequenceNumber string, partitionKey string, "
           "approximateArrivalTimestamp timestamp")


class KinesisSeqRange(InputPartition):
    def __init__(self, endpoint: str, stream: str, shard_id: str,
                 after: str | None, until: str):
        self.endpoint = endpoint
        self.stream = stream
        self.shard_id = shard_id
        self.after = after      # exclusive lower bound (None = horizon)
        self.until = until      # inclusive upper bound


class KinesisPythonDataSource(DataSource):
    """`spark.readStream.format("druid_kinesis")` options:
    endpoint (URL), stream, startingposition trim_horizon|latest."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> "KinesisStreamReader":
        return KinesisStreamReader(self.options)


class KinesisStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("druid_kinesis requires an endpoint option")
        self.stream = options.get("stream")
        if not self.stream:
            raise ValueError("druid_kinesis requires a stream option")
        self.starting = options.get(
            "startingposition", "latest").lower()
        self._client = None
        self._iters: dict[str, str] = {}   # shard → probe iterator
        self._tips: dict[str, str] = {}    # shard → last seq seen

    def _cli(self):
        from druid_spark.streaming.kinesis import KinesisClient
        if self._client is None:
            self._client = KinesisClient(self.endpoint)
        return self._client

    def _shards(self) -> list[str]:
        return sorted(s["ShardId"]
                      for s in self._cli().list_shards(self.stream))

    def _probe(self, shard: str) -> str:
        """Advance this shard's probe iterator to the tip; return the
        last sequence number seen ('' when nothing has ever arrived)."""
        cli = self._cli()
        it = self._iters.get(shard)
        if it is None:
            it = cli.get_shard_iterator(self.stream, shard,
                                        "TRIM_HORIZON")
        while True:
            out = cli.get_records(it, limit=10000)
            recs = out.get("Records", [])
            if recs:
                self._tips[shard] = recs[-1]["SequenceNumber"]
            it = out.get("NextShardIterator") or it
            if not recs or out.get("MillisBehindLatest", 0) == 0:
                break
        self._iters[shard] = it
        return self._tips.get(shard, "")

    # offsets: JSON dict {shardId: lastConsumedSeq} ('' = none yet)
    def initialOffset(self) -> dict:
        out = {}
        for sh in self._shards():
            if self.starting in ("latest",):
                # tip discovery requires reading — drain once at start
                # (documented cost; supervisors usually run earliest)
                out[sh] = self._probe(sh)
            else:  # trim_horizon / earliest
                out[sh] = ""
        return out

    def latestOffset(self) -> dict:
        return {sh: self._probe(sh) for sh in self._shards()}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[KinesisSeqRange]:
        if isinstance(start, str):
            start = json.loads(start)
        if isinstance(end, str):
            end = json.loads(end)
        out = []
        for sh, until in end.items():
            after = start.get(sh, "")
            if until and (not after or int(until) > int(after)):
                out.append(KinesisSeqRange(
                    self.endpoint, self.stream, sh,
                    after or None, until))
        return out or [KinesisSeqRange(self.endpoint, self.stream,
                                       "", None, "")]

    def read(self, part: KinesisSeqRange) -> Iterator[tuple]:
        if not part.shard_id or not part.until:
            return
        from druid_spark.streaming.kinesis import KinesisClient
        cli = KinesisClient(part.endpoint)
        if part.after is None:
            it = cli.get_shard_iterator(part.stream, part.shard_id,
                                        "TRIM_HORIZON")
        else:
            it = cli.get_shard_iterator(
                part.stream, part.shard_id,
                "AFTER_SEQUENCE_NUMBER", part.after)
        until = int(part.until)
        while True:
            out = cli.get_records(it, limit=10000)
            recs = out.get("Records", [])
            for r in recs:
                seq = r["SequenceNumber"]
                if int(seq) > until:
                    return
                yield (r["Data"], part.stream, part.shard_id, seq,
                       r.get("PartitionKey"),
                       _dt.datetime.fromtimestamp(
                           float(r["ApproximateArrivalTimestamp"]),
                           tz=_dt.timezone.utc))
                if int(seq) == until:
                    return
            it = out.get("NextShardIterator")
            if not recs or not it:
                return

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint

    def stop(self) -> None:
        pass


_REGISTERED: set[int] = set()


def ensure_registered(spark) -> None:
    """Idempotently register the source on this session."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.dataSource.register(KinesisPythonDataSource)
    _REGISTERED.add(key)
