"""r13: seeded kill-point chaos matrix for exactly-once streaming.

The reference's transactional segment publish
(idx/common/actions/SegmentTransactionalInsertAction.java:56) commits
segments and consumer offsets atomically, so a task crash at ANY point
of the persist/publish cycle yields no duplicates and no loss on
restart.  The engine's analog is Structured Streaming's offset WAL +
the idempotent batch=<id> overwrite sink (streaming/ingest.py).  This
matrix kills the pipeline at each distinct crash point of a
micro-batch's lifecycle, for both real-wire sources:

- pre_write             offsets WAL written, no sink data, no commit
- mid_write             partial sink data (part-files missing), no commit
- post_write_pre_commit sink data complete, commit marker lost
- post_commit           batch fully committed (restart resumes clean)

After each kill + restart + second wave, every produced record must
appear exactly once.
"""
import json
import os
import shutil
import time

import pytest

KILL_POINTS = ["pre_write", "mid_write", "post_write_pre_commit",
               "post_commit"]


def _run_until(spark, start_supervisor, spec, whdir, n):
    """Run a supervisor on a processingTime trigger until the view
    holds >= n rows (a replayed WAL batch plus fresh batches — the
    availableNow trigger degrades to one-batch semantics on restart,
    which would stop after the replay)."""
    ingest, q = start_supervisor(spark, spec, whdir,
                                 trigger={"processingTime": "1 seconds"})
    try:
        for _ in range(90):
            time.sleep(1)
            try:
                if ingest.view().count() >= n:
                    break
            except ValueError:
                continue
    finally:
        q.stop()
        q.awaitTermination(30)
        for _ in range(100):
            if not q.isActive:
                break
            time.sleep(0.1)
    return ingest


def _rm_log_entry(logdir, name):
    os.remove(os.path.join(logdir, name))
    crc = os.path.join(logdir, f".{name}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def _kill(ingest, kill_point: str) -> None:
    """Mutate checkpoint + sink to the state a crash at `kill_point`
    of the NEWEST COMMITTED batch would leave behind."""
    if kill_point == "post_commit":
        return
    commits = os.path.join(ingest.checkpoint, "commits")
    newest = max((f for f in os.listdir(commits)
                  if not f.startswith(".")), key=int)
    _rm_log_entry(commits, newest)
    # A crash INSIDE batch `newest` happens before offsets for any
    # later batch exist, but at q.stop() the offsets WAL may have raced
    # one batch ahead (an in-flight empty batch). Leaving those offsets
    # fabricates a state no real crash produces — Spark's restart
    # replays only the single latest uncommitted batch, so it would
    # silently skip `newest` and never rewrite its killed part files.
    # Truncate offsets (and any later batch dirs) to the killed batch.
    offsets = os.path.join(ingest.checkpoint, "offsets")
    for f in os.listdir(offsets):
        if not f.startswith(".") and int(f) > int(newest):
            _rm_log_entry(offsets, f)
    for fn in os.listdir(ingest.tail):
        if fn.startswith("batch=") and int(fn.split("=")[1]) > int(newest):
            shutil.rmtree(os.path.join(ingest.tail, fn))
    if kill_point == "post_write_pre_commit":
        return
    bdir = os.path.join(ingest.tail, f"batch={newest}")
    if kill_point == "pre_write":
        if os.path.isdir(bdir):
            shutil.rmtree(bdir)
        return
    # mid_write: drop half the part files (at least one)
    parts = sorted(f for f in os.listdir(bdir)
                   if f.endswith(".parquet") and not f.startswith("."))
    for f in parts[: max(1, len(parts) // 2)]:
        os.remove(os.path.join(bdir, f))
        pc = os.path.join(bdir, f".{f}.crc")
        if os.path.exists(pc):
            os.remove(pc)


def _assert_exactly_once(ingest, n_total: int):
    rows = ingest.view().collect()
    vals = sorted(r["v"] for r in rows)
    assert vals == list(range(n_total)), \
        (len(vals), n_total, vals[:5], vals[-5:])


@pytest.mark.parametrize("kill_point", KILL_POINTS)
def test_kafka_chaos_matrix(spark, kill_point, tmp_path):
    from druid_spark.streaming.ingest import start_supervisor
    from druid_spark.streaming.kafka import KafkaClient, MiniKafkaBroker

    with MiniKafkaBroker(num_partitions=2) as broker:
        cli = KafkaClient(broker.bootstrap)
        try:
            def produce(lo, hi):
                for i in range(lo, hi):
                    cli.produce("chaos", i % 2, [(
                        1700000000000 + i, None,
                        json.dumps({"timestamp":
                                    f"2024-01-01T00:{i // 60:02d}:"
                                    f"{i % 60:02d}Z",
                                    "v": i}).encode())])
            spec = {"type": "kafka", "spec": {
                "dataSchema": {"dataSource": f"chaos_{kill_point}",
                               "timestampSpec": {"column": "timestamp"},
                               "granularitySpec": {"rollup": False}},
                "ioConfig": {
                    "topic": "chaos",
                    "consumerProperties": {
                        "bootstrap.servers": broker.bootstrap},
                    "useEarliestOffset": True,
                    "valueSchema": "timestamp timestamp, v long"}}}
            produce(0, 20)
            ingest = _run_until(spark, start_supervisor, spec,
                                str(tmp_path), 20)
            _assert_exactly_once(ingest, 20)
            _kill(ingest, kill_point)
            produce(20, 30)
            ingest2 = _run_until(spark, start_supervisor, spec,
                                 str(tmp_path), 30)
            _assert_exactly_once(ingest2, 30)
            # the handoff promotion stays duplicate-free too
            ingest2.handoff()
            _assert_exactly_once(ingest2, 30)
        finally:
            cli.close()


@pytest.mark.parametrize("kill_point", KILL_POINTS)
def test_kinesis_chaos_matrix(spark, kill_point, tmp_path):
    from druid_spark.streaming.ingest import start_supervisor
    from druid_spark.streaming.kinesis import (KinesisClient,
                                               MiniKinesisServer)

    with MiniKinesisServer() as kinesis:
        cli = KinesisClient(kinesis.endpoint)
        cli.create_stream("chaos", shards=2)

        def produce(lo, hi):
            cli.put_records("chaos", [(
                json.dumps({"timestamp": f"2024-01-01T00:{i // 60:02d}:"
                            f"{i % 60:02d}Z", "v": i}).encode(),
                str(i)) for i in range(lo, hi)])

        spec = {"spec": {
            "dataSchema": {"dataSource": f"kchaos_{kill_point}",
                           "timestampSpec": {"column": "timestamp"},
                           "granularitySpec": {"rollup": False}},
            "ioConfig": {
                "stream": "chaos",
                "endpoint": kinesis.endpoint,
                "useEarliestSequenceNumber": True,
                "valueSchema": "timestamp timestamp, v long"}}}

        produce(0, 20)
        ingest = _run_until(spark, start_supervisor, spec,
                            str(tmp_path), 20)
        _assert_exactly_once(ingest, 20)
        _kill(ingest, kill_point)
        produce(20, 30)
        ingest2 = _run_until(spark, start_supervisor, spec,
                             str(tmp_path), 30)
        _assert_exactly_once(ingest2, 30)
        ingest2.handoff()
        _assert_exactly_once(ingest2, 30)
