"""Pure-Python Kafka wire protocol: client + in-process test broker.

The reference ships a Kafka indexing service whose supervisor manages
consumer tasks reading (topic, partition, offset) ranges
(extensions-core/kafka-indexing-service/.../KafkaSupervisor.java:90,
KafkaRecordSupplier.java). This container has no Kafka broker or JVM
connector JAR, so this module implements the PUBLIC Kafka wire
protocol (kafka.apache.org/protocol) directly:

- `KafkaClient`: a minimal consumer/producer speaking Metadata v0,
  Produce v2, Fetch v2, ListOffsets v1 over a plain socket. Message
  format v1 (magic=1: crc | magic | attributes | timestamp | key |
  value), the stable pre-RecordBatch encoding every broker still
  serves for old api versions.
- `MiniKafkaBroker`: an in-process threaded broker good enough to
  serve those four APIs against an in-memory log — the test double
  standing in for a real cluster. Because it speaks the real wire
  format, the client code path is identical against a production
  broker.

The Spark side consumes this through a PySpark Python Data Source
(kafka_source.py) — per-partition offset ranges fetched inside
executor tasks, offsets checkpointed by Structured Streaming.
"""

from __future__ import annotations

import io
import socket
import socketserver
import struct
import threading
import time
import zlib
from typing import Any

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3

ERR_NONE = 0
ERR_UNKNOWN_TOPIC = 3
ERR_OFFSET_OUT_OF_RANGE = 1


# ---------------------------------------------------------------- encoding

def _i8(v: int) -> bytes:
    return struct.pack(">b", v)


def _i16(v: int) -> bytes:
    return struct.pack(">h", v)


def _i32(v: int) -> bytes:
    return struct.pack(">i", v)


def _i64(v: int) -> bytes:
    return struct.pack(">q", v)


def _string(s: str | None) -> bytes:
    if s is None:
        return _i16(-1)
    b = s.encode("utf-8")
    return _i16(len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return _i32(-1)
    return _i32(len(b)) + b


def _array(items: list[bytes]) -> bytes:
    return _i32(len(items)) + b"".join(items)


class _Reader:
    def __init__(self, data: bytes):
        self.b = io.BytesIO(data)

    def i8(self) -> int:
        return struct.unpack(">b", self.b.read(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.b.read(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.b.read(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.b.read(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        return self.b.read(n).decode("utf-8")

    def bytes(self) -> bytes | None:
        n = self.i32()
        if n < 0:
            return None
        return self.b.read(n)

    def remaining(self) -> int:
        pos = self.b.tell()
        self.b.seek(0, io.SEEK_END)
        end = self.b.tell()
        self.b.seek(pos)
        return end - pos


# ----------------------------------------------------- message set (v1)

def encode_message(timestamp_ms: int, key: bytes | None,
                   value: bytes | None) -> bytes:
    """One magic-1 message body: crc32 over magic..value."""
    after_crc = (_i8(1) + _i8(0) + _i64(timestamp_ms)
                 + _bytes(key) + _bytes(value))
    crc = zlib.crc32(after_crc) & 0xFFFFFFFF
    return struct.pack(">I", crc) + after_crc


def encode_message_set(
        base_offset: int,
        msgs: list[tuple[int, bytes | None, bytes | None]]) -> bytes:
    """[(timestamp_ms, key, value)] → on-wire MessageSet starting at
    base_offset (offset i64 | size i32 | message)."""
    out = []
    for i, (ts, k, v) in enumerate(msgs):
        m = encode_message(ts, k, v)
        out.append(_i64(base_offset + i) + _i32(len(m)) + m)
    return b"".join(out)


def decode_message_set(data: bytes) -> list[tuple[int, int, bytes, bytes]]:
    """On-wire MessageSet → [(offset, timestamp_ms, key, value)].
    Tolerates a trailing partial message (the protocol allows brokers
    to return one at the end of a fetch)."""
    rd = _Reader(data)
    out = []
    while rd.remaining() >= 12:
        offset = rd.i64()
        size = rd.i32()
        if rd.remaining() < size:
            break  # partial trailing message
        body = rd.b.read(size)
        mr = _Reader(body)
        crc = struct.unpack(">I", mr.b.read(4))[0]
        rest = body[4:]
        if (zlib.crc32(rest) & 0xFFFFFFFF) != crc:
            raise ValueError("kafka message CRC mismatch")
        magic = mr.i8()
        mr.i8()  # attributes (no compression support needed)
        ts = mr.i64() if magic >= 1 else -1
        key = mr.bytes()
        value = mr.bytes()
        out.append((offset, ts, key, value))
    return out


# ------------------------------------------------------------- requests

def _request(api_key: int, api_version: int, correlation_id: int,
             client_id: str, body: bytes) -> bytes:
    hdr = (_i16(api_key) + _i16(api_version) + _i32(correlation_id)
           + _string(client_id))
    payload = hdr + body
    return _i32(len(payload)) + payload


def _read_frame(sock: socket.socket) -> bytes:
    hdr = _recv_exact(sock, 4)
    (n,) = struct.unpack(">i", hdr)
    return _recv_exact(sock, n)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("kafka connection closed")
        buf += chunk
    return buf


class KafkaClient:
    """Minimal Kafka client over one broker connection.

    Thread-compat: each thread/task should own its client (the Spark
    source opens one per read task). `bootstrap` is "host:port"."""

    def __init__(self, bootstrap: str, client_id: str = "druid-spark",
                 timeout: float = 30.0):
        host, port = bootstrap.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)),
                                             timeout=timeout)
        self.client_id = client_id
        self._corr = 0
        self._lock = threading.Lock()

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def _call(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        with self._lock:
            self._corr += 1
            corr = self._corr
            self.sock.sendall(_request(api_key, api_version, corr,
                                       self.client_id, body))
            resp = _read_frame(self.sock)
        rd = _Reader(resp)
        got = rd.i32()
        if got != corr:
            raise ValueError(f"correlation id mismatch {got} != {corr}")
        return rd

    # Metadata v0
    def metadata(self, topics: list[str] | None = None) -> dict[str, Any]:
        body = _array([_string(t) for t in (topics or [])])
        rd = self._call(API_METADATA, 0, body)
        brokers = [(rd.i32(), rd.string(), rd.i32())
                   for _ in range(rd.i32())]
        out_topics = {}
        for _ in range(rd.i32()):
            terr = rd.i16()
            tname = rd.string()
            parts = {}
            for _ in range(rd.i32()):
                rd.i16()  # partition error
                pid = rd.i32()
                leader = rd.i32()
                for _ in range(rd.i32()):
                    rd.i32()  # replicas
                for _ in range(rd.i32()):
                    rd.i32()  # isr
                parts[pid] = leader
            out_topics[tname] = {"error": terr, "partitions": parts}
        return {"brokers": brokers, "topics": out_topics}

    # Produce v2 (acks=-1, message format v1)
    def produce(self, topic: str, partition: int,
                msgs: list[tuple[int, bytes | None, bytes | None]]) -> int:
        """[(timestamp_ms, key, value)] → base offset assigned."""
        mset = encode_message_set(0, msgs)  # broker re-stamps offsets
        body = (_i16(-1) + _i32(10_000)
                + _array([_string(topic)
                          + _array([_i32(partition) + _bytes(mset)])]))
        rd = self._call(API_PRODUCE, 2, body)
        base = -1
        for _ in range(rd.i32()):
            rd.string()
            for _ in range(rd.i32()):
                rd.i32()  # partition
                err = rd.i16()
                base = rd.i64()
                rd.i64()  # log_append_time
                if err != ERR_NONE:
                    raise RuntimeError(f"produce error {err}")
        rd.i32()  # throttle_time
        return base

    # Fetch v2
    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 4 * 1024 * 1024
              ) -> list[tuple[int, int, bytes, bytes]]:
        """→ [(offset, timestamp_ms, key, value)] from `offset`."""
        body = (_i32(-1) + _i32(100) + _i32(1)
                + _array([_string(topic)
                          + _array([_i32(partition) + _i64(offset)
                                    + _i32(max_bytes)])]))
        rd = self._call(API_FETCH, 2, body)
        rd.i32()  # throttle_time
        records: list[tuple[int, int, bytes, bytes]] = []
        for _ in range(rd.i32()):
            rd.string()
            for _ in range(rd.i32()):
                rd.i32()  # partition
                err = rd.i16()
                rd.i64()  # high watermark
                mset = rd.bytes() or b""
                if err == ERR_OFFSET_OUT_OF_RANGE:
                    raise LookupError("offset out of range")
                if err != ERR_NONE:
                    raise RuntimeError(f"fetch error {err}")
                records.extend(decode_message_set(mset))
        return records

    # ListOffsets v1 (timestamp -1 latest, -2 earliest)
    def list_offset(self, topic: str, partition: int,
                    timestamp: int = -1) -> int:
        body = (_i32(-1)
                + _array([_string(topic)
                          + _array([_i32(partition) + _i64(timestamp)])]))
        rd = self._call(API_LIST_OFFSETS, 1, body)
        for _ in range(rd.i32()):
            rd.string()
            for _ in range(rd.i32()):
                rd.i32()  # partition
                err = rd.i16()
                rd.i64()  # timestamp
                off = rd.i64()
                if err != ERR_NONE:
                    raise RuntimeError(f"list_offsets error {err}")
                return off
        raise RuntimeError("empty ListOffsets response")


# --------------------------------------------------------------- broker

class _BrokerHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # one connection, many requests
        while True:
            try:
                frame = _read_frame(self.request)
            except (ConnectionError, OSError, struct.error):
                return
            rd = _Reader(frame)
            api_key = rd.i16()
            api_version = rd.i16()
            corr = rd.i32()
            rd.string()  # client_id
            broker: MiniKafkaBroker = self.server.broker  # type: ignore
            try:
                body = broker.dispatch(api_key, api_version, rd)
            except Exception:
                return
            payload = _i32(corr) + body
            try:
                self.request.sendall(_i32(len(payload)) + payload)
            except OSError:
                return


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class MiniKafkaBroker:
    """In-process single-node broker: in-memory log per
    (topic, partition), auto-creating topics with `num_partitions`.
    Serves Metadata v0 / Produce v2 / Fetch v2 / ListOffsets v1 —
    exactly what KafkaClient speaks."""

    def __init__(self, num_partitions: int = 2, port: int = 0):
        self.num_partitions = num_partitions
        self.logs: dict[tuple[str, int], list] = {}
        self.lock = threading.Lock()
        self.server = _Server(("127.0.0.1", port), _BrokerHandler)
        self.server.broker = self  # type: ignore
        self.port = self.server.server_address[1]
        self.bootstrap = f"127.0.0.1:{self.port}"
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self) -> None:
        self.server.shutdown()
        self.server.server_close()

    def __enter__(self) -> "MiniKafkaBroker":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _ensure_topic(self, topic: str) -> None:
        with self.lock:
            if (topic, 0) not in self.logs:
                for p in range(self.num_partitions):
                    self.logs[(topic, p)] = []

    # ------------------------------------------------------- dispatch

    def dispatch(self, api_key: int, api_version: int, rd: _Reader) -> bytes:
        if api_key == API_METADATA:
            return self._metadata(rd)
        if api_key == API_PRODUCE:
            return self._produce(rd)
        if api_key == API_FETCH:
            return self._fetch(rd)
        if api_key == API_LIST_OFFSETS:
            return self._list_offsets(rd)
        raise NotImplementedError(f"api {api_key}")

    def _metadata(self, rd: _Reader) -> bytes:
        n = rd.i32()
        topics = [rd.string() for _ in range(n)]
        if not topics:
            with self.lock:
                topics = sorted({t for t, _ in self.logs})
        for t in topics:
            self._ensure_topic(t)
        brokers = _array([_i32(0) + _string("127.0.0.1") + _i32(self.port)])
        tmeta = []
        for t in topics:
            parts = [_i16(ERR_NONE) + _i32(p) + _i32(0)
                     + _array([_i32(0)]) + _array([_i32(0)])
                     for p in range(self.num_partitions)]
            tmeta.append(_i16(ERR_NONE) + _string(t) + _array(parts))
        return brokers + _array(tmeta)

    def _produce(self, rd: _Reader) -> bytes:
        rd.i16()  # acks
        rd.i32()  # timeout
        topic_resps = []
        for _ in range(rd.i32()):
            topic = rd.string()
            self._ensure_topic(topic)
            part_resps = []
            for _ in range(rd.i32()):
                pid = rd.i32()
                mset = rd.bytes() or b""
                msgs = decode_message_set(mset)
                with self.lock:
                    log = self.logs.setdefault((topic, pid), [])
                    base = len(log)
                    now = int(time.time() * 1000)
                    for _, ts, k, v in msgs:
                        log.append((ts if ts >= 0 else now, k, v))
                part_resps.append(_i32(pid) + _i16(ERR_NONE) + _i64(base)
                                  + _i64(-1))
            topic_resps.append(_string(topic) + _array(part_resps))
        return _array(topic_resps) + _i32(0)

    def _fetch(self, rd: _Reader) -> bytes:
        rd.i32()  # replica_id
        rd.i32()  # max_wait
        rd.i32()  # min_bytes
        topic_resps = []
        for _ in range(rd.i32()):
            topic = rd.string()
            part_resps = []
            for _ in range(rd.i32()):
                pid = rd.i32()
                off = rd.i64()
                max_bytes = rd.i32()
                with self.lock:
                    log = list(self.logs.get((topic, pid), []))
                hw = len(log)
                err = ERR_NONE
                mset = b""
                if off > hw or off < 0:
                    err = ERR_OFFSET_OUT_OF_RANGE
                else:
                    batch = log[off:]
                    # bound the reply at max_bytes but always include
                    # at least one message so consumers make progress
                    sized: list = []
                    total = 0
                    for ts, k, v in batch:
                        sz = 26 + len(k or b"") + len(v or b"")
                        if sized and total + sz > max_bytes:
                            break
                        sized.append((ts, k, v))
                        total += sz
                    mset = encode_message_set(off, sized)
                part_resps.append(_i32(pid) + _i16(err) + _i64(hw)
                                  + _bytes(mset))
            topic_resps.append(_string(topic) + _array(part_resps))
        return _i32(0) + _array(topic_resps)

    def _list_offsets(self, rd: _Reader) -> bytes:
        rd.i32()  # replica_id
        topic_resps = []
        for _ in range(rd.i32()):
            topic = rd.string()
            self._ensure_topic(topic)
            part_resps = []
            for _ in range(rd.i32()):
                pid = rd.i32()
                ts = rd.i64()
                with self.lock:
                    n = len(self.logs.get((topic, pid), []))
                off = 0 if ts == -2 else n
                part_resps.append(_i32(pid) + _i16(ERR_NONE) + _i64(-1)
                                  + _i64(off))
            topic_resps.append(_string(topic) + _array(part_resps))
        return _array(topic_resps)
