"""Pure-Python AWS Kinesis wire client + in-process test double.

The reference's Kinesis indexing service (extensions-core/
kinesis-indexing-service/.../KinesisRecordSupplier.java,
KinesisSequenceNumber.java, supervisor/KinesisSupervisor.java) consumes
(stream, shardId, sequenceNumber) ranges through the AWS SDK. Kinesis
itself is a plain HTTP/JSON API (public AWS API reference,
`Kinesis_20131202.*` targets over application/x-amz-json-1.1), so —
exactly like the Kafka wire-protocol move — the client here speaks the
public protocol with stdlib only:

- `KinesisClient`: ListShards / GetShardIterator / GetRecords /
  PutRecord(s) / CreateStream, with real SigV4 request signing
  (hmac+hashlib; anonymous mode for test doubles).
- `MiniKinesisServer`: an in-process HTTP server implementing the same
  operations over in-memory shards — MD5(partitionKey) hash-range
  routing, ordinal sequence numbers, TRIM_HORIZON/LATEST/
  AT_SEQUENCE_NUMBER/AFTER_SEQUENCE_NUMBER iterators — so e2e tests
  exercise the real client against the real wire format.

Scale model: one Spark task per shard (kinesis_source.py), the same
per-partition split the reference's supervisor uses for task groups.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_TARGET_PREFIX = "Kinesis_20131202."
_MAX_HASH = (1 << 128) - 1


# --------------------------------------------------------------- client

def _sigv4_headers(method: str, url: str, body: bytes, region: str,
                   access_key: str, secret_key: str,
                   service: str = "kinesis",
                   extra: dict | None = None) -> dict:
    """AWS Signature Version 4 over the request (public spec:
    docs.aws.amazon.com/general/latest/gr/sigv4_signing.html).
    Stdlib-only; returns the headers to attach."""
    from urllib.parse import urlparse
    u = urlparse(url)
    now = _dt.datetime.now(_dt.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    headers = {"host": u.netloc, "x-amz-date": amz_date}
    headers.update({k.lower(): v for k, v in (extra or {}).items()})
    signed = ";".join(sorted(headers))
    canonical = "\n".join([
        method, u.path or "/", u.query,
        "".join(f"{k}:{headers[k]}\n" for k in sorted(headers)),
        signed, hashlib.sha256(body).hexdigest()])
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest()])

    def hm(key, msg):
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = hm(("AWS4" + secret_key).encode(), datestamp)
    k = hm(k, region)
    k = hm(k, service)
    k = hm(k, "aws4_request")
    sig = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
    out = dict(headers)
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return out


class KinesisClient:
    """Minimal Kinesis API client. `endpoint` is a full URL
    (http://host:port for the test double, https://kinesis.<region>.
    amazonaws.com for AWS). Credentials optional — unsigned requests
    for local doubles, SigV4 when provided."""

    def __init__(self, endpoint: str, region: str = "us-east-1",
                 access_key: str | None = None,
                 secret_key: str | None = None):
        self.endpoint = endpoint.rstrip("/")
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key

    def _call(self, op: str, payload: dict) -> dict:
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/x-amz-json-1.1",
                   "X-Amz-Target": _TARGET_PREFIX + op}
        if self.access_key and self.secret_key:
            headers.update(_sigv4_headers(
                "POST", self.endpoint + "/", body, self.region,
                self.access_key, self.secret_key,
                extra={"x-amz-target": headers["X-Amz-Target"],
                       "content-type": headers["Content-Type"]}))
        req = urllib.request.Request(self.endpoint + "/", data=body,
                                     headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read() or b"{}")

    def create_stream(self, stream: str, shards: int = 1) -> None:
        self._call("CreateStream",
                   {"StreamName": stream, "ShardCount": shards})

    def list_shards(self, stream: str) -> list[dict]:
        return self._call("ListShards",
                          {"StreamName": stream})["Shards"]

    def get_shard_iterator(self, stream: str, shard_id: str,
                           iterator_type: str = "TRIM_HORIZON",
                           sequence_number: str | None = None,
                           timestamp: float | None = None) -> str:
        p = {"StreamName": stream, "ShardId": shard_id,
             "ShardIteratorType": iterator_type}
        if sequence_number is not None:
            p["StartingSequenceNumber"] = sequence_number
        if timestamp is not None:
            p["Timestamp"] = timestamp  # epoch seconds (AT_TIMESTAMP)
        return self._call("GetShardIterator", p)["ShardIterator"]

    def get_records(self, iterator: str, limit: int = 10000) -> dict:
        out = self._call("GetRecords",
                         {"ShardIterator": iterator, "Limit": limit})
        for r in out.get("Records", []):
            r["Data"] = base64.b64decode(r["Data"])
        return out

    def update_shard_count(self, stream: str, target: int) -> dict:
        return self._call("UpdateShardCount",
                          {"StreamName": stream,
                           "TargetShardCount": target,
                           "ScalingType": "UNIFORM_SCALING"})

    def put_record(self, stream: str, data: bytes,
                   partition_key: str) -> dict:
        return self._call("PutRecord", {
            "StreamName": stream,
            "Data": base64.b64encode(data).decode(),
            "PartitionKey": partition_key})

    def put_records(self, stream: str,
                    records: list[tuple[bytes, str]]) -> dict:
        return self._call("PutRecords", {
            "StreamName": stream,
            "Records": [{"Data": base64.b64encode(d).decode(),
                         "PartitionKey": pk} for d, pk in records]})

    def close(self) -> None:
        pass  # stateless HTTP


# ---------------------------------------------------------- test double

def _shard_for_key(partition_key: str, n_shards: int) -> int:
    """MD5(partitionKey) → 128-bit hash → shard whose HashKeyRange
    covers it (Kinesis partition-key routing, public API semantics)."""
    h = int.from_bytes(hashlib.md5(partition_key.encode()).digest(),
                       "big")
    width = (_MAX_HASH + 1) // n_shards
    return min(h // width, n_shards - 1)


def _encode_iter(stream: str, shard: str, idx: int) -> str:
    return base64.b64encode(
        json.dumps({"s": stream, "h": shard, "i": idx}).encode()).decode()


def _decode_iter(token: str) -> dict:
    return json.loads(base64.b64decode(token))


class MiniKinesisServer:
    """In-process Kinesis double speaking the public HTTP/JSON API.
    Sequence numbers are per-shard ordinals rendered as strings (real
    Kinesis numbers are opaque increasing decimals — consumers must
    only compare/pass them through, which is all this engine does)."""

    def __init__(self, port: int = 0, empty_page_every: int = 0,
                 disorder_every: int = 0, disorder_ms: float = 0):
        """`empty_page_every=N` makes every Nth GetRecords return an
        EMPTY page with a valid NextShardIterator and
        MillisBehindLatest > 0 even though more records exist — real
        Kinesis does this mid-shard routinely (documented GetRecords
        behavior); readers must keep paging, not treat empty as EOF.

        `disorder_every=N` (with `disorder_ms`) backdates every Nth
        PutRecord's ApproximateArrivalTimestamp by `disorder_ms`,
        producing NON-monotone per-shard timestamps. AWS documents the
        timestamp as approximate only; readers that stop at the first
        over-bound timestamp lose the backdated records that follow
        it in sequence order."""
        self._streams: dict[str, list[list[dict]]] = {}
        self._last_ts: dict[tuple[str, int], float] = {}
        self._lock = threading.Lock()
        self._empty_every = empty_page_every
        self._disorder_every = disorder_every
        self._disorder_s = disorder_ms / 1000.0
        self._put_count = 0
        self.get_records_calls = 0
        self.get_records_record_bytes = 0
        double = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                target = self.headers.get("X-Amz-Target", "")
                op = target.split(".", 1)[-1]
                try:
                    out = double._dispatch(op, payload)
                    code = 200
                except KeyError as e:
                    out = {"__type": "ResourceNotFoundException",
                           "message": str(e)}
                    code = 400
                except Exception as e:  # noqa: BLE001 — wire errors
                    out = {"__type": "InvalidArgumentException",
                           "message": str(e)}
                    code = 400
                body = json.dumps(out).encode()
                self.send_response(code)
                self.send_header("Content-Type",
                                 "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._srv.server_port
        self.endpoint = f"http://127.0.0.1:{self.port}"
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)

    # -- lifecycle -------------------------------------------------
    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._srv.shutdown()
        self._srv.server_close()

    # -- operations ------------------------------------------------
    def _dispatch(self, op: str, p: dict) -> dict:
        with self._lock:
            if op == "CreateStream":
                self._streams.setdefault(
                    p["StreamName"],
                    [[] for _ in range(int(p.get("ShardCount", 1)))])
                return {}
            if op == "ListShards":
                shards = self._streams[p["StreamName"]]
                width = (_MAX_HASH + 1) // len(shards)
                return {"Shards": [{
                    "ShardId": f"shardId-{i:012d}",
                    "HashKeyRange": {
                        "StartingHashKey": str(i * width),
                        "EndingHashKey": str(
                            (i + 1) * width - 1 if i < len(shards) - 1
                            else _MAX_HASH)},
                    "SequenceNumberRange": {
                        "StartingSequenceNumber": "0"},
                } for i in range(len(shards))]}
            if op == "UpdateShardCount":
                # public resharding API (UNIFORM_SCALING): this double
                # models it as widening the uniform hash partition —
                # existing records stay in their shards, future puts
                # hash over the new count, ListShards reflects the new
                # ranges immediately (real Kinesis closes parents and
                # opens children; for a time-bound reader only the
                # fresh shard LIST and post-reshard timestamps matter)
                shards = self._streams[p["StreamName"]]
                target = int(p["TargetShardCount"])
                while len(shards) < target:
                    shards.append([])
                return {"StreamName": p["StreamName"],
                        "CurrentShardCount": len(shards),
                        "TargetShardCount": target}
            if op == "PutRecord":
                return self._put(p["StreamName"], p["PartitionKey"],
                                 p["Data"])
            if op == "PutRecords":
                return {"Records": [
                    self._put(p["StreamName"], r["PartitionKey"],
                              r["Data"]) for r in p["Records"]],
                    "FailedRecordCount": 0}
            if op == "GetShardIterator":
                stream = p["StreamName"]
                shard = p["ShardId"]
                idx = int(shard.rsplit("-", 1)[-1])
                log = self._streams[stream][idx]
                t = p["ShardIteratorType"]
                if t == "TRIM_HORIZON":
                    pos = 0
                elif t == "LATEST":
                    pos = len(log)
                elif t == "AT_SEQUENCE_NUMBER":
                    pos = int(p["StartingSequenceNumber"])
                elif t == "AFTER_SEQUENCE_NUMBER":
                    pos = int(p["StartingSequenceNumber"]) + 1
                elif t == "AT_TIMESTAMP":
                    # first record with arrival ts >= Timestamp
                    want = float(p["Timestamp"])
                    pos = len(log)
                    for i, r in enumerate(log):
                        if r["ApproximateArrivalTimestamp"] >= want:
                            pos = i
                            break
                else:
                    raise ValueError(f"iterator type {t}")
                return {"ShardIterator":
                        _encode_iter(stream, shard, pos)}
            if op == "GetRecords":
                self.get_records_calls += 1
                it = _decode_iter(p["ShardIterator"])
                idx = int(it["h"].rsplit("-", 1)[-1])
                log = self._streams[it["s"]][idx]
                if (self._empty_every and it["i"] < len(log)
                        and self.get_records_calls
                        % self._empty_every == 0):
                    # mid-shard empty page: more data exists, but this
                    # page carries none (real-Kinesis behavior)
                    return {"Records": [],
                            "NextShardIterator": _encode_iter(
                                it["s"], it["h"], it["i"]),
                            "MillisBehindLatest": 1}
                lim = int(p.get("Limit", 10000))
                recs = log[it["i"]:it["i"] + lim]
                self.get_records_record_bytes += sum(
                    len(r["Data"]) for r in recs)
                nxt = it["i"] + len(recs)
                return {
                    "Records": recs,
                    "NextShardIterator":
                        _encode_iter(it["s"], it["h"], nxt),
                    "MillisBehindLatest":
                        0 if nxt >= len(log) else 1}
            raise ValueError(f"operation {op}")

    def _put(self, stream: str, pk: str, data_b64: str) -> dict:
        shards = self._streams[stream]
        i = _shard_for_key(pk, len(shards))
        seq = str(len(shards[i]))
        # per-shard non-decreasing arrival timestamps (the real
        # service assigns them at ingestion, in sequence order)
        now = _dt.datetime.now(_dt.timezone.utc).timestamp()
        self._put_count += 1
        if self._disorder_every and \
                self._put_count % self._disorder_every == 0:
            # injected disorder: backdated, NOT clamped monotone
            ts = now - self._disorder_s
        else:
            last = self._last_ts.get((stream, i), 0.0)
            ts = now if now > last else last + 1e-6  # increasing
            self._last_ts[(stream, i)] = ts
        shards[i].append({
            "SequenceNumber": seq,
            "ApproximateArrivalTimestamp": ts,
            "Data": data_b64,
            "PartitionKey": pk})
        return {"ShardId": f"shardId-{i:012d}", "SequenceNumber": seq}
