"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-preserving mapInPandas,
Arrow batch shapes) is real and tested. The decode step is REAL for
formats decodable without external libraries — PPM (P6) images with
numpy, PNG (stdlib zlib inflate + per-scanline unfilter, Adam7),
JPEG (pure-numpy huffman + IDCT, baseline and progressive, jpeg.py),
PCM WAV audio with the stdlib ``wave`` module, and AVI video with
uncompressed-DIB or MJPEG frames (avi.py — real frame pixels) — and
STUBBED only for codecs that genuinely need a media stack (H.264/AV1
inside MP4: av/ffmpeg are not in this container): `decode_stub=True`
derives a deterministic fake feature from the bytes;
`decode_stub=False` really decodes supported mimes and raises
NotImplementedError for unsupported ones.

Pattern for 100 TB: binary payloads ride in their own column so Parquet
column pruning skips them unless the operator touches them; feature
extraction runs as Arrow-batched mapInPandas with
`spark.sql.files.maxPartitionBytes` tuned down so one task's batch of
decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator
from typing import Any

import numpy as np
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


# ------------------------------------------------------- real decoders
# Library-free formats: PPM P6 (numpy), PNG (zlib + unfilter), baseline
# JPEG (datapipe/jpeg.py), PCM WAV (stdlib wave). Video stays stubbed.

def _decode_ppm(b: bytes) -> np.ndarray:
    """P6 binary PPM → (h, w, 3) uint8 array."""
    if not b or not b.startswith(b"P6"):
        raise NotImplementedError("only P6 PPM images decode without PIL")
    toks, i = [], 2
    while len(toks) < 3:  # width, height, maxval (comments skipped)
        while i < len(b) and b[i:i + 1].isspace():
            i += 1
        if b[i:i + 1] == b"#":
            while i < len(b) and b[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j:j + 1].isspace():
            j += 1
        toks.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, _maxval = toks
    return np.frombuffer(b, dtype=np.uint8,
                         count=w * h * 3, offset=i).reshape(h, w, 3)


def _encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# Adam7 pass grid: (x_start, x_step, y_start, y_step), PNG spec §8.2
_ADAM7 = [(0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
          (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Unfilter h scanlines of w pixels × c channels from the head of
    `raw` per the five standard filter types (PNG spec §6:
    None/Sub/Up/Average/Paeth). Returns an (h, w*c) uint8 array;
    consumes exactly h*(w*c+1) bytes."""
    stride = w * c
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).copy()
        if ft == 0:                       # None
            cur = line
        elif ft == 2:                     # Up
            cur = line + prev             # uint8 wraps = mod 256
        elif ft in (1, 3, 4):             # Sub / Average / Paeth:
            cur = line                    # sequential left-dependency
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                bb = int(prev[x])
                if ft == 1:
                    add = a
                elif ft == 3:
                    add = (a + bb) >> 1
                else:
                    cc = int(prev[x - c]) if x >= c else 0
                    p = a + bb - cc
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                    add = a if pa <= pb and pa <= pc else \
                        bb if pb <= pc else cc
                cur[x] = (int(cur[x]) + add) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out


def _decode_png(b: bytes) -> np.ndarray:
    """PNG → (h, w, channels) uint8 array, library-free (round 7,
    the same pure-Python-public-format move as ingest/protobuf.py):
    stdlib zlib inflates the concatenated IDAT stream, then each
    scanline is unfiltered per the five standard filter types.
    Supports bit depth 8, color types 0 (gray), 2 (RGB), 4
    (gray+alpha), 6 (RGBA), both non-interlaced and Adam7-interlaced
    (each of the 7 passes is its own filtered sub-image, scattered
    onto the pass grid — PNG spec §8.2)."""
    import zlib
    if not b or not b.startswith(_PNG_SIG):
        raise NotImplementedError("not a PNG signature")
    i, w = len(_PNG_SIG), 0
    h = depth = ctype = interlace = None
    idat = bytearray()
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i:i + 4], "big")
        typ = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + ln]
        i += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, interlace = data[8], data[9], data[12]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if depth != 8 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {ctype} "
            "(8-bit gray/RGB/gray-alpha/RGBA decode for real)")
    c = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    if not interlace:
        if len(raw) != h * (w * c + 1):
            raise ValueError("PNG IDAT length mismatch")
        return _png_unfilter(raw, h, w, c).reshape(h, w, c)
    # Adam7: seven sequential sub-images, each filtered independently
    out = np.zeros((h, w, c), dtype=np.uint8)
    pos = 0
    for xs, xstep, ys, ystep in _ADAM7:
        pw = -(-(w - xs) // xstep) if w > xs else 0
        ph = -(-(h - ys) // ystep) if h > ys else 0
        if pw <= 0 or ph <= 0:
            continue
        sub = _png_unfilter(raw[pos:], ph, pw, c).reshape(ph, pw, c)
        pos += ph * (pw * c + 1)
        out[ys::ystep, xs::xstep] = sub
    if pos != len(raw):
        raise ValueError("PNG IDAT length mismatch")
    return out


def _decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(b)) as wf:
        rate = wf.getframerate()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    return x, rate


def _encode_png(arr: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 → PNG bytes (filter 0, one IDAT). The inverse
    of _decode_png for generating decodable fixtures."""
    import struct
    import zlib
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes()
                   for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _to_rgb(arr: np.ndarray) -> np.ndarray:
    """Normalize a decoded (h, w, c) array to 3-channel RGB: gray
    replicates, alpha drops."""
    c = arr.shape[2]
    if c == 3:
        return arr
    if c == 4:
        return arr[..., :3]
    return np.repeat(arr[..., :1], 3, axis=2)  # gray / gray+alpha


def _decode_image(b: bytes, mime: str) -> np.ndarray:
    """Any supported image mime → (h, w, 3) uint8 RGB."""
    if mime == "image/png":
        return _to_rgb(_decode_png(b))
    if mime in ("image/jpeg", "image/jpg"):
        from druid_spark.datapipe.jpeg import decode_jpeg
        return _to_rgb(decode_jpeg(b))
    if mime == "image/gif":
        from druid_spark.datapipe.gif import decode_gif
        return decode_gif(b)
    return _decode_ppm(b)


def _pad(vals: list[float], dim: int) -> list[float]:
    vals = list(vals)[:dim]
    return vals + [0.0] * (dim - len(vals))


def _image_feature(arr: np.ndarray, dim: int) -> list[float]:
    r, g, b = (arr[..., c].mean() / 255.0 for c in range(3))
    luma = 0.2126 * r + 0.7152 * g + 0.0722 * b
    h, w = arr.shape[:2]
    return _pad([r, g, b, luma, float(w), float(h),
                 arr.std() / 255.0], dim)


def _audio_feature(x: np.ndarray, rate: int, dim: int) -> list[float]:
    rms = float(np.sqrt((x ** 2).mean())) if x.size else 0.0
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if x.size > 1 else 0.0
    return _pad([rms, zcr, x.size / rate, float(rate),
                 float(np.abs(x).max()) if x.size else 0.0], dim)


def _real_feature(payload: bytes, mime: str, dim: int) -> list[float]:
    if mime in ("image/x-portable-pixmap", "image/ppm", "image/png",
                "image/jpeg", "image/jpg", "image/gif"):
        return _image_feature(_decode_image(payload, mime), dim)
    if mime in ("audio/wav", "audio/x-wav"):
        return _audio_feature(*_decode_wav(payload), dim)
    if mime in ("video/x-msvideo", "video/avi"):
        # REAL video feature (round 7): first-frame pixels (DIB or
        # MJPEG via the pure-numpy JPEG decoder) + container stats
        from druid_spark.datapipe.avi import decode_frames, probe_avi
        meta = probe_avi(payload)
        first = next(decode_frames(payload, limit=1))
        r, g, b = (first[..., c].mean() / 255.0 for c in range(3))
        return _pad([r, g, b, meta["duration_ms"] / 1000.0,
                     float(meta["n_frames"]), meta["fps"],
                     float(meta["width"] * meta["height"])], dim)
    raise NotImplementedError(
        f"decode for {mime!r} needs a codec library (not in container); "
        "PPM, PNG, JPEG, AVI (DIB/MJPEG) and WAV decode for real")


def extract_features(df: DataFrame, dim: int = 8,
                     decode_stub: bool = True) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    decode_stub=True: deterministic sha-derived fake (any mime).
    decode_stub=False: REAL decode — PPM images (channel means, luma,
    dims, contrast) and PCM WAV audio (RMS, zero-crossing rate,
    duration, rate, peak) need no external libs; compressed mimes
    raise NotImplementedError (clearly-marked stub per the contract).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_stub:
                feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            else:
                feats = [_real_feature(p, m, dim)
                         for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
            })

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  decode_stub: bool = True) -> DataFrame:
    """Image resize. Stub mode updates metadata only (identity bytes);
    decode_stub=False really decodes PPM payloads, mean-pools to the
    target grid, and re-encodes — pure numpy, Arrow-batched."""
    imgs = df.where(F.col("kind") == "image")
    if decode_stub:
        return (imgs.withColumn("width", F.lit(width))
                .withColumn("height", F.lit(height)))

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for p, m in zip(pdf["payload"], pdf["mime"]):
                arr = _decode_image(p, m)
                h, w = arr.shape[:2]
                # mean-pool into the target grid (area interpolation)
                ys = np.linspace(0, h, height + 1).astype(int)
                xs = np.linspace(0, w, width + 1).astype(int)
                pooled = np.empty((height, width, 3), dtype=np.uint8)
                for yi in range(height):
                    for xi in range(width):
                        cell = arr[ys[yi]:max(ys[yi + 1], ys[yi] + 1),
                                   xs[xi]:max(xs[xi + 1], xs[xi] + 1)]
                        pooled[yi, xi] = cell.reshape(-1, 3).mean(axis=0)
                payloads.append(_encode_ppm(pooled))
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "payload": payloads,
                "width": width, "height": height,
            })

    return imgs.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: emits one row per sampled timestamp.

    decode_stub=True trusts the duration_ms metadata column.
    decode_stub=False (round 7) reads the REAL duration out of the
    container structure — probe_mp4 for ISO BMFF, probe_avi for RIFF
    AVI (both parse without any media library) — so the sampling grid
    comes from the actual file. Frame PIXELS are real for AVI DIB/MJPEG
    (frame_features); MP4 pixel decode still needs an H.264/AV1 codec
    and stays stubbed."""
    vids = df.where(F.col("kind") == "video")
    if not decode_stub:
        probe_schema = T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("real_duration_ms", T.LongType()),
            T.StructField("n_tracks", T.IntegerType()),
        ])

        def _probe_any(p: bytes, mime: str) -> dict:
            if mime in ("video/x-msvideo", "video/avi"):
                from druid_spark.datapipe.avi import probe_avi
                m = probe_avi(p)
                return {"duration_ms": m["duration_ms"],
                        "n_tracks": m["n_streams"]}
            return probe_mp4(p)

        def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                metas = [_probe_any(p, m)
                         for p, m in zip(pdf["payload"], pdf["mime"])]
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "real_duration_ms": [m["duration_ms"] or 0
                                         for m in metas],
                    "n_tracks": [m["n_tracks"] for m in metas],
                })

        vids = (vids.mapInPandas(probe, schema=probe_schema)
                .withColumnRenamed("real_duration_ms", "duration_ms"))
    return (vids.withColumn(
                "frame_ts",
                F.explode(F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"))))
            .select("media_id", "frame_ts", "mime"))


FRAME_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_ts", T.LongType(), False),
    T.StructField("r_mean", T.DoubleType(), True),
    T.StructField("g_mean", T.DoubleType(), True),
    T.StructField("b_mean", T.DoubleType(), True),
])


def frame_features(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL video-frame features: container → frame grid → pixel
    decode → per-frame channel means, all inside Arrow-batched
    mapInPandas tasks. Works for AVI DIB/MJPEG payloads (avi.py —
    MJPEG frames go through the pure-numpy JPEG decoder); other video
    mimes raise NotImplementedError (codec library needed).

    At scale each task decodes only its partition's payloads and emits
    a few floats per frame — no pixel arrays cross the shuffle."""
    vids = df.where(F.col("kind") == "video")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from druid_spark.datapipe.avi import decode_frames, probe_avi
        for pdf in it:
            ids, tss, rs, gs, bs = [], [], [], [], []
            for mid, p, mime in zip(pdf["media_id"], pdf["payload"],
                                    pdf["mime"]):
                if mime not in ("video/x-msvideo", "video/avi"):
                    raise NotImplementedError(
                        f"frame pixels for {mime!r} need a codec library")
                meta = probe_avi(p)
                fps = meta["fps"] or 1.0
                # sample the frame nearest each every_ms tick
                want = {min(int(ts * fps / 1000.0), meta["n_frames"] - 1)
                        for ts in range(0, max(meta["duration_ms"], 1),
                                        every_ms)}
                for idx, frame in enumerate(decode_frames(p)):
                    if idx not in want:
                        continue
                    ids.append(mid)
                    tss.append(int(idx * 1000.0 / fps))
                    rs.append(float(frame[..., 0].mean()))
                    gs.append(float(frame[..., 1].mean()))
                    bs.append(float(frame[..., 2].mean()))
            yield pd.DataFrame({"media_id": ids, "frame_ts": tss,
                                "r_mean": rs, "g_mean": gs, "b_mean": bs})

    return vids.mapInPandas(batches, schema=FRAME_FEATURE_SCHEMA)


def demo_media_df(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table: REAL P6 PPM images and
    PCM WAV clips (decodable without any media library), plus opaque
    fake-video bytes for the stubbed path."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            rng = np.random.default_rng(i)
            arr = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
            if i % 2:  # alternate real formats: PPM and PNG (round 7)
                payload, mime = _encode_png(arr), "image/png"
            else:
                payload, mime = _encode_ppm(arr), "image/x-portable-pixmap"
            w, h, dur = 64, 48, None
        elif kind == "audio":
            rate = 8000
            t = np.arange(rate // 2) / rate  # 0.5 s mono sine
            x = 0.5 * np.sin(2 * np.pi * (220 + 10 * i) * t)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(rate)
                wf.writeframes((x * 32767).astype("<i2").tobytes())
            payload, mime = buf.getvalue(), "audio/wav"
            w, h, dur = None, None, 500
        elif i % 2:
            # REAL AVI with uncompressed DIB frames — fully decodable
            # pixels (avi.py), deterministic per media_id
            from druid_spark.datapipe.avi import encode_avi
            rng = np.random.default_rng(1000 + i)
            vid = [rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
                   for _ in range(10)]
            payload = encode_avi(vid, fps=5, codec="DIB")
            mime, w, h, dur = "video/x-msvideo", 32, 24, 2000
        else:
            # REAL ISO-BMFF container structure (probe-able duration
            # and track dims); the mdat payload is the fake part
            payload = _encode_minimal_mp4(
                5000, 640, 360,
                mdat=hashlib.sha256(str(i).encode()).digest() * 4)
            mime, w, h, dur = "video/mp4", 640, 360, 5000
        rows.append((i, kind, bytearray(payload), mime, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------ video metadata (MP4)
# ISO BMFF (MPEG-4 Part 12) is a public length-prefixed box format —
# the container STRUCTURE parses without any media library, so video
# duration/dimensions are REAL metadata here; only frame decode stays
# stubbed (that needs an H.264/AV1 codec).

def _mp4_boxes(b: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for one box level."""
    i, end = start, len(b) if end is None else end
    while i + 8 <= end:
        size = int.from_bytes(b[i:i + 4], "big")
        typ = b[i + 4:i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(b[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:  # to end of file
            size = end - i
        if size < hdr:
            return
        yield typ, i + hdr, min(i + size, end)
        i += size


def probe_mp4(b: bytes) -> dict:
    """MP4/ISO-BMFF structural probe: {duration_ms, width, height,
    n_tracks, brand}. Raises NotImplementedError when the payload is
    not BMFF (no ftyp/moov)."""
    brand = None
    duration_ms = None
    width = height = None
    n_tracks = 0
    found = False
    for typ, s, e in _mp4_boxes(b):
        if typ == b"ftyp":
            brand = b[s:s + 4].decode("ascii", "replace")
            found = True
        elif typ == b"moov":
            found = True
            for t2, s2, e2 in _mp4_boxes(b, s, e):
                if t2 == b"mvhd":
                    ver = b[s2]
                    if ver == 1:
                        scale = int.from_bytes(b[s2 + 20:s2 + 24], "big")
                        dur = int.from_bytes(b[s2 + 24:s2 + 32], "big")
                    else:
                        scale = int.from_bytes(b[s2 + 12:s2 + 16], "big")
                        dur = int.from_bytes(b[s2 + 16:s2 + 20], "big")
                    if scale:
                        duration_ms = dur * 1000 // scale
                elif t2 == b"trak":
                    n_tracks += 1
                    for t3, s3, e3 in _mp4_boxes(b, s2, e2):
                        if t3 == b"tkhd":
                            ver = b[s3]
                            off = s3 + (96 if ver == 1 else 84)
                            # 16.16 fixed point width/height
                            tw = int.from_bytes(b[off - 8:off - 4],
                                                "big") >> 16
                            th = int.from_bytes(b[off - 4:off],
                                                "big") >> 16
                            if tw and th:
                                width, height = tw, th
    if not found:
        raise NotImplementedError("not an ISO-BMFF (MP4) payload")
    return {"duration_ms": duration_ms, "width": width,
            "height": height, "n_tracks": n_tracks, "brand": brand}


def _encode_minimal_mp4(duration_ms: int, width: int, height: int,
                        mdat: bytes = b"") -> bytes:
    """Minimal valid ISO-BMFF skeleton (ftyp + moov[mvhd + trak[tkhd]]
    + mdat) — a REAL container for probe_mp4; the media payload itself
    is opaque."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    scale = 1000
    mvhd = box(b"mvhd", bytes(4)  # version 0 + flags
               + struct.pack(">IIII", 0, 0, scale,
                             duration_ms * scale // 1000)
               + struct.pack(">I", 0x00010000)  # rate 1.0
               + struct.pack(">H", 0x0100) + bytes(10)  # volume+rsvd
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                             0, 0, 0x40000000)  # identity matrix
               + bytes(24) + struct.pack(">I", 2))  # predefined+next id
    tkhd = box(b"tkhd", bytes(4)
               + struct.pack(">IIIII", 0, 0, 1, 0,
                             duration_ms * scale // 1000)
               + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0)
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                             0, 0, 0x40000000)
               + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov + box(b"mdat", mdat)
