"""AVI (RIFF) container: probe, frame iteration, real frame decode.

The reference's multimodal ambition treats video as opaque binary with
typed metadata; this engine additionally decodes REAL frame pixels for
the two classic AVI codecs that need no external media library:

- uncompressed DIB ('00db' chunks, BITMAPINFOHEADER biCompression=0):
  bottom-up BGR rows padded to 4 bytes — a pure byte-layout transform.
- Motion-JPEG ('00dc' chunks, handler MJPG): each frame is a baseline
  JPEG, decoded by druid_spark/datapipe/jpeg.py (pure numpy).

AVI/RIFF is a public format (Microsoft "AVI RIFF File Reference";
fourcc chunk framing identical to WAV). Everything here is
little-endian; chunks pad to even offsets.

H.264/AV1/VP9 inside MP4 stay honestly stubbed (multimodal.py) — those
genuinely need a codec library.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _chunks(b: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, payload_start, payload_size) within [start, end)."""
    off = start
    while off + 8 <= end:
        four = b[off:off + 4]
        size = _u32(b, off + 4)
        yield four, off + 8, size
        off += 8 + size + (size & 1)  # even alignment


def probe_avi(b: bytes) -> dict:
    """Container metadata from the real header structures: duration,
    dimensions, codec, frame count. Raises ValueError on non-AVI."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') file")
    out = {"duration_ms": 0, "width": 0, "height": 0, "n_frames": 0,
           "codec": None, "fps": 0.0, "n_streams": 0}

    def walk(start: int, end: int) -> None:
        for four, poff, size in _chunks(b, start, end):
            if four == b"LIST":
                walk(poff + 4, poff + size)  # skip list type fourcc
            elif four == b"avih" and size >= 40:
                us_per_frame = _u32(b, poff)
                total = _u32(b, poff + 16)
                out["n_streams"] = _u32(b, poff + 24)
                out["width"] = _u32(b, poff + 32)
                out["height"] = _u32(b, poff + 36)
                out["n_frames"] = total
                if us_per_frame:
                    out["fps"] = 1e6 / us_per_frame
                    out["duration_ms"] = total * us_per_frame // 1000
            elif four == b"strh" and size >= 8:
                if b[poff:poff + 4] == b"vids" and out["codec"] is None:
                    out["codec"] = (b[poff + 4:poff + 8].decode(
                        "ascii", "replace").strip("\x00 ") or "DIB")
    walk(12, len(b))
    return out


def iter_frames(b: bytes) -> Iterator[tuple[str, bytes]]:
    """Yield ('dc'|'db', frame_bytes) for every video chunk in the
    'movi' list, in stream order ('##dc' compressed, '##db' DIB)."""
    if len(b) < 12 or b[:4] != b"RIFF":
        raise ValueError("not a RIFF file")

    def walk(start: int, end: int) -> Iterator[tuple[str, bytes]]:
        for four, poff, size in _chunks(b, start, end):
            if four == b"LIST":
                ltype = b[poff:poff + 4]
                if ltype in (b"movi", b"rec "):
                    yield from walk(poff + 4, poff + size)
                elif ltype == b"hdrl":
                    continue
                else:
                    yield from walk(poff + 4, poff + size)
            elif four[2:4] in (b"dc", b"db"):
                yield four[2:4].decode(), b[poff:poff + size]
    yield from walk(12, len(b))


def _decode_dib_frame(data: bytes, width: int, height: int) -> np.ndarray:
    """Uncompressed 24-bit DIB: bottom-up BGR rows, 4-byte row pad →
    (h, w, 3) uint8 RGB."""
    stride = (width * 3 + 3) & ~3
    if len(data) < stride * height:
        raise ValueError("DIB frame shorter than width*height")
    rows = np.frombuffer(data[:stride * height], dtype=np.uint8)
    rows = rows.reshape(height, stride)[:, :width * 3]
    bgr = rows.reshape(height, width, 3)[::-1]  # bottom-up → top-down
    return bgr[..., ::-1].copy()  # BGR → RGB


def decode_frames(b: bytes, limit: int | None = None
                  ) -> Iterator[np.ndarray]:
    """Real pixel decode of every video frame → (h, w, 3) uint8 RGB.
    DIB frames decode by layout; 'dc' frames must be MJPEG (JPEG SOI)
    and go through the pure-numpy baseline/progressive JPEG decoder."""
    meta = probe_avi(b)
    n = 0
    for kind, data in iter_frames(b):
        if limit is not None and n >= limit:
            return
        if kind == "db":
            yield _decode_dib_frame(data, meta["width"], meta["height"])
        else:
            if data[:2] != b"\xff\xd8":
                raise NotImplementedError(
                    f"AVI codec {meta['codec']!r} is not MJPEG/DIB — "
                    "needs an external codec library")
            from druid_spark.datapipe.jpeg import decode_jpeg
            arr = decode_jpeg(data)
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, axis=2)
            yield arr
        n += 1


def encode_avi(frames: list[np.ndarray] | list[bytes], fps: int = 10,
               codec: str = "DIB") -> bytes:
    """Minimal single-video-stream AVI muxer.

    codec='DIB': frames are (h, w, 3) uint8 RGB arrays, written as
    uncompressed bottom-up BGR '00db' chunks (a real decodable video).
    codec='MJPG': frames are ready JPEG byte strings written as '00dc'
    chunks (the muxer never re-encodes — pair with an independent
    test-side JPEG encoder)."""
    if not frames:
        raise ValueError("need at least one frame")
    if codec == "DIB":
        h, w = frames[0].shape[:2]
        payloads = []
        stride = (w * 3 + 3) & ~3
        for fr in frames:
            bgr = fr[..., ::-1][::-1]  # RGB top-down → BGR bottom-up
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w * 3] = bgr.reshape(h, w * 3)
            payloads.append(rows.tobytes())
        fourcc, handler, compression, bitcount = b"00db", b"DIB ", 0, 24
        frame_size = stride * h
    elif codec == "MJPG":
        from druid_spark.datapipe.jpeg import decode_jpeg
        first = decode_jpeg(frames[0])
        h, w = first.shape[:2]
        payloads = [bytes(fr) for fr in frames]
        fourcc, handler, compression, bitcount = b"00dc", b"MJPG", 0x47504A4D, 24
        frame_size = max(len(p) for p in payloads)
    else:
        raise NotImplementedError(codec)

    def chunk(four: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return four + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    n = len(payloads)
    avih = struct.pack(
        "<10I", 1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h) + b"\x00" * 16
    # dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale, dwRate,
    # dwStart, dwLength, dwSuggestedBufferSize, dwQuality, dwSampleSize
    strh = (b"vids" + handler
            + struct.pack("<I2H8I", 0, 0, 0, 0, 1, fps, 0, n,
                          frame_size, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))  # rcFrame
    strf = struct.pack("<I2i2H6I", 40, w, h, 1, bitcount, compression,
                       frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(fourcc, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
