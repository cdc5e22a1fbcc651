"""GIF decode, pure Python + numpy (public format: GIF87a/GIF89a,
W3C/CompuServe specification).

Covers the full still+animated surface without external libraries:
logical screen descriptor, global/local color tables, LZW decompression
(variable-width codes, CLEAR/EOI, little-endian bitstream in
sub-blocks), 4-pass interlacing, graphic-control extensions
(transparency index, frame delay, disposal), and frame composition for
animations (disposal 0/1 leave, 2 restore-background, 3 restore-prev).

Feeds the multimodal decode path (multimodal.py): image/gif decodes
for real; animated GIFs expose frames for sampling just like AVI.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: codes grow 1 bit when the dict fills, capped at
    12 bits; CLEAR resets; EOI ends. Returns pixel indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []

    # bit reader over the concatenated data, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream: treat as end
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    def reset() -> tuple[dict[int, list[int]], int]:
        return ({i: [i] for i in range(clear)}, min_code_size + 1)

    table, width = reset()
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == eoi:
            return out
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif prev is not None and code == len(table) + 2:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table[len(table) + 2] = prev + [entry[0]]
        # +2 skips the clear/eoi slots; widen at 2^width - 1 (less one
        # because the encoder widens before emitting the next code)
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
        prev = entry


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE:
        for y in range(start, h, step):
            out[y] = idx[src]
            src += 1
    return out


def _subblocks(b: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at off; return (data, next)."""
    parts = []
    while True:
        n = b[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        parts.append(b[off:off + n])
        off += n


def iter_gif_frames(b: bytes) -> Iterator[tuple[np.ndarray, int]]:
    """Yield (rgb_frame (h,w,3) uint8, delay_ms) composited onto the
    logical screen, honoring transparency and disposal."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    flags = b[10]
    bg_index = b[11]
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b[off:off + 3 * n], dtype=np.uint8
                            ).reshape(n, 3)
        off += 3 * n

    if gct is not None and bg_index < len(gct):
        bg = gct[bg_index]
    else:
        bg = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg
    transparent: int | None = None
    delay_ms = 0
    disposal = 0

    while off < len(b):
        block = b[off]
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + data sub-blocks
            label = b[off + 1]
            data, off = _subblocks(b, off + 2)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags = data[0]
                delay_ms = int.from_bytes(data[1:3], "little") * 10
                transparent = data[3] if gflags & 1 else None
                disposal = (gflags >> 2) & 7
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        left = int.from_bytes(b[off + 1:off + 3], "little")
        top = int.from_bytes(b[off + 3:off + 5], "little")
        w = int.from_bytes(b[off + 5:off + 7], "little")
        h = int.from_bytes(b[off + 7:off + 9], "little")
        iflags = b[off + 9]
        off += 10
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            table = np.frombuffer(b[off:off + 3 * n], dtype=np.uint8
                                  ).reshape(n, 3)
            off += 3 * n
        if table is None:
            raise ValueError("GIF image without any color table")
        min_code = b[off]
        off += 1
        data, off = _subblocks(b, off)
        pix = np.array(_lzw_decode(data, min_code)[:w * h],
                       dtype=np.int32)
        if pix.size < w * h:
            pix = np.pad(pix, (0, w * h - pix.size))
        idx = pix.reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        prev_region = canvas[top:top + h, left:left + w].copy()
        region = table[np.clip(idx, 0, len(table) - 1)]
        if transparent is not None:
            keep = (idx == transparent)
            region = np.where(keep[..., None],
                              canvas[top:top + h, left:left + w], region)
        canvas[top:top + h, left:left + w] = region
        yield canvas.copy(), delay_ms
        if disposal == 2:  # restore to background color
            canvas[top:top + h, left:left + w] = bg
        elif disposal == 3:  # restore to previous
            canvas[top:top + h, left:left + w] = prev_region


def decode_gif(b: bytes) -> np.ndarray:
    """First (or only) frame as (h, w, 3) uint8 RGB."""
    for frame, _delay in iter_gif_frames(b):
        return frame
    raise ValueError("GIF contains no image data")


def probe_gif(b: bytes) -> dict:
    """Container metadata without decoding pixels: screen dims, frame
    count, total animation duration."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    flags = b[10]
    off = 13
    if flags & 0x80:
        off += 3 * (2 << (flags & 7))
    n_frames = 0
    duration_ms = 0
    while off < len(b) and b[off] != 0x3B:
        block = b[off]
        if block == 0x21:
            if b[off + 1] == 0xF9:
                duration_ms += int.from_bytes(b[off + 4:off + 6],
                                              "little") * 10
            off += 2
            _, off = _subblocks(b, off)
        elif block == 0x2C:
            n_frames += 1
            iflags = b[off + 9]
            off += 10
            if iflags & 0x80:
                off += 3 * (2 << (iflags & 7))
            off += 1  # min code size
            _, off = _subblocks(b, off)
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    return {"width": sw, "height": sh, "n_frames": n_frames,
            "duration_ms": duration_ms,
            "version": b[:6].decode("ascii")}
