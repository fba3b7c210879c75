"""Minimal stdlib-only PNG codec (zlib + struct + numpy).

Supports 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced —
the common still-image envelope.  Implemented from the public PNG
specification (W3C PNG, RFC 2083): chunk framing, IHDR/IDAT/IEND, and
all five scanline filters (None/Sub/Up/Average/Paeth) on decode;
encode writes filter-0 scanlines.

This exists because the container ships no codec libraries (PIL /
opencv / ffmpeg): it unstubs the image half of the multimodal stages
(`pipelines/multimodal.py` ``use_real_codecs=True``) for one real
format.  Scanline unfiltering is vectorized across each row's
channels (Sub via wrapping ``np.add.accumulate``; Average/Paeth walk
pixels, vector over channels) — fine for thumbnails/features; a real
cluster would swap in a compiled codec behind the same call."""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def is_png(data: bytes) -> bool:
    return data[:8] == SIGNATURE


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over one pixel's channels (int16 in,
    uint8 out)."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where(
        (pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c)
    ).astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array.

    Raises ValueError on a non-PNG / torn stream and
    NotImplementedError for sub-formats outside the supported envelope
    (16-bit, palette, interlaced)."""
    if not is_png(data):
        raise ValueError("not a PNG stream")
    pos = 8
    idat = []
    dims = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or color not in _COLOR_CHANNELS:
                raise NotImplementedError(
                    f"unsupported PNG: bit depth {depth}, color type {color}"
                )
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            dims = (h, w, _COLOR_CHANNELS[color])
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if dims is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    h, w, ch = dims
    return _unfilter(zlib.decompress(b"".join(idat)), w, h, ch)


def _unfilter(decompressed: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Filtered scanline payload → (h, w, ch) uint8 pixels (all five
    PNG filter types). Shared by still-PNG decode and per-frame APNG
    decode."""
    stride = w * ch
    raw = np.frombuffer(decompressed, dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:]
        prev = out[y - 1] if y else zero_row
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: recon[i] = line[i] + recon[i-ch]
            px = line.reshape(w, ch)
            out[y] = np.add.accumulate(px, axis=0, dtype=np.uint8).ravel()
        elif ftype == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            rec = out[y]
            pv = prev.reshape(w, ch).astype(np.int16)
            ln16 = line.reshape(w, ch).astype(np.int16)
            rw = rec.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                rw[x] = (ln16[x] + ((left + pv[x]) >> 1)).astype(np.uint8)
                left = rw[x].astype(np.int16)
        elif ftype == 4:  # Paeth
            rec = out[y]
            pv = prev.reshape(w, ch).astype(np.int16)
            ln16 = line.reshape(w, ch).astype(np.int16)
            rw = rec.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int16)
            upleft = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                pred = _paeth(left, pv[x], upleft)
                rw[x] = (ln16[x] + pred).astype(np.uint8)
                left = rw[x].astype(np.int16)
                upleft = pv[x]
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.reshape(h, w, ch)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, channels) uint8 array → PNG bytes (filter-0
    scanlines, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in _CHANNELS_COLOR:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_COLOR[ch], 0, 0, 0)
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = a.reshape(h, w * ch)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


# --- APNG (animated PNG; public W3C/Mozilla extension) ---------------
#
# Minimal envelope: full-frame replace animations (every fcTL covers
# the whole canvas, dispose_op 0 / blend_op 0) — exactly what
# encode_apng writes.  Enough to give frame sampling a REAL decodable
# animation format with no external codec.


def is_apng(data: bytes) -> bool:
    """True when an acTL chunk appears before the first IDAT."""
    if not is_png(data):
        return False
    pos = 8
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        if typ == b"acTL":
            return True
        if typ in (b"IDAT", b"IEND"):
            return False
        pos += 8 + ln + 4
    return False


def encode_apng(frames: list[np.ndarray]) -> bytes:
    """Full-frame replace animation from equal-shaped uint8 arrays
    (filter-0 scanlines, one zlib stream per frame)."""
    if not frames:
        raise ValueError("need at least one frame")
    first = np.asarray(frames[0], dtype=np.uint8)
    if first.ndim == 2:
        frames = [np.asarray(f, dtype=np.uint8)[:, :, None] for f in frames]
    else:
        frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, ch = frames[0].shape
    if any(f.shape != (h, w, ch) for f in frames):
        raise ValueError("all frames must share one shape")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_COLOR[ch], 0, 0, 0)
    out = [SIGNATURE, _chunk(b"IHDR", ihdr)]
    out.append(_chunk(b"acTL", struct.pack(">II", len(frames), 0)))
    seq = 0

    def fctl() -> bytes:
        nonlocal seq
        c = _chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0),
        )
        seq += 1
        return c

    def scanlines(f: np.ndarray) -> bytes:
        scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
        scan[:, 1:] = f.reshape(h, w * ch)
        return zlib.compress(scan.tobytes(), 6)

    out.append(fctl())
    out.append(_chunk(b"IDAT", scanlines(frames[0])))
    for f in frames[1:]:
        out.append(fctl())
        out.append(
            _chunk(b"fdAT", struct.pack(">I", seq) + scanlines(f))
        )
        seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_apng_frames(data: bytes) -> list[np.ndarray]:
    """APNG bytes → list of (h, w, ch) uint8 frames.

    Supports the full-frame replace envelope (every fcTL covers the
    whole canvas at offset 0 with dispose 0 / blend 0 — what
    ``encode_apng`` produces); sub-region / composited animations
    raise NotImplementedError."""
    if not is_png(data):
        raise ValueError("not a PNG stream")
    pos = 8
    dims = None
    frames: list[list[bytes]] = []
    cur: list[bytes] | None = None
    saw_actl = False
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or color not in _COLOR_CHANNELS or interlace:
                raise NotImplementedError("unsupported APNG sub-format")
            dims = (h, w, _COLOR_CHANNELS[color])
        elif typ == b"acTL":
            saw_actl = True
        elif typ == b"fcTL":
            (_seq, fw, fh, fx, fy, _dn, _dd, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", chunk
            )
            if dims is None:
                raise ValueError("fcTL before IHDR")
            if (fh, fw) != dims[:2] or fx or fy or dispose or blend:
                raise NotImplementedError(
                    "APNG decode supports full-frame replace animations "
                    "only (whole-canvas fcTL, dispose 0, blend 0)"
                )
            cur = []
            frames.append(cur)
        elif typ == b"IDAT":
            if cur is None:  # still PNG data without a preceding fcTL
                cur = []
                frames.append(cur)
            cur.append(chunk)
        elif typ == b"fdAT":
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            cur.append(chunk[4:])  # strip the sequence number
        elif typ == b"IEND":
            break
    if not saw_actl:
        raise ValueError("not an APNG (no acTL chunk)")
    if dims is None or not frames:
        raise ValueError("truncated APNG")
    h, w, ch = dims
    return [
        _unfilter(zlib.decompress(b"".join(parts)), w, h, ch)
        for parts in frames
        if parts
    ]


def resize_nearest(arr: np.ndarray, max_dim: int) -> np.ndarray:
    """Nearest-neighbor downsample so max(h, w) <= max_dim (no-op when
    already within bounds) — pure numpy strided gather."""
    h, w = arr.shape[:2]
    scale = max(h, w) / max_dim
    if scale <= 1:
        return arr
    nh, nw = max(1, int(h / scale)), max(1, int(w / scale))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[ys][:, xs]
