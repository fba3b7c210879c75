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
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
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
