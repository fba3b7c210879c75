"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus
a metadata struct; decode / feature-extract / resize / frame-sample
run as actor-pool ``map_batches`` stages. This container ships no
codec libraries (no PIL / ffmpeg / torchvision); coverage is split:

- IMAGE (PNG): ``use_real_codecs=True`` is a REAL path — the
  stdlib-only codec in ``functions/png.py`` decodes/encodes 8-bit
  PNG, so feature extraction returns pixel statistics and the resize
  stage emits true downsampled PNG thumbnails.  Other image formats
  raise NotImplementedError per payload.
- ANIMATION (APNG): frame sampling under ``use_real_codecs=True`` is
  also REAL — full-frame-replace APNGs decode through the same
  stdlib codec and every ``frame_stride``-th frame is sampled.
- AUDIO (WAV): feature extraction under ``use_real_codecs=True`` is
  REAL for PCM WAV via the stdlib ``wave`` module (rate / duration /
  RMS / zero-crossing statistics).
- COMPRESSED AUDIO/VIDEO containers: still gated — such payloads
  raise per payload (needs ffmpeg).  The default deterministic fake decoder
  derives "features" from payload bytes; the Ray-side plumbing
  (schema, broadcast, batch sizing, actor signature, output layout)
  is real and tested either way.

Batch-size guidance for real media: large binary payloads need small
``batch_size`` (payload_bytes × batch_size × concurrency must fit the
worker heap) and ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas cleanly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from website_indexer_ray.util import (
    collect_table_blocks,
    read_parquet_parallel,
)

import hashlib

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("media_kind", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 8


def pack_binary(batch: pa.Table) -> pa.Table:
    """documents → opaque media rows (deterministic fake payloads:
    the utf-8 bytes of the text column)."""
    texts = batch.column("text").to_pylist()
    payloads = [t.encode("utf-8") for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_kind": pa.array(["image/fake"] * len(payloads)),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class MediaFeatureStage:
    """Decode + feature-extract actor stage.

    __init__ is the once-per-actor model/codec load; __call__ is the
    per-batch vectorized pass.

    ``use_real_codecs=True`` enables the REAL decode path for the
    formats the environment can handle: PNG decodes through the
    stdlib-only codec (functions/png.py — no PIL/ffmpeg in this
    container) giving pixel-statistics features, and PCM WAV decodes
    through the stdlib ``wave`` module giving audio statistics;
    payloads in any other format raise NotImplementedError per batch
    (compressed audio/video need external codec libraries)."""

    def __init__(self, use_real_codecs: bool = False, frame_stride: int = 512):
        self.use_real_codecs = use_real_codecs
        if use_real_codecs:
            # once-per-actor codec load (the model-load slot)
            from website_indexer_ray.functions import png as _png

            self._png = _png
        self.frame_stride = frame_stride

    def _real_decode(self, payload: bytes) -> np.ndarray:
        """Real features for decodable payloads (FEATURE_DIM floats):
        PNG → [h, w, channels, mean, std, min, max, nonzero fraction]
        via the stdlib codec; WAV → [n_channels, sample_rate,
        n_samples, duration_s, rms, zero-crossing rate, min, max] via
        the stdlib ``wave`` module.  Compressed audio/video raise per
        payload (needs ffmpeg)."""
        if self._png.is_png(payload):
            px = self._png.decode_png(payload).astype(np.float32)
            h, w, ch = px.shape
            return np.asarray(
                [
                    h,
                    w,
                    ch,
                    float(px.mean()),
                    float(px.std()),
                    float(px.min()),
                    float(px.max()),
                    float((px > 0).mean()),
                ],
                dtype=np.float32,
            )
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._wav_features(payload)
        raise NotImplementedError(
            "real decode supports PNG and WAV in this environment "
            "(stdlib codecs); other formats need PIL/ffmpeg"
        )

    @staticmethod
    def _wav_features(payload: bytes) -> np.ndarray:
        """PCM WAV → audio statistics via stdlib wave + numpy (real
        audio decode, no external codec): normalized samples, RMS,
        zero-crossing rate."""
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch = w.getnchannels()
            rate = w.getframerate()
            width = w.getsampwidth()
            n = w.getnframes()
            raw = w.readframes(n)
        if width == 2:
            samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
            samples /= 32768.0
        elif width == 1:  # unsigned 8-bit PCM
            samples = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        else:
            raise NotImplementedError(
                f"unsupported WAV sample width {width} (8/16-bit PCM only)"
            )
        if not len(samples):
            samples = np.zeros(1)
        zc = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1]))) if len(samples) > 1 else 0.0
        return np.asarray(
            [
                n_ch,
                rate,
                n,
                n / rate if rate else 0.0,
                float(np.sqrt(np.mean(samples**2))),
                zc,
                float(samples.min()),
                float(samples.max()),
            ],
            dtype=np.float32,
        )

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        """Deterministic stand-in for decode+embed: FEATURE_DIM floats
        derived from salted blake2b over the payload."""
        vals = [
            int.from_bytes(
                hashlib.blake2b(
                    payload, digest_size=8, salt=i.to_bytes(8, "little")
                ).digest(),
                "big",
            )
            % 1_000_003
            / 1_000_003.0
            for i in range(FEATURE_DIM)
        ]
        return np.asarray(vals, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        decode = self._real_decode if self.use_real_codecs else self._fake_decode
        feats = [decode(p) for p in payloads]
        n_frames = [1 + len(p) // self.frame_stride for p in payloads]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": batch.column("n_bytes"),
                "n_frames": pa.array(n_frames, type=pa.int64()),
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Frame sampling over opaque payloads — the video-style stage:
    one output row per sampled frame, capped at ``max_frames`` per
    document.  ``use_real_codecs=True`` is a REAL path for APNG
    (animated PNG via the stdlib codec: every ``frame_stride``-th
    decoded frame is sampled); video containers still need ffmpeg and
    raise per payload.  The default fake path samples at
    ``stride``-byte boundaries.  Frame-bearing batches multiply rows —
    keep batch_size small when payloads are large (class docstring
    above)."""

    def __init__(self, stride: int = 512, max_frames: int = 8,
                 use_real_codecs: bool = False, frame_stride: int = 2):
        self.use_real_codecs = use_real_codecs
        if use_real_codecs:
            # once-per-actor codec load: the stdlib APNG decoder —
            # real animated-image frame extraction with no external
            # library; video containers still need ffmpeg and raise
            # per payload.
            from website_indexer_ray.functions import png as _png

            self._png = _png
        self.stride = stride
        self.max_frames = max_frames
        self.frame_stride = frame_stride

    def _real_rows(self, batch: pa.Table) -> pa.Table:
        """Real path: decode APNG payloads, sample every
        ``frame_stride``-th frame capped at ``max_frames``;
        frame_offset = the SOURCE frame index sampled."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_idx, out_off = [], [], []
        for did, payload in zip(ids, batch.column("payload").to_pylist()):
            if not self._png.is_apng(payload):
                raise NotImplementedError(
                    "real frame sampling supports APNG only in this "
                    "environment (stdlib codec); video needs ffmpeg"
                )
            frames = self._png.decode_apng_frames(payload)
            picks = list(range(0, len(frames), self.frame_stride))[
                : self.max_frames
            ]
            for j, src in enumerate(picks):
                out_id.append(int(did))
                out_idx.append(j)
                out_off.append(src)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "frame_offset": pa.array(out_off, type=pa.int64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_real_codecs:
            return self._real_rows(batch)
        n_bytes = batch.column("n_bytes").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        frames = np.minimum(self.max_frames, 1 + n_bytes // self.stride)
        out_ids = np.repeat(ids, frames)
        idx = np.concatenate([np.arange(f) for f in frames]) if len(frames) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "frame_idx": pa.array(idx.astype(np.int64), type=pa.int64()),
                "frame_offset": pa.array(
                    (idx * self.stride).astype(np.int64), type=pa.int64()
                ),
            }
        )


class MediaResizeStage:
    """Resize/thumbnail stage: derives bounded-size thumbnail payloads
    from the opaque media bytes (deterministic byte-truncation stand-in
    for a pixel resize — the real kernel drops into ``_resize`` when
    codec libs exist). Emits (doc_id, n_bytes, thumb_bytes, thumb)."""

    def __init__(self, max_bytes: int = 256, use_real_codecs: bool = False,
                 max_dim: int = 32):
        self.use_real_codecs = use_real_codecs
        if use_real_codecs:
            from website_indexer_ray.functions import png as _png

            self._png = _png
        self.max_bytes = max_bytes
        self.max_dim = max_dim

    def _resize(self, payload: bytes) -> bytes:
        if not self.use_real_codecs:
            return payload[: self.max_bytes]
        # real path: PNG → nearest-neighbor downsample to max_dim →
        # re-encoded PNG thumbnail (stdlib codec; other formats need
        # PIL/opencv)
        if not self._png.is_png(payload):
            raise NotImplementedError(
                "real resize supports PNG only in this environment "
                "(stdlib codec); other formats need PIL/opencv"
            )
        px = self._png.decode_png(payload)
        return self._png.encode_png(self._png.resize_nearest(px, self.max_dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        thumbs = [self._resize(p) for p in payloads]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": batch.column("n_bytes"),
                "thumb_bytes": pa.array(
                    [len(t) for t in thumbs], type=pa.int64()
                ),
                "thumb": pa.array(thumbs, type=pa.large_binary()),
            }
        )


def media_frame_sample(sf_dir: str, stride: int = 512, max_frames: int = 8) -> pa.Table:
    """documents → opaque payloads → frame-sample stage: one row per
    sampled frame (doc_id, frame_idx, frame_offset), SQL-checkable
    byte arithmetic."""
    import pyarrow.compute as pc

    ds = read_parquet_parallel(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    frames = ds.map_batches(pack_binary, batch_format="pyarrow").map_batches(
        FrameSampleStage(stride, max_frames),
        batch_format="pyarrow",
        batch_size=256,
    )
    tbl = pa.concat_tables(collect_table_blocks(frames)).combine_chunks()
    return tbl.take(
        pc.sort_indices(
            tbl, sort_keys=[("doc_id", "ascending"), ("frame_idx", "ascending")]
        )
    )


def media_thumbnails(sf_dir: str, max_bytes: int = 256) -> pa.Table:
    """documents → opaque payloads → resize stage; returns the slim
    (doc_id, n_bytes, thumb_bytes) projection (payload thumbnails stay
    in the pipeline; the driver only sees byte counts)."""
    import pyarrow.compute as pc

    ds = read_parquet_parallel(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    thumbs = ds.map_batches(pack_binary, batch_format="pyarrow").map_batches(
        MediaResizeStage(max_bytes),
        batch_format="pyarrow",
        batch_size=256,
    )
    tables = [
        t.select(["doc_id", "n_bytes", "thumb_bytes"])
        for t in collect_table_blocks(thumbs)
    ]
    tbl = pa.concat_tables(tables).combine_chunks()
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))


def media_thumbnails_write(
    sf_dir: str, out_dir: str, max_bytes: int = 256
) -> None:
    """Sink form: thumbnail PAYLOADS (binary column) stream straight
    to partitioned parquet — the table-returning form above drops the
    payload and returns byte counts because the driver contract wants
    a slim table; a production media pipeline keeps the bytes and
    sinks them."""
    ds = read_parquet_parallel(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(
        ds.map_batches(pack_binary, batch_format="pyarrow").map_batches(
            MediaResizeStage(max_bytes),
            batch_format="pyarrow",
            batch_size=256,
        ),
        out_dir,
    )


def media_features_write(sf_dir: str, out_dir: str) -> None:
    """Sink form of media_features: full rows (including the stub
    feature embedding column downstream ANN consumes) stream to
    parquet with no driver concat."""
    ds = read_parquet_parallel(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(
        ds.map_batches(pack_binary, batch_format="pyarrow").map_batches(
            MediaFeatureStage(),
            batch_format="pyarrow",
            batch_size=256,
        ),
        out_dir,
    )


def media_features(sf_dir: str) -> pa.Table:
    """documents → pack binary → actor-pool feature extraction.

    Output (doc_id, n_bytes, n_frames) is deterministic and
    SQL-checkable (octet_length arithmetic); the feature column is the
    stub embedding used by downstream similarity stages.
    """
    ds = read_parquet_parallel(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    media = ds.map_batches(pack_binary, batch_format="pyarrow")
    feats = media.map_batches(
        MediaFeatureStage(),
        batch_format="pyarrow",
        batch_size=256,  # small: payload-bearing batches
    )
    import pyarrow.compute as pc

    tables = collect_table_blocks(feats)
    tbl = pa.concat_tables([t.combine_chunks() for t in tables]).select(
        ["doc_id", "n_bytes", "n_frames"]
    )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))
