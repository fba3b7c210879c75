"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus
a metadata struct; decode / feature-extract / resize / frame-sample
run as actor-pool ``map_batches`` stages. This container ships no
codec libraries (no PIL / ffmpeg / torchvision), so the decode step is
STUBBED: ``use_real_codecs=True`` raises NotImplementedError at actor
construction, and the default deterministic fake decoder derives
"features" from the payload bytes — the Ray-side plumbing (schema,
broadcast, batch sizing, actor signature, output layout) is real and
tested.

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

from website_indexer_ray.util import read_parquet_parallel

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
    """

    def __init__(self, use_real_codecs: bool = False, frame_stride: int = 512):
        if use_real_codecs:
            raise NotImplementedError(
                "Real image/audio decoding requires codec libraries not "
                "present in this environment (PIL/ffmpeg). Wire them in "
                "here; the stage contract stays identical."
            )
        self.frame_stride = frame_stride

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
        feats = [self._fake_decode(p) for p in payloads]
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

    tables = [t for t in (ray.get(r) for r in feats.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables([t.combine_chunks() for t in tables]).select(
        ["doc_id", "n_bytes", "n_frames"]
    )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))
