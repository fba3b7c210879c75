"""Scale-stress the exchange-family dedup ops at ~sf1 (10x the sf0.1
documents table) and log reducer-partition peak memory — evidence for
the exchange's core partitioning assumption ("one partition's rows
fit a reducer's heap", state/exchange.py) and that hot-bucket capping
engages rather than melting a reducer.

The 10x corpus is synthesized DETERMINISTICALLY from the sf0.1 table:
replica k of doc d gets doc_id d + k*10^7 and a per-replica suffix of
distinct tokens, so replicas stay below the Jaccard threshold (doc
volume scales 10x, pair volume stays at its natural level) while a
planted family of true near-dups per 100 docs keeps the pair path
exercised. No external data.

Usage: python scripts/stress_exchange.py [sf_dir] [replicas] [filler_tokens]
(filler_tokens=24 reproduces the dup-heavy worst case; default 150 is
the natural-pair-volume regime)
Prints one JSON line per op and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

STRESS_DIR = "/tmp/wir_stress_sf1"
REPLICA_STRIDE = 10_000_000


def build_corpus(sf_dir: str, replicas: int, filler_tokens: int = 150) -> str:
    src = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = src.column("doc_id").to_pylist()
    texts = src.column("text").to_pylist()
    out_ids: list[int] = []
    out_txt: list[str] = []
    for k in range(replicas):
        for d, t in zip(ids, texts):
            out_ids.append(d + k * REPLICA_STRIDE)
            if k == 0 or d % 100 == 0:
                # replica 0 verbatim; every 100th doc's replicas stay
                # near-identical (planted near-dup families)
                out_txt.append(t if k == 0 else t + f" dupmark{d % 7}")
            else:
                # distinct filler pushes cross-replica Jaccard far
                # below threshold (shared tokens / union ≈ 0.17 for
                # typical doc lengths): doc volume x10, pair volume
                # stays natural. (With a short filler every replica
                # family becomes a near-dup clique — a separate
                # dup-heavy worst case, measured once and recorded in
                # BASELINE.md: 148k pairs, 123 MB hot reducers, 17.7s.)
                filler = " ".join(
                    f"uniq{k}x{(d * 31 + j * 17 + k) % 99991}"
                    for j in range(filler_tokens)
                )
                out_txt.append(t + " " + filler)
    os.makedirs(STRESS_DIR, exist_ok=True)
    path = os.path.join(STRESS_DIR, "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "text": pa.array(out_txt, type=pa.string()),
                # deterministic 97-way source fan for the quota op
                "source": pa.array(
                    [f"src{i % 97}" for i in out_ids], type=pa.string()
                ),
            }
        ),
        path,
        row_group_size=4096,  # many row groups -> many blocks
    )
    build_embeddings(sf_dir, replicas)
    return STRESS_DIR


def build_embeddings(sf_dir: str, replicas: int) -> None:
    """10x embeddings, deterministically: replica k of vector v is
    np.roll(v, k) — same norm, near-zero cosine to the original for
    typical vectors, so the dup-pair volume stays natural — while
    every 100th vector's replicas stay VERBATIM (planted exact-dup
    families keep the in-cluster drop path exercised)."""
    import numpy as np

    src = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = src.column("vec_id").to_numpy(zero_copy_only=False)
    emb = src.column("embedding").combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // len(ids)
    mat = flat.reshape(len(ids), dim)
    out_ids, out_vecs = [], []
    for k in range(replicas):
        out_ids.append(ids + k * REPLICA_STRIDE)
        if k == 0:
            out_vecs.append(mat)
        else:
            rolled = np.roll(mat, k % dim if k % dim else 1, axis=1)
            keep_mask = ids % 100 == 0
            v = rolled.copy()
            v[keep_mask] = mat[keep_mask]
            out_vecs.append(v)
    all_ids = np.concatenate(out_ids)
    all_vecs = np.concatenate(out_vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(all_ids, type=pa.int64()),
                "embedding": pa.array(
                    list(all_vecs), type=pa.list_(pa.float64())
                ),
            }
        ),
        os.path.join(STRESS_DIR, "embeddings.parquet"),
        row_group_size=4096,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    filler_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 150

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    stress_dir = build_corpus(sf_dir, replicas, filler_tokens)
    n_docs = pq.read_metadata(
        os.path.join(stress_dir, "documents.parquet")
    ).num_rows
    print(json.dumps({"stress_docs": n_docs, "replicas": replicas}))

    from website_indexer_ray.pipelines import annops, corpusops, textops
    from website_indexer_ray.state.exchange import _pool

    results = {}
    for name, fn in (
        ("paragraph_dedup", textops.paragraph_dedup),
        ("simhash_pairs", textops.simhash_pairs),
        ("minhash_lsh_pairs", textops.minhash_lsh_pairs),
        ("snapshot_dedup", textops.snapshot_dedup),
        # same op with the broadcast verify disabled: forces the
        # candidate-Bloom-pruned exchange anti-join (the 100-TB path)
        (
            "snapshot_dedup_xchg",
            lambda d: textops.snapshot_dedup(d, verify_broadcast_max=0),
        ),
        # semantic dedup: full vectors ride the cluster exchange —
        # peak = corpus bytes / n_reducers, the partitioning assumption
        ("semantic_dedup", annops.semantic_dedup),
        # duplicated-span removal: gram volume is O(tokens) slim rows,
        # the heaviest routing of the family — the stat to watch
        ("dup_span_removal", textops.dup_span_removal),
        ("group_quota_sample", corpusops.group_quota_sample),
        ("shuffle_shards", corpusops.shuffle_shards),
        ("seq_pack", corpusops.seq_pack),
    ):
        shards = _pool(8)
        ray.get([s.reset_peak.remote() for s in shards])
        t0 = time.perf_counter()
        out = fn(stress_dir)
        wall = round(time.perf_counter() - t0, 3)
        peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])
        results[name] = {
            "wall_s": wall,
            "rows": out.num_rows,
            "reducer_peak_mb": [round(p / 1e6, 2) for p in peaks],
            "max_reducer_peak_mb": round(max(peaks) / 1e6, 2),
        }
        print(json.dumps({name: results[name]}))

    print(
        json.dumps(
            {
                "metric": "exchange_stress_sf1",
                "docs": n_docs,
                "ops": results,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
