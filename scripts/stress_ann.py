"""Scale-stress the ANN family at 10^6 vectors: knn_ivfpq (the
compressed-code scale path) and knn_ivf (for contrast) against exact
brute force on the same sampled query set, recording wall, recall@k,
exchange reducer peaks, and the encode-pass bytes/vector — the
8-byte-PQ-code claim (annops.py knn_ivfpq) measured, not asserted.

The corpus is synthesized deterministically: 64 ground-truth cluster
directions on the unit sphere, each vector = its direction + Gaussian
noise (clustered structure, so coarse quantization is meaningful —
a uniform cloud would make ANY IVF look bad and teach nothing).
Written as multi-row-group parquet so the rerank's row-group-pruned
filtered read has real pruning to do.

Usage: python scripts/stress_ann.py [n_vectors] [dim] [n_queries]
Prints one JSON line per op and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def build_embeddings(n: int, dim: int, path: str) -> None:
    rng = np.random.default_rng(20260818)
    n_true = 64
    centers = rng.normal(size=(n_true, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_true, n)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    writer = None
    chunk = 100_000
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        vecs = centers[assign[lo:hi]] + 0.25 * rng.normal(
            size=(hi - lo, dim)
        ).astype(np.float32)
        flat = pa.array(vecs.reshape(-1), type=pa.float32())
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (hi - lo + 1) * dim, dim, dtype=np.int32)),
            flat,
        )
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "embedding": emb,
                "label": pa.array(assign[lo:hi].astype(np.int32)),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl, row_group_size=50_000)
    writer.close()


def _recall(approx: pa.Table, exact: pa.Table, k: int) -> float:
    def sets(t):
        out: dict[int, set] = {}
        for q, nbr in zip(
            t.column("query_id").to_pylist(), t.column("neighbor_id").to_pylist()
        ):
            out.setdefault(q, set()).add(nbr)
        return out

    a, e = sets(approx), sets(exact)
    hits = total = 0
    for q, nbrs in e.items():
        hits += len(nbrs & a.get(q, set()))
        total += len(nbrs)
    return round(hits / max(total, 1), 4)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    k = 10

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

    from website_indexer_ray.pipelines import annops
    from website_indexer_ray.state.exchange import _pool

    sf_dir = "/tmp/wir_stress/ann_sf"
    path = os.path.join(sf_dir, "embeddings.parquet")
    t0 = time.monotonic()
    build_embeddings(n, dim, path)
    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": dim,
                "file_mb": round(os.path.getsize(path) / 1e6, 1),
                "gen_s": round(time.monotonic() - t0, 1),
            }
        ),
        flush=True,
    )

    shards = _pool(8)
    results = {}
    # operating point (measured at 1M, see BENCH/BASELINE.md): with
    # sqrt(n) coarse cells the synthetic's 64 true directions overlap
    # many cells, so probe 32; PQ codebooks at the standard 8-bit
    # 256 codewords (32 codewords measured 0.16-0.20 lower recall at
    # identical exchange bytes); rerank 100·k — the rerank re-scores
    # EXACTLY via the pruned filtered read, so depth costs IO, not
    # driver memory.
    for name, fn, kwargs in [
        ("knn_bruteforce", annops.knn_bruteforce, {}),
        ("knn_ivf", annops.knn_ivf, {"n_probe": 16}),
        ("knn_ivfpq", annops.knn_ivfpq,
         {"n_probe": 32, "rerank_depth": 100 * k, "n_codewords": 256}),
    ]:
        ray.get([s.reset_peak.remote() for s in shards])
        t0 = time.monotonic()
        out = fn(sf_dir, k=k, n_queries=n_queries, **kwargs)
        wall = time.monotonic() - t0
        peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])
        rec = {
            "metric": f"ann_stress_{name}",
            "n_vectors": n,
            "wall_s": round(wall, 1),
            "rows": out.num_rows,
            "reducer_peak_mb": round(max(peaks) / 1e6, 1) if peaks else 0.0,
        }
        if name != "knn_bruteforce":
            rec["recall_at_k"] = _recall(out, results["knn_bruteforce"], k)
        if name == "knn_ivfpq":
            # encode-pass payload per vector: vec_id (8) + cluster (8)
            # + m-byte code — vs 4*dim for the raw vector
            rec["code_bytes_per_vec"] = 8 + 8 + 8
            rec["raw_bytes_per_vec"] = 4 * dim
        results[name] = out
        print(json.dumps(rec), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
