"""Scale-stress the graph operators: connected components over a
~2M-edge / ~1M-node graph and PageRank (sink form) over a ~500k-node
link graph — evidence for the round count bound (O(log n) star
rounds), the exchange partitioning assumption (reducer peak bytes),
and that the sink-form PageRank never materializes the rank vector on
the driver.

Both graphs are synthesized DETERMINISTICALLY (seeded RNG + fixed
structure; no external data):
  - CC graph: 5,000 chains of 100 nodes each (500k nodes) plus
    1.5M random extra edges over another 500k nodes — chains force
    multi-hop propagation, randoms give realistic component mixing.
    Ground truth = a driver union-find over the same edge list.
  - PR graph: 500k pages, each linking to its 2 consecutive neighbors
    (planting the triangle (i, i+1, i+2) at every node) plus 2
    deterministic pseudo-random targets (2M edges).  PageRank is
    checked for mass conservation (integer mass only ever shrinks)
    and node coverage; triangle counting must find exactly the
    500k planted triangles.

Usage: python scripts/stress_graphops.py [n_chains] [chain_len] [n_random_nodes] [pr_nodes]
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


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_rand_nodes = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    pr_nodes = int(sys.argv[4]) if len(sys.argv) > 4 else 500_000

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

    from website_indexer_ray.pipelines import graphops
    from website_indexer_ray.state.exchange import _pool

    results = {}

    # ---- connected components ---------------------------------------
    rng = np.random.default_rng(42)
    chain_base = np.arange(n_chains * chain_len).reshape(n_chains, chain_len)
    chain_a = chain_base[:, :-1].ravel()
    chain_b = chain_base[:, 1:].ravel()
    rand_lo = n_chains * chain_len
    n_rand_edges = 3 * n_rand_nodes
    rand_a = rng.integers(rand_lo, rand_lo + n_rand_nodes, n_rand_edges)
    rand_b = rng.integers(rand_lo, rand_lo + n_rand_nodes, n_rand_edges)
    a = np.concatenate([chain_a, rand_a]).astype(np.int64)
    b = np.concatenate([chain_b, rand_b]).astype(np.int64)
    edges = pa.table(
        {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
    )

    shards = _pool(8)
    ray.get([s.reset_peak.remote() for s in shards])
    t0 = time.monotonic()
    comp = graphops.connected_components(edges, n_reducers=8)
    wall = time.monotonic() - t0
    peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])

    # ground truth: driver union-find (numpy-assisted path compression)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        if x == y:
            continue
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    node = comp.column("node").to_numpy(zero_copy_only=False)
    cgot = comp.column("component").to_numpy(zero_copy_only=False)
    ok = all(find(int(n)) == int(c) for n, c in zip(node[::997], cgot[::997]))
    n_components = len(np.unique(cgot))
    results["connected_components"] = {
        "edges": len(a),
        "nodes": int(comp.num_rows),
        "components": int(n_components),
        "wall_s": round(wall, 2),
        "reducer_peak_mb": round(max(peaks) / 1e6, 1),
        "sampled_ground_truth_ok": bool(ok),
    }
    print(json.dumps({"connected_components": results["connected_components"]}))

    # ---- connected components, hot-hub skew case ----------------------
    # A 1M-leaf star: every edge shares node 0, so the large-star round
    # co-locates the hub's entire adjacency in ONE reducer partition —
    # the documented worst case (peak = max node degree, not graph
    # size). Converges in one round (the star is already a star).
    n_leaves = 1_000_000
    star = pa.table(
        {
            "a": pa.array(np.zeros(n_leaves, dtype=np.int64)),
            "b": pa.array(np.arange(1, n_leaves + 1, dtype=np.int64)),
        }
    )
    shards = _pool(8)
    ray.get([s.reset_peak.remote() for s in shards])
    t0 = time.monotonic()
    comp = graphops.connected_components(star, n_reducers=8)
    wall = time.monotonic() - t0
    peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])
    assert comp.num_rows == n_leaves + 1
    assert len(np.unique(comp.column("component").to_numpy())) == 1
    results["connected_components_hot_hub"] = {
        "edges": n_leaves,
        "max_degree": n_leaves,
        "wall_s": round(wall, 2),
        "reducer_peak_mb": round(max(peaks) / 1e6, 1),
    }
    print(
        json.dumps(
            {"connected_components_hot_hub": results["connected_components_hot_hub"]}
        )
    )

    # ---- PageRank (sink form) ----------------------------------------
    out_dir = "/tmp/wir_stress_graph/pr"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    urls = [f"https://stress.example/p{i}" for i in range(pr_nodes)]
    # two consecutive targets (i+1, i+2: every node closes the known
    # triangle (i, i+1, i+2)) + two pseudo-random ones
    idx = np.arange(pr_nodes)[:, None]
    tgt = np.concatenate(
        [
            (idx + np.array([1, 2])) % pr_nodes,
            (idx * 2_654_435_761 + np.array([31, 101])) % pr_nodes,
        ],
        axis=1,
    )
    links = [[urls[j] for j in row] for row in tgt]
    records = pa.table(
        {
            "record_type": pa.array(["page"] * pr_nodes),
            "url": pa.array(urls),
            "links": pa.array(links, type=pa.list_(pa.string())),
        }
    )
    n_blocks = 64
    step = -(-pr_nodes // n_blocks)
    ds = ray.data.from_arrow(
        [records.slice(i, step) for i in range(0, pr_nodes, step)]
    )
    shards = _pool(8)
    ray.get([s.reset_peak.remote() for s in shards])
    t0 = time.monotonic()
    ranks = graphops.pagerank_write(ds, out_dir, iterations=3, n_reducers=8)
    wall = time.monotonic() - t0  # operator only; verification below
    peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])
    total_mass = sum(
        int(s)
        for batch in ranks.iter_batches(batch_format="pyarrow")
        for s in [pa.compute.sum(batch.column("pr")).as_py()]
    )
    n_ranked = ranks.count()
    results["pagerank_write"] = {
        "nodes": pr_nodes,
        "edges": int(tgt.size),
        "iterations": 3,
        "wall_s": round(wall, 2),
        "reducer_peak_mb": round(max(peaks) / 1e6, 1),
        "ranked_nodes": int(n_ranked),
        "mass_ratio": round(total_mass / 10**12, 4),
    }
    print(json.dumps({"pagerank_write": results["pagerank_write"]}))

    # ---- triangle counting over the same 500k-node link graph --------
    shards = _pool(8)
    ray.get([s.reset_peak.remote() for s in shards])
    t0 = time.monotonic()
    tri = graphops.triangle_count(ds, n_reducers=8)
    wall = time.monotonic() - t0
    peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])
    n_tri = int(tri.column("n_triangles")[0].as_py())
    assert n_tri >= pr_nodes - 2, n_tri  # every (i, i+1, i+2) planted
    results["triangle_count"] = {
        "nodes": pr_nodes,
        "edges": int(tgt.size),
        "triangles": n_tri,
        "wall_s": round(wall, 2),
        "reducer_peak_mb": round(max(peaks) / 1e6, 1),
    }
    print(json.dumps({"triangle_count": results["triangle_count"]}))

    # ---- triangle sink form: driver residency bounded ----------------
    # Every stage lands in committed parquet; the ONLY O(graph) object
    # the driver ever holds is the slim (node, deg) table it broadcasts
    # as two int64 numpy arrays — reported here as evidence.
    import glob

    tri_dir = "/tmp/wir_stress_tri"
    shutil.rmtree(tri_dir, ignore_errors=True)
    shards = _pool(8)
    ray.get([s.reset_peak.remote() for s in shards])
    t0 = time.monotonic()
    tri_ds = graphops.triangle_count_write(ds, tri_dir, n_reducers=8)
    corner_sum = sum(
        int(pa.compute.sum(batch.column("n_triangles")).as_py() or 0)
        for batch in tri_ds.iter_batches(batch_format="pyarrow")
    )
    wall = time.monotonic() - t0
    peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])
    assert corner_sum // 3 == n_tri, (corner_sum, n_tri)
    deg_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(tri_dir, "deg", "*.parquet"))
    )
    results["triangle_count_write"] = {
        "nodes": pr_nodes,
        "edges": int(tgt.size),
        "triangles": corner_sum // 3,
        "wall_s": round(wall, 2),
        "reducer_peak_mb": round(max(peaks) / 1e6, 1),
        # only driver-resident graph object = the broadcast degree
        # lookup built from this table (16 B/node as numpy arrays)
        "deg_table_mb": round(deg_bytes / 1e6, 2),
        "driver_lookup_mb": round(pr_nodes * 16 / 1e6, 2),
    }
    print(json.dumps({"triangle_count_write": results["triangle_count_write"]}))
    shutil.rmtree(tri_dir, ignore_errors=True)
    print(json.dumps({"summary": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
