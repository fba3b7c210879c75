"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — per-batch numpy matmul
  against a broadcast query matrix (``ray.put`` once), partial top-k
  per batch, tiny driver-side merge. This is the baseline and the
  correctness oracle target (DuckDB list_cosine_similarity).
- ``knn_lsh``: random-hyperplane LSH (Charikar 2002) bucketed
  variant — the scale path: hash every vector into sign-pattern
  buckets with multiple hash tables, search only colliding buckets.
  Approximate ⇒ rows-only check; recall vs brute force is asserted in
  pytest instead.

Arithmetic is float64 end-to-end so results match the SQL oracle's
double precision.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data

from website_indexer_ray.util import (
    cached_get,
    collect_table_blocks,
    read_parquet_parallel,
)


def _embed_matrix(source, col: str = "embedding") -> np.ndarray:
    """Zero-copy-ish (n, dim) float64 matrix from a list<float> column:
    flatten the Arrow list values and reshape — no per-row Python lists."""
    c = source.column(col)
    if hasattr(c, "combine_chunks"):
        c = c.combine_chunks()
    n = len(c)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = c.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(n, len(flat) // n)


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, list[int]]:
    """The n_queries lowest vec_ids + their vectors via a pruned
    two-step read: the slim id column picks the ids, a filtered
    (row-group-pruned) read fetches just those vectors — the driver
    never holds the embedding matrix."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    path = f"{sf_dir}/embeddings.parquet"
    ids = pq.read_table(path, columns=["vec_id"]).column("vec_id").to_numpy()
    qids = np.sort(ids)[:n_queries].tolist()
    tbl = pads.dataset(path).to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(qids),
    )
    got = tbl.column("vec_id").to_numpy()
    order = np.argsort(got)
    mat = _embed_matrix(tbl)
    return mat[order], [int(got[i]) for i in order]


def _sample_matrix(sf_dir: str, cap: int = 4096) -> np.ndarray:
    """Bounded training sample for the coarse quantizer — first ``cap``
    rows, normalized (at 10^9+ vectors this becomes a distributed
    reservoir sample; the k-means iterations stay this size)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    batches, n = [], 0
    for b in pf.iter_batches(batch_size=1024, columns=["embedding"]):
        batches.append(b)
        n += b.num_rows
        if n >= cap:
            break
    mat = _embed_matrix(pa.Table.from_batches(batches))[:cap]
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)


class TopKStage:
    """Partial top-k per batch against the broadcast query matrix
    (instance-callable task: only the object ref pickles per task;
    the matrix itself resolves once per worker via cached_get)."""

    def __init__(self, q_ref, k: int):
        self.q_ref = q_ref
        self.k = k
        self.qnorm = None
        self.qids = None

    def _resolve(self):
        if self.qnorm is None:
            qmat, self.qids = (
                cached_get(self.q_ref)
                if not isinstance(self.q_ref, tuple)
                else self.q_ref
            )
            self.qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve()
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        mat = _embed_matrix(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = self.qnorm @ (mat / norms).T  # (n_queries, batch)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            mask = ids != qid  # exclude self-match
            cand_ids = ids[mask]
            cand_sims = row[mask]
            take = min(self.k, len(cand_ids))
            if take == 0:
                continue
            part = np.argpartition(-cand_sims, take - 1)[:take]
            out_q.extend([qid] * take)
            out_n.extend(cand_ids[part].tolist())
            out_s.extend(cand_sims[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5) -> pa.Table:
    """Exact cosine top-k; returns (query_id, neighbor_id, rank) with
    rank 1..k ordered by (sim desc, neighbor_id asc) — integer output
    so the oracle hash is float-drift-free."""
    queries = _load_queries(sf_dir, n_queries)
    q_ref = ray.put(queries)
    ds = read_parquet_parallel(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    partials = ds.map_batches(
        TopKStage(q_ref, k), batch_format="pyarrow", batch_size=1024
    )
    tables = collect_table_blocks(partials)
    merged: dict[int, list] = {}
    for t in tables:
        for q, n, s in zip(
            t.column("query_id").to_pylist(),
            t.column("neighbor_id").to_pylist(),
            t.column("sim").to_pylist(),
        ):
            merged.setdefault(q, []).append((-s, n))
    out_q, out_n, out_r = [], [], []
    for q in sorted(merged):
        top = heapq.nsmallest(k, merged[q])
        for rank, (_negs, n) in enumerate(top, start=1):
            out_q.append(q)
            out_n.append(n)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
        }
    )


# --- embedding-cosine near-dup pairs --------------------------------

class CosinePairStage:
    """Exact cosine near-dup: each batch of vectors is compared against
    the broadcast normalized corpus matrix (``ray.put`` once, read once
    per actor) — a blocked n x n matmul where only the slim batch rows
    travel. Exact so the SQL oracle (all-pairs list_cosine_similarity)
    matches; the 10^9-vector path swaps the broadcast matrix for the
    LSH-bucketed candidate generation below with identical verify
    semantics."""

    def __init__(self, mat_ref, threshold: float):
        self.mat_ref = mat_ref
        self.threshold = threshold
        self.ids = None
        self.norm = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.norm is None:
            self.ids, self.norm = (
                cached_get(self.mat_ref)
                if not isinstance(self.mat_ref, tuple)
                else self.mat_ref
            )
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        mat = _embed_matrix(batch)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = (mat / norms) @ self.norm.T  # (batch, corpus)
        rows_i, cols_j = np.nonzero(sims >= self.threshold)
        a = bids[rows_i]
        b = self.ids[cols_j]
        keep = a < b  # canonical orientation; also drops self-pairs
        return pa.table(
            {
                "vec_a": pa.array(a[keep], type=pa.int64()),
                "vec_b": pa.array(b[keep], type=pa.int64()),
            }
        )


def embedding_dedup_pairs(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold), sorted. The dedup-family member over the embedding
    column (exact dedup / MinHash / SimHash live in textops)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    mat = _embed_matrix(tbl)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    mat_ref = ray.put((ids, norm))

    ds = read_parquet_parallel(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    pairs = ds.map_batches(
        CosinePairStage(mat_ref, threshold), batch_format="pyarrow", batch_size=1024
    )
    tables = collect_table_blocks(pairs)
    if not tables:
        return pa.table(
            {
                "vec_a": pa.array([], type=pa.int64()),
                "vec_b": pa.array([], type=pa.int64()),
            }
        )
    out = pa.concat_tables(tables).combine_chunks()
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("vec_a", "ascending"), ("vec_b", "ascending")]
        )
    )


def embedding_dedup_lsh(
    sf_dir: str,
    threshold: float = 0.4,
    n_tables: int = 16,
    n_bits: int = 4,
    seed: int = 13,
) -> pa.Table:
    """The 10⁹-vector scale path for embedding near-dup (the exact
    broadcast variant above stays the oracle-matched baseline):
    random-hyperplane bucketing generates candidate pairs through a
    bucket-keyed actor exchange (slim (bucket_key, vec_id) rows only;
    hot buckets capped + logged — textops' LSH machinery reused), then
    candidates verify with EXACT cosine via a pair-keyed exchange —
    the full n×n similarity matrix never exists anywhere. Approximate
    (bucketing can miss pairs) ⇒ rows-only driver check; recall vs the
    exact variant asserted in pytest, precision 1.0 by construction
    (exact verify)."""
    import pyarrow.compute as pc

    from website_indexer_ray.pipelines.textops import (
        _split_candidates,
    )
    from website_indexer_ray.pipelines.textops import (
        _bucket_pairs_partition as bucket_pairs,
    )
    from website_indexer_ray.state.exchange import hash_exchange

    # Dim from one head row (works for a single file OR a directory of
    # parquet shards — e.g. curate's derived-embedding sink), planes
    # broadcast.
    import pyarrow.dataset as pads

    first = pads.dataset(f"{sf_dir}/embeddings.parquet").head(
        1, columns=["embedding"]
    )
    dim = len(first.column("embedding")[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    planes_ref = ray.put(planes)
    powers = 1 << np.arange(n_bits)

    def index(batch: pa.Table) -> pa.Table:
        pl = cached_get(planes_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        mat = _embed_matrix(batch)
        keys, docs = [], []
        for ti in range(n_tables):
            buckets = (mat @ pl[ti].T > 0) @ powers
            keys.append(buckets.astype(np.int64) * n_tables + ti)
            docs.append(ids)
        return pa.table(
            {
                "bucket_key": pa.array(np.concatenate(keys), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), type=pa.int64()),
            }
        )

    ds = read_parquet_parallel(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cand_raw = hash_exchange(
        ds.map_batches(index, batch_format="pyarrow", batch_size=2048),
        "bucket_key",
        bucket_pairs,
    )
    empty = pa.table(
        {
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
        }
    )
    if cand_raw is None:
        return empty
    cand_tbl = _split_candidates(cand_raw, "embedding_dedup_lsh")
    if cand_tbl.num_rows == 0:
        return empty
    cand_tbl = cand_tbl.group_by(["doc_a", "doc_b"]).aggregate([]).select(
        ["doc_a", "doc_b"]
    )

    # Exact-cosine verify of candidates: pair map broadcast, one
    # keyed exchange co-locates both sides. Each vector ships ONCE per
    # target partition (pair id-lists ride along), never once per pair
    # — routed bytes bound by O(vectors × n_reducers), not O(pairs)
    # (same reshape as textops._verify_pairs_jaccard).
    n_reducers = 8
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for a, b in zip(
        cand_tbl.column("doc_a").to_pylist(), cand_tbl.column("doc_b").to_pylist()
    ):
        by_doc.setdefault(a, []).append((a, b))
        by_doc.setdefault(b, []).append((a, b))
    map_ref = ray.put(by_doc)
    emb_list = pa.list_(pa.float64())
    id_list = pa.list_(pa.int64())

    def emit_sides(batch: pa.Table) -> pa.Table:
        want = cached_get(map_ref)
        ids = batch.column("vec_id").to_pylist()
        mat = _embed_matrix(batch)
        out_pk, out_id, out_a, out_b, out_e = [], [], [], [], []
        for i, vid in enumerate(ids):
            pairs = want.get(vid)
            if not pairs:
                continue
            vec = mat[i].tolist()
            by_shard: dict[int, tuple[list, list]] = {}
            for a, b in pairs:
                shard = (a * 1_000_003 + b) % n_reducers
                slot = by_shard.setdefault(shard, ([], []))
                slot[0].append(a)
                slot[1].append(b)
            for shard, (das, dbs) in by_shard.items():
                out_pk.append(shard)
                out_id.append(vid)
                out_a.append(das)
                out_b.append(dbs)
                out_e.append(vec)
        return pa.table(
            {
                "pair_key": pa.array(out_pk, type=pa.int64()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "doc_a": pa.array(out_a, type=id_list),
                "doc_b": pa.array(out_b, type=id_list),
                "embedding": pa.array(out_e, type=emb_list),
            }
        )

    def cosine_partition(group: pa.Table) -> pa.Table:
        vec_of: dict[int, np.ndarray] = {}
        pair_lists = []
        for d, das, dbs, e in zip(
            group.column("doc_id").to_pylist(),
            group.column("doc_a").to_pylist(),
            group.column("doc_b").to_pylist(),
            group.column("embedding").to_pylist(),
        ):
            vec_of[d] = np.asarray(e, dtype=np.float64)
            pair_lists.append((das, dbs))
        done: set[tuple[int, int]] = set()
        out_a, out_b = [], []
        for das, dbs in pair_lists:
            for a, b in zip(das, dbs):
                if (a, b) in done:
                    continue
                va, vb = vec_of.get(a), vec_of.get(b)
                if va is None or vb is None:
                    continue
                done.add((a, b))
                denom = max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-300)
                if float(va @ vb) / denom >= threshold:
                    out_a.append(a)
                    out_b.append(b)
        return pa.table(
            {
                "vec_a": pa.array(out_a, type=pa.int64()),
                "vec_b": pa.array(out_b, type=pa.int64()),
            }
        )

    out = hash_exchange(
        ds.map_batches(emit_sides, batch_format="pyarrow", batch_size=2048),
        "pair_key",
        cosine_partition,
        n_reducers=n_reducers,
    )
    if out is None:
        return empty
    import pyarrow.compute as pc2

    return out.take(
        pc2.sort_indices(
            out, sort_keys=[("vec_a", "ascending"), ("vec_b", "ascending")]
        )
    )


# --- IVF approximate variant ----------------------------------------

def _kmeans(mat: np.ndarray, k: int, n_iter: int = 8, seed: int = 5) -> np.ndarray:
    """Plain seeded Lloyd's k-means on (already normalized) vectors —
    the coarse quantizer is trained once on a driver-side sample; at
    10^9+ vectors the sample is a ray-side reservoir, the iterations
    stay this size."""
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class IvfAssignStage:
    """Assign each vector to its nearest centroid (broadcast ref)."""

    def __init__(self, cent_ref):
        self.cent_ref = cent_ref
        self.centroids = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.centroids is None:
            self.centroids = (
                cached_get(self.cent_ref)
                if not isinstance(self.cent_ref, np.ndarray)
                else self.cent_ref
            )
        mat = _embed_matrix(batch)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        assign = np.argmax((mat / norms) @ self.centroids.T, axis=1)
        # Vector payload rides along: the cluster-keyed exchange builds
        # the partitioned inverted lists directly from these rows.
        return batch.append_column(
            "cluster", pa.array(assign.astype(np.int64), type=pa.int64())
        )


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_clusters: int | None = None,
    n_probe: int = 4,
    seed: int = 5,
) -> pa.Table:
    """IVF approximate cosine top-k — distributed end to end:

      - coarse quantizer: seeded k-means on a bounded sample
        (_sample_matrix), centroids broadcast;
      - inverted lists: the assignment pass keys every vector by its
        cluster and a cluster-keyed hash exchange (state/exchange.py)
        co-locates each cluster's list in a reducer partition — the
        partitioned-inverted-list layout, never a driver dict;
      - search: each partition scores only the vectors whose cluster
        is probed by some query (queries + probe sets broadcast with
        the reduce fn) and emits per-query partial top-k; the driver
        merges the tiny partials.

    The embeddings parquet is never loaded whole anywhere.
    Approximate ⇒ rows-only check; recall vs brute force asserted in
    pytest."""
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    if n_clusters is None:
        n_clusters = max(4, int(np.sqrt(n_rows)))
    centroids = _kmeans(_sample_matrix(sf_dir), n_clusters, seed=seed)
    cent_ref = ray.put(centroids)

    qmat, qids = _load_queries(sf_dir, n_queries)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-300)
    # Probe sets: n_probe nearest centroids per query (tiny, driver).
    probes = [
        set(np.argsort(-(qnorm[i] @ centroids.T))[:n_probe].tolist())
        for i in range(len(qids))
    ]

    def search_partition(group: pa.Table) -> pa.Table:
        clusters = group.column("cluster").to_numpy(zero_copy_only=False)
        ids_np = group.column("vec_id").to_numpy(zero_copy_only=False)
        mat = _embed_matrix(group)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        normed = mat / norms
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(clusters, list(probes[qi])) & (ids_np != qid)
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            sims = normed[idx] @ qnorm[qi]
            take = min(k, len(idx))
            part = np.argpartition(-sims, take - 1)[:take]
            out_q.extend([qid] * take)
            out_n.extend(ids_np[idx][part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    from website_indexer_ray.state.exchange import hash_exchange

    ds = read_parquet_parallel(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    partials = hash_exchange(
        ds.map_batches(
            IvfAssignStage(cent_ref), batch_format="pyarrow", batch_size=2048
        ),
        "cluster",
        search_partition,
    )
    return _merge_topk(partials, k)


def _merge_topk(partials: pa.Table | None, k: int) -> pa.Table:
    """Tiny driver-side merge of per-partition (query_id, neighbor_id,
    sim) partial top-k rows → ranked (query_id, neighbor_id, rank),
    ordered by (sim desc, neighbor_id asc)."""
    import heapq

    merged: dict[int, list] = {}
    if partials is not None:
        for q, n, s in zip(
            partials.column("query_id").to_pylist(),
            partials.column("neighbor_id").to_pylist(),
            partials.column("sim").to_pylist(),
        ):
            merged.setdefault(q, []).append((-s, n))
    out_q, out_n, out_r = [], [], []
    for q in sorted(merged):
        top = heapq.nsmallest(k, merged[q])
        for rank, (_negs, n) in enumerate(top, start=1):
            out_q.append(q)
            out_n.append(n)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
        }
    )


# --- text → embedding (feature hashing; Weinberger et al. 2009) ------


def _embed_text_batch(batch: pa.Table, dim: int) -> pa.Table:
    """Vectorized hashed bag-of-words embedding: tokenize on Arrow
    kernels, hash tokens over the string buffers (hash_strings64),
    signed bucket accumulation via one bincount, L2 normalize.  A
    REAL deterministic embedder (no model weights needed), the
    classic feature-hashing baseline — and the batch shape a learned
    encoder drops into (per-batch matrix in, (doc_id, vector) out)."""
    import pyarrow.compute as pc

    from website_indexer_ray.pipelines.textops import _distinct_token_rows
    from website_indexer_ray.util import hash_strings64

    n = batch.num_rows
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    if not n:
        return out_schema.empty_table()
    text = batch.column("text").combine_chunks()
    norm = pc.utf8_lower(
        pc.utf8_trim(pc.replace_substring_regex(text, r"\s+", " "), " ")
    )
    toks = pc.split_pattern(norm, " ")
    flat = pc.list_flatten(toks)
    rows = pc.cast(pc.list_parent_indices(toks), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    rows = rows[keep]
    h = hash_strings64(flat)[keep].astype(np.uint64)
    bucket = (h % np.uint64(dim)).astype(np.int64)
    sign = 1.0 - 2.0 * ((h >> np.uint64(62)) & np.uint64(1)).astype(np.float64)
    mat = np.bincount(
        rows * dim + bucket, weights=sign, minlength=n * dim
    ).reshape(n, dim)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = (mat / norms).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    return pa.table(
        {"doc_id": pc.cast(batch.column("doc_id"), pa.int64()), "embedding": emb}
    )


def text_embed(sf_dir: str, dim: int = 64) -> pa.Table:
    """Documents → hashed-BoW embeddings (doc_id, list<float32>[dim]),
    one streaming vectorized pass; exactly-duplicate texts map to
    IDENTICAL vectors (pinned in pytest), so the derived embedding
    table composes with every downstream ANN / semantic-dedup op.
    Driver-table form for the query contract; ``text_embed_write`` is
    the sink form."""
    from functools import partial

    from website_indexer_ray.pipelines.textops import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    tbl = pa.concat_tables(
        [
            t.combine_chunks()
            for t in collect_table_blocks(
                ds.map_batches(
                    partial(_embed_text_batch, dim=dim), batch_format="pyarrow"
                )
            )
        ]
    )
    import pyarrow.compute as pc

    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))


def text_embed_write(sf_dir: str, out_dir: str, dim: int = 64) -> None:
    """Sink form: embeddings stream straight to committed parquet —
    nothing O(docs) on the driver (the layout downstream ANN reads)."""
    from functools import partial

    from website_indexer_ray.pipelines.textops import read_documents
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(
        read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
            partial(_embed_text_batch, dim=dim), batch_format="pyarrow"
        ),
        out_dir,
    )


def text_knn(sf_dir: str, k: int = 10, n_queries: int = 5, dim: int = 64) -> pa.Table:
    """End-to-end text similarity search WITHOUT a pre-made embedding
    table: documents → hashed-BoW embeddings (one streaming pass) →
    brute-force cosine top-k against the broadcast query vectors
    (query side = the n_queries lowest doc_ids).  The composition the
    training-data pipeline runs when no learned encoder exists yet;
    swap ``_embed_text_batch`` for a model stage and nothing else
    changes.  Deterministic ⇒ rows-only driver check; exact-duplicate
    retrieval pinned in pytest."""
    from functools import partial

    from website_indexer_ray.pipelines.textops import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    emb = ds.map_batches(
        partial(_embed_text_batch, dim=dim), batch_format="pyarrow"
    )

    # query side: n_queries lowest doc_ids, embedded once driver-side
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    ids = pq.read_table(path, columns=["doc_id"]).column("doc_id").to_numpy()
    qids = np.sort(ids)[:n_queries].tolist()
    import pyarrow.dataset as pads

    q_tbl = pads.dataset(path).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(qids)
    )
    q_emb = _embed_text_batch(q_tbl, dim)
    order = pc.sort_indices(q_emb, sort_keys=[("doc_id", "ascending")])
    q_emb = q_emb.take(order)
    qmat = _embed_matrix(q_emb)
    q_ref = ray.put((qmat, [int(v) for v in q_emb.column("doc_id").to_pylist()]))

    def renamed(b: pa.Table) -> pa.Table:
        return b.rename_columns(["vec_id", "embedding"])

    partials = emb.map_batches(renamed, batch_format="pyarrow").map_batches(
        TopKStage(q_ref, k), batch_format="pyarrow", batch_size=2048
    )
    merged = pa.concat_tables(
        collect_table_blocks(partials)
    )
    return _merge_topk(merged, k)


# --- IVF-PQ (product quantization, Jégou et al. 2011) ----------------


def _train_pq(
    sample: np.ndarray,
    centroids: np.ndarray,
    m: int,
    n_codewords: int,
    seed: int,
) -> np.ndarray:
    """Per-subspace PQ codebooks trained on coarse residuals of the
    (normalized) sample: (m, n_codewords, dim/m) float64.  Plain
    seeded Lloyd's in L2 per subspace — training stays sample-sized
    regardless of corpus size."""
    assign = np.argmax(sample @ centroids.T, axis=1)
    resid = sample - centroids[assign]
    d = sample.shape[1]
    dsub = d // m
    books = np.zeros((m, n_codewords, dsub), dtype=np.float64)
    rng = np.random.default_rng(seed)
    for s in range(m):
        sub = resid[:, s * dsub : (s + 1) * dsub]
        k0 = min(n_codewords, len(sub))
        cb = sub[rng.choice(len(sub), size=k0, replace=False)].copy()
        for _ in range(8):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d2, axis=1)
            for c in range(k0):
                mem = sub[a == c]
                if len(mem):
                    cb[c] = mem.mean(axis=0)
        books[s, :k0] = cb
    return books


class PqEncodeStage:
    """Vector → (cluster, m-byte PQ code) encode pass: normalize,
    coarse-assign, per-subspace nearest residual codeword.  Only
    (vec_id, cluster, codes) leaves this stage — the 100-TB property:
    the exchange and inverted lists carry m bytes per vector instead
    of the float embedding (32× smaller at dim 64 / m 8)."""

    def __init__(self, ref):
        self.ref = ref
        self.loaded = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.loaded is None:
            self.loaded = (
                cached_get(self.ref)
                if not isinstance(self.ref, tuple)
                else self.ref
            )
        centroids, books = self.loaded
        m, _ncw, dsub = books.shape
        mat = _embed_matrix(batch)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        normed = mat / norms
        assign = np.argmax(normed @ centroids.T, axis=1)
        resid = normed - centroids[assign]
        n = len(normed)
        codes = np.empty((n, m), dtype=np.uint8)
        for s in range(m):
            sub = resid[:, s * dsub : (s + 1) * dsub]
            # argmin ||sub - cb||² == argmin (-2·sub·cb + ||cb||²)
            d2 = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = np.argmin(d2, axis=1)
        codes_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(assign.astype(np.int64), type=pa.int64()),
                "codes": codes_arr,
            }
        )


def _codes_matrix(col, m: int) -> np.ndarray:
    """FixedSizeBinary column → (n, m) uint8 view (buffer slice, no
    per-row Python)."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    n = len(arr)
    if not n:
        return np.empty((0, m), dtype=np.uint8)
    buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    start = arr.offset * m
    return buf[start : start + n * m].reshape(n, m)


def knn_ivfpq(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_clusters: int | None = None,
    n_probe: int = 8,
    m: int = 8,
    n_codewords: int = 256,
    rerank_depth: int | None = None,
    seed: int = 5,
) -> pa.Table:
    """IVF-PQ approximate cosine top-k (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search") — the compressed-code
    scale path beyond ``knn_ivf``.  Default codebook width is the
    standard 8-bit 256 codewords: the 1M-vector sweep
    (scripts/stress_ann.py, BENCH/BASELINE.md) measured 32 codewords
    0.16-0.20 recall@10 below 256 at IDENTICAL exchange bytes (codes
    are uint8 either way).

      - train: coarse k-means + per-subspace residual codebooks on a
        bounded sample; (centroids, codebooks) broadcast once;
      - encode: one streaming pass emits (vec_id, cluster, m-byte
        code) — the inverted lists the cluster-keyed exchange builds
        hold PQ codes, not vectors (m bytes vs 4·dim: 32× smaller at
        dim 64), which is what makes a 10⁹-vector index fit a
        cluster's memory;
      - search: per partition, asymmetric-distance scoring — one
        (m × n_codewords) query lookup table gather per probed row,
        plus the query·centroid base term;
      - rerank: the approximate top-``rerank_depth`` (default 4k)
        candidate ids re-score EXACTLY via a row-group-pruned filtered
        read of just those vectors (the standard PQ recipe; candidate
        count is O(queries·k), never corpus-sized).

    Approximate ⇒ rows-only driver check; recall vs brute force
    asserted in pytest."""
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    if n_clusters is None:
        n_clusters = max(4, int(np.sqrt(n_rows)))
    if rerank_depth is None:
        rerank_depth = 8 * k
    sample = _sample_matrix(sf_dir)
    centroids = _kmeans(sample, n_clusters, seed=seed)
    books = _train_pq(sample, centroids, m, n_codewords, seed)
    ref = ray.put((centroids, books))

    qmat, qids = _load_queries(sf_dir, n_queries)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-300)
    qc = qnorm @ centroids.T  # (n_queries, n_clusters) base terms
    probes = [
        np.argsort(-qc[i])[:n_probe].astype(np.int64) for i in range(len(qids))
    ]
    dsub = books.shape[2]
    # per-query ADC tables: T[q][s][j] = q_s · codebook[s][j]
    tables = [
        np.stack(
            [
                qnorm[i, s * dsub : (s + 1) * dsub] @ books[s].T
                for s in range(m)
            ]
        )
        for i in range(len(qids))
    ]
    sub_idx = np.arange(m)

    def search_partition(group: pa.Table) -> pa.Table:
        clusters = group.column("cluster").to_numpy(zero_copy_only=False)
        ids_np = group.column("vec_id").to_numpy(zero_copy_only=False)
        codes = _codes_matrix(group.column("codes"), m)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(clusters, probes[qi]) & (ids_np != qid)
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            sims = tables[qi][sub_idx[None, :], codes[idx]].sum(axis=1)
            sims += qc[qi][clusters[idx]]
            take = min(rerank_depth, len(idx))
            part = np.argpartition(-sims, take - 1)[:take]
            out_q.extend([qid] * take)
            out_n.extend(ids_np[idx][part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    from website_indexer_ray.state.exchange import hash_exchange

    ds = read_parquet_parallel(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    partials = hash_exchange(
        ds.map_batches(
            PqEncodeStage(ref), batch_format="pyarrow", batch_size=2048
        ),
        "cluster",
        search_partition,
    )
    approx = _merge_topk(partials, rerank_depth)
    if not approx.num_rows:
        return approx

    # exact rerank: fetch ONLY candidate vectors (pruned filtered read)
    import pyarrow.dataset as pads

    cand_ids = sorted(set(approx.column("neighbor_id").to_pylist()))
    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(cand_ids),
    )
    got = tbl.column("vec_id").to_numpy()
    mat = _embed_matrix(tbl)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    pos = {int(v): i for i, v in enumerate(got)}
    out_q, out_n, out_s = [], [], []
    for q, nbr in zip(
        approx.column("query_id").to_pylist(),
        approx.column("neighbor_id").to_pylist(),
    ):
        qi = qids.index(q)
        out_q.append(q)
        out_n.append(nbr)
        out_s.append(float(qnorm[qi] @ mat[pos[nbr]]))
    rescored = pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64()),
        }
    )
    return _merge_topk(rescored, k)


# --- LSH-bucketed approximate variant -------------------------------

class LshSearchStage:
    """Bucket semi-join search: the queries' (table, bucket) signatures
    are broadcast (ref resolved once per worker); each batch hashes its
    vectors into every table's buckets and scores, per query, ONLY the
    vectors colliding with that query's bucket in at least one table —
    the LSH candidate rule enforced as a vectorized mask. Emits
    per-query partial top-k; nothing but those slim rows leaves the
    task, and no index or matrix ever lands on the driver."""

    def __init__(self, ref, k: int):
        self.ref = ref
        self.k = k
        self.state = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.state is None:
            self.state = (
                cached_get(self.ref) if not isinstance(self.ref, tuple) else self.ref
            )
        planes, qids, qnorm, qbuckets = self.state
        n_tables, n_bits, _dim = planes.shape
        powers = 1 << np.arange(n_bits)
        ids_np = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        mat = _embed_matrix(batch)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        normed = mat / norms
        buckets = np.stack(
            [(mat @ planes[ti].T > 0) @ powers for ti in range(n_tables)]
        )  # (n_tables, n)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            collide = np.zeros(len(ids_np), dtype=bool)
            for ti in range(n_tables):
                collide |= buckets[ti] == qbuckets[ti][qi]
            collide &= ids_np != qid
            idx = np.flatnonzero(collide)
            if not len(idx):
                continue
            sims = normed[idx] @ qnorm[qi]
            take = min(self.k, len(idx))
            part = np.argpartition(-sims, take - 1)[:take]
            out_q.extend([qid] * take)
            out_n.extend(ids_np[idx][part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def knn_lsh(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 11,
) -> pa.Table:
    """Approximate cosine top-k: search only vectors sharing an LSH
    bucket with the query in any hash table. One streaming scan —
    planes + query buckets broadcast once, per-batch masked scoring,
    partial top-k, tiny driver merge (the knn_bruteforce shape with
    the bucket semi-join as the candidate filter)."""
    qmat, qids = _load_queries(sf_dir, n_queries)
    dim = qmat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    powers = 1 << np.arange(n_bits)
    # Query bucket per (table, query) — computed from the RAW query
    # vector exactly as the corpus side hashes raw vectors.
    qbuckets = np.stack(
        [(qmat @ planes[ti].T > 0) @ powers for ti in range(n_tables)]
    )  # (n_tables, n_queries)
    ref = ray.put((planes, qids, qnorm, qbuckets))

    ds = read_parquet_parallel(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    partials_ds = ds.map_batches(
        LshSearchStage(ref, k), batch_format="pyarrow", batch_size=2048
    )
    tables = collect_table_blocks(partials_ds)
    partials = pa.concat_tables(tables) if tables else None
    return _merge_topk(partials, k)


# --- SemDeDup: semantic (embedding-cluster) deduplication -------------

_SEMDEDUP_CLUSTER_CAP = 2048  # per-cluster members examined; overflow logged


def _semdedup_partition(
    group: pa.Table, threshold: float, cluster_cap: int = _SEMDEDUP_CLUSTER_CAP
) -> pa.Table:
    """One hash partition of cluster-keyed (cluster, vec_id, embedding)
    rows → DROPPED vec_ids under the SemDeDup rule: within each
    cluster, a vector is a semantic duplicate if any LOWER-id vector
    in the same cluster has exact cosine ≥ threshold (keep-the-first,
    deterministic; Abbas et al. 2023 keep one representative per
    in-cluster near-dup group).

    Runs inside a ``hash_exchange`` reducer: clusters are recovered
    vectorized (argsort + run-length boundaries), each cluster's
    similarity matrix is one numpy matmul bounded by
    ``_SEMDEDUP_CLUSTER_CAP`` members (cap² floats ≈ 33 MB). Members
    beyond the cap are kept UNEXAMINED and counted in a sentinel row
    (vec_id = -1, n_skipped = k) so truncation is never silent."""
    clusters = group.column("cluster").to_numpy(zero_copy_only=False)
    ids_np = group.column("vec_id").to_numpy(zero_copy_only=False)
    mat = _embed_matrix(group)
    order = np.argsort(clusters, kind="stable")
    sorted_c = clusters[order]
    boundaries = np.flatnonzero(np.diff(sorted_c)) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(sorted_c)]))
    dropped: list[int] = []
    n_skipped: list[int] = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        member_rows = order[s:e]
        # Deterministic keep-the-first ⇒ examine in ascending vec_id.
        by_id = member_rows[np.argsort(ids_np[member_rows], kind="stable")]
        overflow = max(0, len(by_id) - cluster_cap)
        if overflow:
            n_skipped.append(overflow)
            by_id = by_id[:cluster_cap]
        sub = mat[by_id]
        sub = sub / np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-300)
        sims = sub @ sub.T
        # drop j ⇔ ∃ i<j with cos(i,j) ≥ t: strict upper triangle, any per column.
        dup_mask = np.triu(sims >= threshold, k=1).any(axis=0)
        dropped.extend(ids_np[by_id[dup_mask]].tolist())
    out_id = dropped + [-1] * len(n_skipped)
    out_skip = [0] * len(dropped) + n_skipped
    return pa.table(
        {
            "vec_id": pa.array(out_id, type=pa.int64()),
            "n_skipped": pa.array(out_skip, type=pa.int64()),
        }
    )


def semantic_dedup_dropped(
    sf_dir: str,
    threshold: float = 0.4,
    n_clusters: int | None = None,
    seed: int = 5,
    cluster_cap: int = _SEMDEDUP_CLUSTER_CAP,
) -> pa.Table:
    """SemDeDup (Abbas et al. 2023) dropped-ids: k-means-cluster the
    embedding space with a bounded-sample coarse quantizer (the
    ``knn_ivf`` quantizer reused), co-locate each cluster in a reducer
    partition via a cluster-keyed hash exchange, and mark in-cluster
    semantic duplicates with EXACT cosine — the pairwise matmul only
    ever spans one cluster, never the corpus (the n×n matrix of
    ``embedding_dedup_pairs`` is exactly what this avoids at 10⁹
    vectors). Approximate: a near-dup pair split across clusters is
    missed ⇒ rows-only driver check; recall vs the exact pair list and
    precision 1.0 (subset of exact-dropped, asserted in pytest).

    Returns the dropped vec_ids ascending (≪ corpus for real data)."""
    import functools

    import pyarrow.parquet as pq

    from website_indexer_ray.state.exchange import hash_exchange

    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    if n_clusters is None:
        n_clusters = max(4, int(np.sqrt(n_rows)))
    centroids = _kmeans(_sample_matrix(sf_dir), n_clusters, seed=seed)
    cent_ref = ray.put(centroids)

    ds = read_parquet_parallel(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = hash_exchange(
        ds.map_batches(
            IvfAssignStage(cent_ref), batch_format="pyarrow", batch_size=2048
        ),
        "cluster",
        functools.partial(
            _semdedup_partition, threshold=threshold, cluster_cap=cluster_cap
        ),
    )
    empty = pa.table({"vec_id": pa.array([], type=pa.int64())})
    if out is None:
        return empty
    import pyarrow.compute as pc

    sentinels = out.filter(pc.equal(out.column("vec_id"), -1))
    if sentinels.num_rows:
        import logging

        logging.getLogger(__name__).warning(
            "semantic_dedup: %d cluster members beyond the %d-member cap "
            "were kept unexamined across %d clusters",
            sum(sentinels.column("n_skipped").to_pylist()),
            cluster_cap,
            sentinels.num_rows,
        )
    dropped = out.filter(pc.greater_equal(out.column("vec_id"), 0)).select(["vec_id"])
    return dropped.take(
        pc.sort_indices(dropped, sort_keys=[("vec_id", "ascending")])
    )


def semantic_dedup_ds(
    sf_dir: str, threshold: float = 0.4, n_clusters: int | None = None, seed: int = 5
) -> "ray.data.Dataset":
    """Dataset-returning form: kept vec_ids as a streaming anti-join —
    the dropped set (≪ corpus) broadcasts once via ``ray.put``, kept
    ids flow out of a ``map_batches`` filter. Consume with
    ``write_parquet`` or feed the next stage; nothing O(corpus) lands
    on the driver (the ``near_dedup_keep_ds`` shape)."""
    dropped_tbl = semantic_dedup_dropped(sf_dir, threshold, n_clusters, seed)
    dropped_ref = ray.put(dropped_tbl.column("vec_id").to_numpy(zero_copy_only=False))
    ds = read_parquet_parallel(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])

    def keep(batch: pa.Table) -> pa.Table:
        dropped = cached_get(dropped_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, dropped, assume_unique=False)
        return pa.table({"vec_id": pa.array(ids[mask], type=pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow")


def semantic_dedup(
    sf_dir: str, threshold: float = 0.4, n_clusters: int | None = None, seed: int = 5
) -> pa.Table:
    """The applied form — the kept vec_id list a training-data pipeline
    feeds downstream. The driver-query contract wants a table, so the
    streamed kept ids are collected at the end; production pipelines
    use ``semantic_dedup_ds`` and sink it instead."""
    import pyarrow.compute as pc

    tables = collect_table_blocks(
        semantic_dedup_ds(sf_dir, threshold, n_clusters, seed)
    )
    if not tables:
        return pa.table({"vec_id": pa.array([], type=pa.int64())})
    tbl = pa.concat_tables(tables)
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("vec_id", "ascending")]))


def semantic_dedup_write(
    sf_dir: str,
    out_dir: str,
    threshold: float = 0.4,
    n_clusters: int | None = None,
    seed: int = 5,
) -> None:
    """Sink form of semantic dedup: kept vec_ids stream to a committed
    parquet dir (resume = skip committed); nothing O(corpus) on the
    driver."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(
        semantic_dedup_ds(sf_dir, threshold, n_clusters, seed), out_dir
    )
