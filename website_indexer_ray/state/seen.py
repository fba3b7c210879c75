"""Sharded URL-seen set: cuckoo-filter actors with exact arbitration.

Replaces the reference's ``requested_urls`` Python-list membership
scans (/root/reference/crawler/wpull/plugin.py:81-82,104-106,212-217)
and wpull's SQLite URLTable with a pool of ``SeenShard`` actors.
Routing key: ``url_hash % n_shards`` (url_hash = xxh64 of the
canonical URL). Claims are atomic per shard (actor method calls are
serialized), which gives exactly-once fetch semantics across
concurrently-running ``map_batches`` workers without any shuffle —
this is the distributed form of the reference's unique ``(crawl,url)``
constraint (crawler/models.py:77-79).

The cuckoo filter is the compact fast path; an exact Python set
arbitrates false positives and feeds checkpoint snapshots
(FIXTURES.md gold_seen equality requires the exact set).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from website_indexer_ray.schemas import SEEN_SCHEMA
from website_indexer_ray.state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0.1)
class SeenShard:
    """One shard of the URL-seen set."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.exact: set[str] = set()
        self.hashes: dict[str, int] = {}
        # sorted seen-hash array for the vectorized offer prefilter;
        # rebuilt lazily after any exact-set mutation (mutations happen
        # at generation barriers, offers storm between them, so the
        # rebuild is once per generation, not per chunk)
        self._seen_sorted = None

    def _seen_hash_array(self):
        import numpy as np

        if self._seen_sorted is None:
            # xxh64 hashes are full unsigned 64-bit values
            arr = np.fromiter(
                self.hashes.values(), dtype=np.uint64, count=len(self.hashes)
            )
            arr.sort()
            self._seen_sorted = arr
        return self._seen_sorted

    @staticmethod
    def _dedup_min_key(tbl):
        """Min-(depth, parent_url, method) row per url, Arrow-native:
        one sort + a keep-first-of-run mask (no pandas round trip)."""
        import numpy as np
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            tbl,
            sort_keys=[
                ("url", "ascending"),
                ("depth", "ascending"),
                ("parent_url", "ascending"),
                ("method", "ascending"),
            ],
        )
        s = tbl.take(idx)
        u = s.column("url").combine_chunks()
        n = len(u)
        if n <= 1:
            return s
        first = np.ones(n, dtype=bool)
        first[1:] = pc.not_equal(
            u.slice(1), u.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
        return s.filter(pa.array(first))

    def _filter_unseen(self, tbl):
        """Drop rows whose url is in the exact seen set — vectorized:
        np.searchsorted against the cached sorted seen-hash array
        (O(chunk·log seen), no O(seen) table rebuilt per chunk), with
        hash hits confirmed against the exact set so a colliding
        unseen URL is never lost."""
        import numpy as np
        import pyarrow.compute as pc

        seen = self._seen_hash_array()
        if not len(seen) or not tbl.num_rows:
            return tbl
        h = tbl.column("url_hash").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        pos = np.searchsorted(seen, h)
        pos_c = np.minimum(pos, len(seen) - 1)
        hit = seen[pos_c] == h
        if not hit.any():
            return tbl
        # confirm: hash membership is necessary, not sufficient
        hit_idx = np.flatnonzero(hit)
        urls = tbl.column("url").take(pa.array(hit_idx)).to_pylist()
        exact = self.exact
        confirmed = np.fromiter(
            (u in exact for u in urls), dtype=bool, count=len(urls)
        )
        keep = np.ones(tbl.num_rows, dtype=bool)
        keep[hit_idx[confirmed]] = False
        return tbl.filter(pa.array(keep))

    def offer(self, tbl) -> int:
        """Accumulate a candidate-row Arrow table for this generation.

        Shards double as hash-partition reducers: concurrent
        ``map_batches`` workers route candidate rows here by
        ``url_hash % n_shards``. The incoming chunk is filtered against
        the exact seen set (sorted-hash searchsorted prefilter +
        exact-set confirmation of hits) and min-key-deduped, all on
        Arrow/numpy — no pandas round trip and no per-row Python on
        the miss path; per URL the canonical min-(depth, parent_url,
        method) row wins, finalized across chunks at the resolve
        barrier, so within-generation duplicate resolution is
        deterministic WITHOUT a groupby shuffle.
        """
        chunks = getattr(self, "pending_chunks", None)
        if chunks is None:
            chunks = self.pending_chunks = []
        if hasattr(tbl, "sort_values"):  # pandas guard (tests)
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        if "method" not in tbl.schema.names:
            tbl = tbl.append_column(
                "method", pa.array(["GET"] * tbl.num_rows, type=pa.string())
            )
        tbl = self._filter_unseen(tbl)
        tbl = self._dedup_min_key(tbl)
        if tbl.num_rows:
            chunks.append(tbl)
            pending = sum(c.num_rows for c in chunks)
            if pending > getattr(self, "_pending_peak_rows", 0):
                self._pending_peak_rows = pending
        return tbl.num_rows

    def state_stats(self) -> dict:
        """Stress-evidence counters: exact-set size + estimated bytes,
        peak pending rows held between barriers (bounds the shard's
        per-generation memory), cuckoo filter bytes."""
        url_bytes = sum(len(u) for u in self.exact)
        return {
            "shard_id": self.shard_id,
            "seen": len(self.exact),
            # set/dict entry ≈ url bytes + 64B set slot + 80B dict slot
            # + 8B hash value (order-of-magnitude, not exact)
            "exact_mb": round(
                (url_bytes + len(self.exact) * 152) / 1e6, 2
            ),
            "filter_mb": round(self.filter.table.nbytes / 1e6, 2),
            "pending_peak_rows": getattr(self, "_pending_peak_rows", 0),
        }

    def _pending_tbl(self):
        """Merge offer chunks into the final min-key-deduped,
        unseen-only pending Arrow table (sorted by url)."""
        chunks = getattr(self, "pending_chunks", None) or []
        if not chunks:
            return None
        tbl = pa.concat_tables(chunks) if len(chunks) > 1 else chunks[0]
        tbl = self._dedup_min_key(tbl)
        tbl = self._filter_unseen(tbl)
        return tbl if tbl.num_rows else None

    def _pending_df(self):
        tbl = self._pending_tbl()
        return tbl.to_pandas() if tbl is not None else None

    def pending_table(self) -> list[dict]:
        """Driver-side budget path: expose pending candidates."""
        df = self._pending_df()
        return df.to_dict("records") if df is not None else []

    def pending_topk(self, k: int, priority_host: str | None = None) -> list[dict]:
        """First ``k`` pending candidates in claim order — the
        budgeted-claim path fetches only each shard's budget-sized
        prefix, so the driver never holds more than n_shards x budget
        rows however large the pending set is. Default order is
        canonical sorted-URL; with ``priority_host`` the start host's
        URLs rank first (the same-domain priority frontier) — the
        shard prefix must use the driver's merge order or the k-way
        merge would starve priority rows past the prefix."""
        df = self._pending_df()
        if df is None:
            return []
        if priority_host is not None:
            df = (
                df.assign(_ext=df["host"] != priority_host)
                .sort_values(["_ext", "url"], kind="mergesort")
                .drop(columns="_ext")
            )
        return df.head(k).to_dict("records")

    def clear_pending(self) -> None:
        self.pending_chunks = []

    def pending_count(self) -> int:
        return sum(len(c) for c in getattr(self, "pending_chunks", None) or [])

    # --- fused-expansion lineage counts ------------------------------
    # When frontier expansion runs inside the fetch stage
    # (cfg.fused_expand), each fetch task reports its pre-predicate
    # candidate counts per seed_batch here; the engine drains them at
    # the next generation barrier to build the lineage row the
    # checkpoint-reading phase A used to compute.
    def add_cand_counts(self, counts: dict) -> None:
        acc = getattr(self, "cand_counts", None)
        if acc is None:
            acc = self.cand_counts = {}
        for k, v in counts.items():
            acc[k] = acc.get(k, 0) + v

    def take_cand_counts(self) -> dict:
        out = getattr(self, "cand_counts", None) or {}
        self.cand_counts = {}
        return out

    def resolve(self, schema):
        """Claim every pending unseen URL; returns the winners as an
        Arrow table (possibly empty) of the given schema. Atomic per
        shard; called once per generation at the barrier — the shard's
        return ref feeds ``ray.data.from_arrow_refs`` directly, so
        winner rows never pass through the driver."""
        tbl = self._pending_tbl()
        self.pending_chunks = []
        if tbl is None:
            return schema.empty_table()
        for u, h in zip(
            tbl.column("url").to_pylist(), tbl.column("url_hash").to_pylist()
        ):
            h = int(h)
            self.filter.insert(h)
            self.exact.add(u)
            self.hashes[u] = h
        self._seen_sorted = None
        return tbl.select(schema.names).cast(schema)

    def resolve_chunks(self, schema, n_chunks: int):
        """``resolve`` with the winners pre-split into ``n_chunks``
        tables — called with ``.options(num_returns=n_chunks)`` so each
        chunk is its own object ref. ``from_arrow_refs`` then starts
        with n_shards x n_chunks blocks and the fetch stage needs no
        repartition pass to fan out."""
        tbl = self.resolve(schema)
        if n_chunks <= 1:
            return tbl
        per = max(1, -(-tbl.num_rows // n_chunks))
        return tuple(tbl.slice(i * per, per) for i in range(n_chunks))

    def claim(self, urls: list[str], hashes: list[int]) -> list[bool]:
        """For each URL: True if this call newly claimed it (it was
        unseen), False if it was already seen. Atomic per shard."""
        out = []
        for u, h in zip(urls, hashes):
            if self.filter.contains(h) and u in self.exact:
                out.append(False)
            else:
                self.filter.insert(h)
                self.exact.add(u)
                self.hashes[u] = h
                out.append(True)
        self._seen_sorted = None
        return out

    def contains(self, urls: list[str], hashes: list[int]) -> list[bool]:
        return [
            self.filter.contains(h) and u in self.exact
            for u, h in zip(urls, hashes)
        ]

    def remove(self, urls: list[str], hashes: list[int]) -> int:
        """Cuckoo + exact delete — mirrors URLTable.remove_many
        (plugin.py:153-156)."""
        n = 0
        for u, h in zip(urls, hashes):
            if u in self.exact:
                self.exact.discard(u)
                self.hashes.pop(u, None)
                self.filter.delete(h)
                n += 1
        self._seen_sorted = None
        return n

    def count(self) -> int:
        return len(self.exact)

    def snapshot(self, path: str) -> int:
        """Write this shard's exact set as Parquet; returns row count."""
        urls = sorted(self.exact)
        table = pa.Table.from_pydict(
            {"url": urls, "url_hash": [self.hashes[u] for u in urls]},
            schema=SEEN_SCHEMA,
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(table, path)
        return len(urls)

    def restore(self, path: str) -> int:
        table = pq.read_table(path)
        for u, h in zip(
            table.column("url").to_pylist(), table.column("url_hash").to_pylist()
        ):
            if u not in self.exact:
                self.exact.add(u)
                self.hashes[u] = h
                self.filter.insert(h)
        self._seen_sorted = None
        return len(self.exact)

    def dump(self) -> list[str]:
        return sorted(self.exact)


def create_shards(n_shards: int, capacity_per_shard: int = 1 << 16) -> list:
    return [
        SeenShard.remote(i, capacity_per_shard) for i in range(n_shards)
    ]


def route(urls: list[str], hashes: list[int], n_shards: int) -> dict[int, tuple[list[str], list[int], list[int]]]:
    """Group (urls, hashes, original positions) by shard."""
    groups: dict[int, tuple[list[str], list[int], list[int]]] = {}
    for pos, (u, h) in enumerate(zip(urls, hashes)):
        s = h % n_shards
        g = groups.setdefault(s, ([], [], []))
        g[0].append(u)
        g[1].append(h)
        g[2].append(pos)
    return groups


def offer_batch(shards: list, batch) -> int:
    """Route a candidate-row Arrow batch to shards by url_hash —
    vectorized routing, Arrow-table slices through the object store
    (no per-row Python on the send side)."""
    import numpy as np
    import ray as _ray

    if batch.num_rows == 0:
        return 0
    n_shards = len(shards)
    batch = batch.combine_chunks()
    shard_of = (
        batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        % np.uint64(n_shards)
    )
    futures = []
    for s in range(n_shards):
        idx = np.flatnonzero(shard_of == s)
        if len(idx):
            futures.append(shards[s].offer.remote(batch.take(pa.array(idx))))
    return sum(_ray.get(futures))


def take_cand_counts_all(shards: list) -> dict[int, int]:
    """Drain and sum the fused-expansion candidate counts from every
    shard (per-seed_batch, pre-predicate) — the lineage n_candidates
    source when phase A is fused into the fetch stage."""
    total: dict[int, int] = {}
    for d in ray.get([s.take_cand_counts.remote() for s in shards]):
        for k, v in d.items():
            total[k] = total.get(k, 0) + v
    return total


def resolve_all(shards: list, schema, chunks_per_shard: int = 1):
    """Winner-table refs (``chunks_per_shard`` per shard) → feed
    ray.data.from_arrow_refs directly."""
    if chunks_per_shard <= 1:
        return [shard.resolve.remote(schema) for shard in shards]
    refs: list = []
    for shard in shards:
        refs.extend(
            shard.resolve_chunks.options(num_returns=chunks_per_shard).remote(
                schema, chunks_per_shard
            )
        )
    return refs


def claim_batch(shards: list, urls: list[str], hashes: list[int]) -> list[bool]:
    """Claim a batch of URLs across shards; returns per-position mask."""
    groups = route(urls, hashes, len(shards))
    futures = {
        s: shards[s].claim.remote(us, hs) for s, (us, hs, _) in groups.items()
    }
    mask = [False] * len(urls)
    for s, fut in futures.items():
        for pos, claimed in zip(groups[s][2], ray.get(fut)):
            mask[pos] = claimed
    return mask


def contains_batch(shards: list, urls: list[str], hashes: list[int]) -> list[bool]:
    groups = route(urls, hashes, len(shards))
    futures = {
        s: shards[s].contains.remote(us, hs) for s, (us, hs, _) in groups.items()
    }
    mask = [False] * len(urls)
    for s, fut in futures.items():
        for pos, seen in zip(groups[s][2], ray.get(fut)):
            mask[pos] = seen
    return mask


def remove_batch(shards: list, urls: list[str], hashes: list[int]) -> int:
    groups = route(urls, hashes, len(shards))
    futures = [
        shards[s].remove.remote(us, hs) for s, (us, hs, _) in groups.items()
    ]
    return sum(ray.get(futures))


def snapshot_all(shards: list, directory: str) -> int:
    futures = [
        shard.snapshot.remote(os.path.join(directory, f"shard-{i:04d}.parquet"))
        for i, shard in enumerate(shards)
    ]
    return sum(ray.get(futures))


def restore_all(shards: list, directory: str) -> int:
    futures = []
    for i, shard in enumerate(shards):
        path = os.path.join(directory, f"shard-{i:04d}.parquet")
        if os.path.exists(path):
            futures.append(shard.restore.remote(path))
    return sum(ray.get(futures))
