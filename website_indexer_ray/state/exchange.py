"""Actor-reducer hash exchange — keyed repartitioning without a
sort-based shuffle.

The same pattern the crawl engine uses for its seen shards ("shard
actors double as hash-partition reducers"): a pool of ``ReduceShard``
actors stands in for the hash partitions; ``map_batches`` tasks route
each batch's rows to shards by ``key % n_reducers`` (vectorized
slicing, Arrow tables through the object store), and at the barrier
each shard runs the reduce function over its whole co-located
partition and hands back the result as an object ref.

Why not ``Dataset.groupby``: Ray Data's groupby is a sort-based
all-to-all whose fixed cost (~1-2 s per exchange in this sandbox)
dwarfs sub-second reduce work, and its ``map_groups`` pays a Python
call per group — ruinous for millions of near-singleton LSH buckets.
The reducer actors give hash partitioning with one reduce call per
partition; the partition body recovers its groups vectorized
(argsort + run-length boundaries).

Partitioning assumptions (documented per the custom-operator rule):
  - one partition's rows fit a reducer's heap — size ``n_reducers``
    to total key volume (at 100 TB this is hundreds of reducers
    spread across nodes, exactly like the seen shards);
  - the reduce fn must be insensitive to row order within the
    partition (all ours sort internally).
"""

from __future__ import annotations

import threading

import numpy as np
import pyarrow as pa
import ray


@ray.remote(num_cpus=0.25)
class ReduceShard:
    """One hash partition: accumulates routed Arrow chunks, reduces
    once at the barrier. The reduce fn arrives with the finish call so
    one pooled actor serves many different operators."""

    def __init__(self):
        self.chunks: list[pa.Table] = []

    def add(self, tbl: pa.Table) -> int:
        self.chunks.append(tbl)
        return tbl.num_rows

    def finish(self, fn):
        if not self.chunks:
            return None
        tbl = pa.concat_tables(self.chunks).combine_chunks()
        self.chunks = []
        return fn(tbl)

    def reset(self) -> None:
        self.chunks = []


# Reducer pools are cached per (cluster, size): actor spawn is a
# multi-hundred-ms cost that would otherwise recur per operator call.
# One exchange at a time per pool (the lock) — concurrent exchanges
# sharing a pool would interleave their adds.
_POOLS: dict[tuple, list] = {}
_POOL_LOCK = threading.Lock()


def _pool(n_reducers: int) -> list:
    try:
        cluster = ray.get_runtime_context().gcs_address
    except Exception:
        cluster = None
    key = (cluster, n_reducers)
    shards = _POOLS.get(key)
    if shards is None:
        shards = _POOLS[key] = [ReduceShard.remote() for _ in range(n_reducers)]
    return shards


def hash_exchange(ds, key_col: str, fn, n_reducers: int = 8) -> pa.Table | None:
    """Route ``ds`` rows to ``n_reducers`` partitions by
    ``key_col % n_reducers``, apply ``fn`` per whole partition, return
    the concatenated results (None if every partition was empty).

    The routing job streams: map tasks push slices to shards and block
    on the acks (backpressure), so no task holds more than one batch.

    A dead reducer (node loss, OOM kill) fails the exchange once; the
    stale pool is evicted and the exchange re-runs on fresh actors —
    reduce state lives only within one exchange, so the retry is a
    clean replay.
    """
    with _POOL_LOCK:
        try:
            return _hash_exchange_locked(ds, key_col, fn, n_reducers)
        except Exception as exc:
            if not _is_actor_death(exc):
                raise
            _evict_pool(n_reducers)
            return _hash_exchange_locked(ds, key_col, fn, n_reducers)


def _is_actor_death(exc: BaseException) -> bool:
    """Actor loss surfaces as RayActorError directly (driver-side
    calls) or wrapped in RayTaskError when a route task's ack fails."""
    if isinstance(exc, ray.exceptions.RayActorError):
        return True
    name = type(exc).__name__
    if name in ("RayActorError", "ActorDiedError", "ActorUnavailableError"):
        return True
    return "ActorDiedError" in str(exc) or "RayActorError" in str(exc)


def _evict_pool(n_reducers: int) -> None:
    try:
        cluster = ray.get_runtime_context().gcs_address
    except Exception:
        cluster = None
    shards = _POOLS.pop((cluster, n_reducers), None)
    # Kill the survivors too — an evicted pool must release its CPU
    # reservations or the replacement can starve on small clusters.
    for s in shards or []:
        try:
            ray.kill(s)
        except Exception:
            pass


def _hash_exchange_locked(ds, key_col: str, fn, n_reducers: int) -> pa.Table | None:
    shards = _pool(n_reducers)
    ray.get([s.reset.remote() for s in shards])
    R = np.uint64(n_reducers)

    def route(batch: pa.Table) -> pa.Table:
        keys = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        shard_of = keys % R
        futs = []
        for s in range(n_reducers):
            idx = np.flatnonzero(shard_of == s)
            if len(idx):
                futs.append(shards[s].add.remote(batch.take(pa.array(idx))))
        ray.get(futs)
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})

    ds.map_batches(route, batch_format="pyarrow").materialize()
    outs = [
        t
        for t in ray.get([s.finish.remote(fn) for s in shards])
        if t is not None and t.num_rows
    ]
    if not outs:
        return None
    return pa.concat_tables(outs).combine_chunks()
