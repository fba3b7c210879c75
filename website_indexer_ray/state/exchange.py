"""Actor-reducer hash exchange — keyed repartitioning without a
sort-based shuffle.

The same pattern the crawl engine uses for its seen shards ("shard
actors double as hash-partition reducers"): a pool of ``ReduceShard``
actors stands in for the hash partitions; ``map_batches`` tasks route
each batch's rows to shards by ``key % n_reducers`` (vectorized
slicing, Arrow tables through the object store), and at the barrier
each shard runs the reduce function over its whole co-located
partition and hands back the result as an object ref — or writes it
straight to a partitioned parquet sink (``sink_dir``) so O(corpus)
outputs never concatenate on the driver.

Why not ``Dataset.groupby``: Ray Data's groupby is a sort-based
all-to-all whose fixed cost (~1-2 s per exchange in this sandbox)
dwarfs sub-second reduce work, and its ``map_groups`` pays a Python
call per group — ruinous for millions of near-singleton LSH buckets.
The reducer actors give hash partitioning with one reduce call per
partition; the partition body recovers its groups vectorized
(argsort + run-length boundaries).

Exactly-once accumulation: ``ReduceShard.add`` is a side effect, so a
re-executed route task would double-count. Route tasks therefore run
with ``max_retries=0`` / ``retry_exceptions=False`` — Ray never
re-executes one (neither on worker crash nor for lineage
reconstruction). ANY failure inside an exchange (route task death,
reducer actor death, reduce-fn error) instead fails the whole attempt;
the leased pool is killed and the exchange replays once on fresh
actors. Reduce state lives only within one attempt, so the replay is
a clean, deterministic re-run.

Concurrency: exchanges lease a reducer pool from a per-(cluster,size)
free list — two operators exchanging at the same time get distinct
pools and overlap; the lock only guards the free-list push/pop. Pools
are cached because actor spawn is a multi-hundred-ms cost that would
otherwise recur per operator call.

Partitioning assumptions (documented per the custom-operator rule):
  - one partition's rows fit a reducer's heap — size ``n_reducers``
    to total key volume (at 100 TB this is hundreds of reducers
    spread across nodes, exactly like the seen shards);
  - the reduce fn must be insensitive to row order within the
    partition (all ours sort internally).
"""

from __future__ import annotations

import os
import threading

import numpy as np
import pyarrow as pa
import ray


@ray.remote(num_cpus=0, scheduling_strategy="SPREAD")
class ReduceShard:
    """One hash partition: accumulates routed Arrow chunks, reduces
    once at the barrier. The reduce fn arrives with the finish call so
    one pooled actor serves many different operators.

    num_cpus=0 on purpose: a shard is a memory-bound accumulator whose
    compute burst (the reduce) happens at the barrier AFTER the route
    tasks drain, so a standing CPU reservation buys nothing — and a
    burst of concurrently-leased pools holding reservations can starve
    the routing map_batches of schedulable CPUs (observed deadlock on
    small nodes). SPREAD places shards across nodes, which is the
    placement the reservation was approximating anyway."""

    def __init__(self):
        self.chunks: list[pa.Table] = []
        self._bytes = 0
        self._peak = 0  # max accumulated partition bytes (survives reset)

    def add(self, tbl: pa.Table) -> int:
        self.chunks.append(tbl)
        self._bytes += tbl.nbytes
        if self._bytes > self._peak:
            self._peak = self._bytes
        return tbl.num_rows

    def finish(self, fn):
        if not self.chunks:
            return None
        tbl = pa.concat_tables(self.chunks).combine_chunks()
        self.chunks = []
        self._bytes = 0
        return fn(tbl)

    def peak_bytes(self) -> int:
        """High-water mark of accumulated partition bytes — the
        number that must fit a reducer's heap (scale-stress evidence;
        scripts/stress_exchange.py)."""
        return self._peak

    def reset_peak(self) -> None:
        self._peak = 0

    def finish_to_parquet(self, fn, path: str) -> int:
        """Reduce and write this partition's result to ``path`` —
        the sink form for O(corpus)-row outputs: each partition lands
        as its own file (resumable, never a driver concat). Returns
        rows written (0 ⇒ no file)."""
        out = self.finish(fn)
        if out is None or not out.num_rows:
            return 0
        import pyarrow.parquet as pq

        pq.write_table(out, path)
        return out.num_rows

    def reset(self) -> None:
        self.chunks = []
        self._bytes = 0


# Free pools per (cluster, size). An exchange POPS a pool (lease),
# uses it exclusively, and pushes it back when done — concurrent
# exchanges overlap on distinct pools. The lock guards only the
# push/pop, never an exchange's runtime.
_FREE: dict[tuple, list[list]] = {}
_LOCK = threading.Lock()


def _cluster():
    try:
        return ray.get_runtime_context().gcs_address
    except Exception:
        return None


def _spawn(n_reducers: int) -> list:
    return [ReduceShard.remote() for _ in range(n_reducers)]


def _pool(n_reducers: int) -> list:
    """Warm path: ensure a free pool of this size exists and return
    its actor handles WITHOUT leasing it (bench warmup, tests)."""
    key = (_cluster(), n_reducers)
    with _LOCK:
        pools = _FREE.setdefault(key, [])
        if not pools:
            pools.append(_spawn(n_reducers))
        return list(pools[-1])


def _lease(n_reducers: int) -> list:
    key = (_cluster(), n_reducers)
    with _LOCK:
        pools = _FREE.get(key)
        if pools:
            return pools.pop()
    return _spawn(n_reducers)


def _release(shards: list, n_reducers: int) -> None:
    """Return a lease. At most ONE pool per size stays cached — the
    steady-state CPU reservation equals the pre-lease design; extra
    pools spawned for a concurrency burst are torn down so cached
    actors can never starve task scheduling of its CPUs."""
    with _LOCK:
        pools = _FREE.setdefault((_cluster(), n_reducers), [])
        if pools:
            cache = False
        else:
            pools.append(shards)
            cache = True
    if not cache:
        _kill(shards)


def _kill(shards: list) -> None:
    for s in shards:
        try:
            ray.kill(s)
        except Exception:
            pass


def hash_exchange(
    ds, key_col: str, fn, n_reducers: int = 8, sink_dir: str | None = None
) -> pa.Table | None:
    """Route ``ds`` rows to ``n_reducers`` partitions by
    ``key_col % n_reducers``, apply ``fn`` per whole partition, and
    either return the concatenated results (None if every partition
    was empty) or, with ``sink_dir``, write one parquet file per
    non-empty partition and return None.

    The routing job streams: map tasks push slices to shards and block
    on the acks (backpressure), so no task holds more than one batch.
    Route tasks are never retried (exactly-once adds); any failure
    replays the whole exchange once on a fresh pool.
    """
    shards = _lease(n_reducers)
    try:
        out = _run_exchange(ds, shards, key_col, fn, n_reducers, sink_dir)
    except Exception:
        # The attempt may have left partial adds (or dead actors)
        # behind — discard the pool and replay once, clean.
        _kill(shards)
        shards = _spawn(n_reducers)
        try:
            out = _run_exchange(ds, shards, key_col, fn, n_reducers, sink_dir)
        except Exception:
            _kill(shards)
            raise
    _release(shards, n_reducers)
    return out


def _run_exchange(
    ds, shards: list, key_col: str, fn, n_reducers: int, sink_dir: str | None
) -> pa.Table | None:
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

    # max_retries=0: ReduceShard.add is a side effect — a re-executed
    # route task would double-add its batches. Failures bubble up and
    # the caller replays the whole exchange instead.
    ds.map_batches(
        route,
        batch_format="pyarrow",
        max_retries=0,
        retry_exceptions=False,
    ).materialize()
    if sink_dir is not None:
        os.makedirs(sink_dir, exist_ok=True)
        # An exchange is all-or-nothing: clear stale part files (and
        # any stale manifest) from a previous attempt — a prior run
        # with a different reducer count would otherwise leave orphan
        # partitions mixed in.
        import glob as _glob

        success = os.path.join(sink_dir, "_SUCCESS")
        if os.path.exists(success):
            os.remove(success)
        for stale in _glob.glob(os.path.join(sink_dir, "part-*.parquet")):
            os.remove(stale)
        ray.get(
            [
                s.finish_to_parquet.remote(
                    fn, os.path.join(sink_dir, f"part-{i:05d}.parquet")
                )
                for i, s in enumerate(shards)
            ]
        )
        # Commit manifest — the same protocol as the crawl generation
        # checkpoints: readers/resumers treat the dir as complete only
        # when _SUCCESS exists.
        with open(success, "w") as f:
            f.write("")
        return None
    outs = [
        t
        for t in ray.get([s.finish.remote(fn) for s in shards])
        if t is not None and t.num_rows
    ]
    if not outs:
        return None
    return pa.concat_tables(outs).combine_chunks()


def sink_committed(sink_dir: str) -> bool:
    """True iff a previous ``hash_exchange(..., sink_dir=)`` completed
    here — multi-stage write pipelines use this to skip finished
    exchanges on resume."""
    return os.path.exists(os.path.join(sink_dir, "_SUCCESS"))
