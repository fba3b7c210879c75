"""Small shared helpers for sizing Ray Data stages to the cluster.

``read_parquet_parallel``
fixes the small-file degenerate case: one small parquet file yields
ONE block, which serializes every downstream map_batches no matter the
concurrency; at test/bench scale we override the block count so the
actor pool actually fans out. Big inputs (the 100 TB path) keep Ray's
native block planning — many files/row-groups already give ample
blocks, and overriding would fight the streaming executor.
"""

from __future__ import annotations

import glob
import os

import ray
import ray.data

_SMALL_INPUT_BYTES = 256 << 20  # only override blocks below 256 MB


_BROADCAST_CACHE: dict = {}


def agg_named(tbl, keys, aggs, out_names):
    """``tbl.group_by(keys).aggregate(aggs)`` with NAME-based output
    selection: pyarrow's key/aggregate column ordering is not
    contractual across releases, so positional ``rename_columns`` on
    the result can silently swap key and value columns. Select the
    generated names (``{col}_{fn}``, keys as-is) explicitly, then
    rename to ``out_names`` in that order."""
    g = tbl.group_by(keys).aggregate(aggs)
    keys = [keys] if isinstance(keys, str) else list(keys)
    gen = keys + [f"{c}_{f}" if c else f for c, f in aggs]
    return g.select(gen).rename_columns(out_names)


def hash_strings64(arr) -> "np.ndarray":
    """Vectorized 63-bit hash of an Arrow string array: one numpy pass
    over the array's offsets/data buffers — no per-row Python calls.

    Polynomial hash (byte+1)·P^pos summed per string in uint64 modular
    arithmetic, length folded in, splitmix64 finalizer.  Used for
    ROUTING keys only (exchange partitioning); every consumer compares
    the underlying strings exactly, so the only contract is
    determinism + uniformity, not any external hash identity.  Nulls
    hash like empty strings."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if not n:
        return np.empty(0, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    starts, ends = offsets[:-1], offsets[1:]
    lens = ends - starts
    h = np.zeros(n, dtype=np.uint64)
    nonempty = lens > 0
    if nonempty.any():
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        lo, hi = int(starts[nonempty][0]), int(ends[nonempty][-1])
        seg = data[lo:hi].astype(np.uint64)
        # byte positions within their string (strings are contiguous in
        # the data buffer; empty strings occupy zero bytes)
        pos = np.arange(lo, hi, dtype=np.int64) - np.repeat(starts, lens)
        P = np.uint64(0x100000001B3)
        # pows[i] = P^i mod 2^64: accumulate over [1, P, P, ...] wraps
        # correctly in uint64 (dividing a wrapped accumulate by P would
        # NOT recover P^i once P^{i+1} exceeds 2^64)
        pows = np.full(int(lens.max()), P, dtype=np.uint64)
        pows[0] = 1
        np.multiply.accumulate(pows, out=pows)
        terms = (seg + np.uint64(1)) * pows[pos]
        # reduceat over non-empty string starts; empties contribute no
        # bytes, so consecutive non-empty boundaries partition `terms`
        bounds = (starts[nonempty] - lo).astype(np.int64)
        h[nonempty] = np.add.reduceat(terms, bounds)
    h = h * np.uint64(0x9E3779B97F4A7C15) + lens.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def _bundles_to_tables(bundles) -> list:
    import pyarrow as pa
    import ray

    refs = [r for b in bundles for r in b.block_refs]
    out = []
    for blk in ray.get(refs):  # one parallel zero-copy fetch
        if not isinstance(blk, pa.Table):  # rare pandas-block tail
            blk = pa.Table.from_pandas(blk, preserve_index=False)
        if blk.num_rows:
            out.append(blk)
    return out


def collect_table_blocks(ds) -> list:
    """A Dataset's blocks as a list of NON-EMPTY Arrow tables via ONE
    execution of the plan (``iter_internal_ref_bundles`` + a single
    parallel ``ray.get``).  The tempting alternative —
    ``ray.get(list(ds.to_arrow_refs()))`` — re-executes a lazy
    pipeline end to end: to_arrow_refs drains the ref-bundle iterator,
    then calls ``schema(fetch_if_missing=True)``, and a streamed lazy
    Dataset caches nothing, so the schema fetch runs the plan a
    SECOND time (measured 2x wall on the grouped aggregates; the same
    trap applies to any schema()/count()/iter after a consumption).
    Only collect small results this way; big outputs take the
    ``_write`` sink forms."""
    return _bundles_to_tables(ds.iter_internal_ref_bundles())


def collect_table(ds) -> "object":
    """:func:`collect_table_blocks` concatenated into one Arrow table,
    preserving the schema when every block is empty (the bundles carry
    it — no extra ``ds.schema()`` pass, which would re-execute)."""
    import pyarrow as pa

    bundles = list(ds.iter_internal_ref_bundles())
    tables = _bundles_to_tables(bundles)
    if tables:
        return pa.concat_tables(
            [t.combine_chunks() for t in tables]
        ).combine_chunks()
    schema = next(
        (b.schema for b in bundles if b.schema is not None), None
    )
    if not isinstance(schema, pa.Schema):
        schema = pa.schema([])
    return schema.empty_table()


def committed_parquet_write(ds, out_dir: str) -> bool:
    """Write a Dataset to ``out_dir`` under the engine's commit
    protocol: skip if ``_SUCCESS`` exists (resume), clear stale
    parquet files from a crashed earlier attempt (Ray's write_parquet
    APPENDS new UUID-named files — a dirty dir would otherwise
    double-count rows), write, then commit the manifest. Returns True
    when the write ran, False when the committed dir was reused."""
    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success):
        return False
    os.makedirs(out_dir, exist_ok=True)
    for stale in glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                           recursive=True):
        os.remove(stale)
    ds.write_parquet(out_dir)
    open(success, "w").close()
    return True


def cached_get(ref):
    """ray.get with a per-worker-process cache: Ray reuses worker
    processes across tasks/jobs, so a broadcast object (query matrix,
    lookup dict) is deserialized once per worker even when the stage
    runs as plain tasks instead of an actor pool."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def cluster_cpus(default: int = 4) -> int:
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


_CLUSTER_CPUS_CACHE: dict = {}


def cluster_cpus_cached(default: int = 4) -> int:
    """``cluster_cpus`` memoized per process: the cluster size is
    fixed for an engine run / bench window, so the
    ``ray.cluster_resources()`` RPC needn't repeat on every
    per-generation ``write_parquet`` call.  Only caches once Ray is
    initialized (an early call would otherwise pin the default)."""
    if "v" not in _CLUSTER_CPUS_CACHE:
        if not ray.is_initialized():
            return default
        _CLUSTER_CPUS_CACHE["v"] = cluster_cpus(default)
    return _CLUSTER_CPUS_CACHE["v"]


def read_parquet_parallel(path: str, columns=None, **kw):
    files = glob.glob(path) if "*" in path else [path]
    try:
        total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
    except OSError:
        total = _SMALL_INPUT_BYTES
    if total < _SMALL_INPUT_BYTES:
        kw.setdefault("override_num_blocks", min(32, max(8, cluster_cpus())))
    return ray.data.read_parquet(path, columns=columns, **kw)


@ray.remote
def _shard_map_task(in_file: str, fn, shard_dir: str) -> int:
    """Process ONE input shard to its own committed output dir.
    Batch-wise over row groups so a shard never fully materializes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(in_file)
    os.makedirs(shard_dir, exist_ok=True)
    for stale in glob.glob(os.path.join(shard_dir, "*.parquet")):
        os.remove(stale)
    out_path = os.path.join(shard_dir, "part-00000.parquet")
    writer = None
    n = 0
    try:
        for batch in pf.iter_batches():
            out = fn(pa.Table.from_batches([batch]))
            if writer is None:
                writer = pq.ParquetWriter(out_path, out.schema)
            writer.write_table(out)
            n += out.num_rows
    finally:
        if writer is not None:
            writer.close()
    # an empty input shard commits with no part file — a zero-column
    # parquet would break schema-uniform reads of the output glob
    open(os.path.join(shard_dir, "_SUCCESS"), "w").close()
    return n


def sharded_map_write(in_path: str, fn, out_dir: str) -> dict:
    """Map-only write with PER-INPUT-SHARD resume: each input parquet
    file becomes one output directory (``shard-<stem>/``) holding its
    own ``_SUCCESS``; a rerun skips every committed shard and recomputes
    only the missing ones. This is the mid-dataset-resume granularity a
    100-TB ingest needs — the whole-stage ``committed_parquet_write``
    protocol restarts a stage from scratch if its single manifest is
    missing.

    Deliberately raw Ray tasks, not a Dataset pipeline: per-shard
    commit units must align exactly with input files, a boundary the
    Dataset block planner does not guarantee to preserve. Each task
    streams its shard row-group-by-row-group, so worker memory is
    bounded by one row group × task count.

    Returns ``{"shards": total, "skipped": already_committed}``.
    """
    files = (
        sorted(glob.glob(os.path.join(in_path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(in_path)
        else [in_path]
    )
    os.makedirs(out_dir, exist_ok=True)
    futs, skipped = [], 0
    root = in_path if os.path.isdir(in_path) else os.path.dirname(in_path)
    for f in files:
        # shard name = sanitized relative path (basenames alone can
        # collide across subdirectories)
        rel = os.path.relpath(f, root)
        stem = os.path.splitext(rel)[0].replace(os.sep, "__")
        shard_dir = os.path.join(out_dir, f"shard-{stem}")
        if os.path.exists(os.path.join(shard_dir, "_SUCCESS")):
            skipped += 1
            continue
        futs.append(_shard_map_task.remote(f, fn, shard_dir))
    ray.get(futs)
    return {"shards": len(files), "skipped": skipped}
