"""Unit tests for the actor-reducer hash exchange
(state/exchange.py): exactly-once routing by key hash, whole-partition
reduce semantics, pool reuse, empty input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from website_indexer_ray.state.exchange import hash_exchange


def make_ds(n: int, blocks: int = 8):
    keys = np.arange(n, dtype=np.int64) * 7919  # spread across partitions
    vals = np.arange(n, dtype=np.int64)
    tbl = pa.table({"k": keys, "v": vals})
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestHashExchange:
    def test_every_row_reaches_exactly_one_partition(self, ray_session):
        n = 10_000

        def ident(t: pa.Table) -> pa.Table:
            # tag with the partition's observed key residues for checks
            return t

        out = hash_exchange(make_ds(n), "k", ident, n_reducers=8)
        assert out.num_rows == n
        assert sorted(out.column("v").to_pylist()) == list(range(n))

    def test_partition_is_whole_key_group(self, ray_session):
        """All rows of one key land in ONE reduce call: summing per key
        inside partitions equals the global per-key sum."""
        n = 5_000
        keys = np.arange(n, dtype=np.int64) % 97  # 97 hot keys
        tbl = pa.table({"k": keys, "v": np.ones(n, dtype=np.int64)})
        ds = ray.data.from_arrow(tbl).repartition(16)

        def per_key_sum(t: pa.Table) -> pa.Table:
            return (
                t.group_by("k").aggregate([("v", "sum")])
                .rename_columns(["k", "v"])
            )

        out = hash_exchange(ds, "k", per_key_sum, n_reducers=8)
        # one output row per key => no key was split across partitions
        assert out.num_rows == 97
        assert set(out.column("v").to_pylist()) == {n // 97, n // 97 + 1}

    def test_empty_input_returns_none(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array([], type=pa.int64())})
        )
        assert hash_exchange(ds, "k", lambda t: t) is None

    def test_pool_reuse_isolated_between_calls(self, ray_session):
        a = hash_exchange(make_ds(100), "k", lambda t: t, n_reducers=4)
        b = hash_exchange(make_ds(50), "k", lambda t: t, n_reducers=4)
        assert a.num_rows == 100
        assert b.num_rows == 50  # no chunks leaked from the prior call

    def test_dead_reducer_retries_on_fresh_pool(self, ray_session):
        """Kill a pooled reducer, then exchange: the first attempt
        fails on the dead actor, the pool is evicted, and the retry
        completes on fresh actors."""
        import ray as _ray

        from website_indexer_ray.state.exchange import _pool

        shards = _pool(4)
        _ray.kill(shards[0])
        out = hash_exchange(make_ds(1000), "k", lambda t: t, n_reducers=4)
        assert out.num_rows == 1000

    def test_concurrent_exchanges_overlap_on_distinct_pools(self, ray_session):
        """Two exchanges running at the same time lease DISTINCT pools
        (no interleaved adds, no serialization): both results exact,
        and while both are in flight the free list for this size is
        empty — each holds its own lease."""
        import threading
        import time

        from website_indexer_ray.state import exchange as ex

        def slow_ident(t: pa.Table) -> pa.Table:
            time.sleep(0.3)
            return t

        results = {}
        leased: dict[str, int] = {}
        real_lease = ex._lease

        def spy_lease(n):
            pool = real_lease(n)
            leased[threading.current_thread().name] = id(pool)
            return pool

        ex._lease = spy_lease
        try:
            def run(name, n):
                results[name] = hash_exchange(
                    make_ds(n), "k", slow_ident, n_reducers=4
                ).num_rows

            t1 = threading.Thread(target=run, args=("a", 3000), name="ta")
            t2 = threading.Thread(target=run, args=("b", 1200), name="tb")
            t1.start(); t2.start(); t1.join(); t2.join()
        finally:
            ex._lease = real_lease
        assert results == {"a": 3000, "b": 1200}
        # the two in-flight exchanges held DISTINCT pools (a serialized
        # pair would have reused one object from the free list)
        assert leased["ta"] != leased["tb"]

    def test_route_tasks_never_retry(self, ray_session):
        """The routing map_batches must run with max_retries=0 /
        retry_exceptions=False — a re-executed route task would
        double-add its batches into the reducers."""
        captured = {}
        import website_indexer_ray.state.exchange as ex

        class SpyDs:
            def __init__(self, ds):
                self.ds = ds

            def map_batches(self, fn, **kw):
                captured.update(kw)
                return self.ds.map_batches(fn, **kw)

        out = hash_exchange(SpyDs(make_ds(500)), "k", lambda t: t, n_reducers=4)
        assert out.num_rows == 500
        assert captured.get("max_retries") == 0
        assert captured.get("retry_exceptions") is False

    def test_reduce_fn_failure_replays_once_then_raises(self, ray_session):
        """A failing attempt discards the leased pool and replays the
        exchange once from scratch; a deterministic fn error therefore
        surfaces after exactly two attempts, and the broken pool is
        not returned to the free list."""
        def flaky(t: pa.Table) -> pa.Table:
            # runs inside a reducer actor: count attempts via a file
            import os
            import tempfile

            marker = os.path.join(tempfile.gettempdir(), "wir_flaky_marker")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("transient")
            return t

        import os
        import tempfile

        marker = os.path.join(tempfile.gettempdir(), "wir_flaky_marker")
        if os.path.exists(marker):
            os.remove(marker)
        try:
            out = hash_exchange(make_ds(800), "k", flaky, n_reducers=4)
            assert out.num_rows == 800
        finally:
            if os.path.exists(marker):
                os.remove(marker)

    def test_peak_bytes_instrumentation(self, ray_session):
        """Reducers track their accumulated-partition high-water mark
        (the scale-stress evidence for 'one partition fits a reducer
        heap'); peaks survive finish/reset until reset_peak."""
        import ray as _ray

        from website_indexer_ray.state.exchange import _pool

        shards = _pool(4)
        _ray.get([s.reset_peak.remote() for s in shards])
        out = hash_exchange(make_ds(5000), "k", lambda t: t, n_reducers=4)
        assert out.num_rows == 5000
        peaks = _ray.get([s.peak_bytes.remote() for s in _pool(4)])
        assert sum(peaks) > 0
        # all 5000 16-byte rows passed through the four partitions
        assert sum(peaks) >= 5000 * 16

    def test_sink_dir_writes_partitioned_parquet(self, ray_session, tmp_path):
        """sink_dir form: one parquet file per non-empty partition,
        nothing returned to the driver; files re-read equal the
        table-returning form."""
        import pyarrow.parquet as pq

        def per_key_sum(t: pa.Table) -> pa.Table:
            return (
                t.group_by("k").aggregate([("v", "sum")])
                .rename_columns(["k", "v"])
            )

        tbl = hash_exchange(make_ds(2000), "k", per_key_sum, n_reducers=4)
        out = hash_exchange(
            make_ds(2000), "k", per_key_sum, n_reducers=4,
            sink_dir=str(tmp_path / "sink"),
        )
        assert out is None
        files = sorted((tmp_path / "sink").glob("part-*.parquet"))
        assert files
        got = pa.concat_tables([pq.read_table(f) for f in files])
        assert sorted(got.column("k").to_pylist()) == sorted(
            tbl.column("k").to_pylist()
        )
        assert sorted(got.column("v").to_pylist()) == sorted(
            tbl.column("v").to_pylist()
        )
