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

    def test_concurrent_exchanges_serialize_cleanly(self, ray_session):
        """Two exchanges racing on the shared pool must not interleave
        chunks — the pool lock serializes them; both results exact."""
        import threading

        results = {}

        def run(name, n):
            results[name] = hash_exchange(
                make_ds(n), "k", lambda t: t, n_reducers=4
            ).num_rows

        t1 = threading.Thread(target=run, args=("a", 3000))
        t2 = threading.Thread(target=run, args=("b", 1200))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert results == {"a": 3000, "b": 1200}
