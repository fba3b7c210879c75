"""Unit tests for stateful components: cuckoo filter, seen shards,
politeness, robots cache."""

import pytest

from website_indexer_ray.functions.xxh import xxh64
from website_indexer_ray.state.cuckoo import CuckooFilter
from website_indexer_ray.state.politeness import HostRateLimiter
from website_indexer_ray.state.robots import RobotsCache


class TestCuckooFilter:
    def test_insert_contains(self):
        f = CuckooFilter(1000)
        hashes = [xxh64(f"https://x.example/{i}") for i in range(500)]
        for h in hashes:
            assert f.insert(h)
        for h in hashes:
            assert f.contains(h)

    def test_absent(self):
        f = CuckooFilter(1000)
        for i in range(200):
            f.insert(xxh64(f"in-{i}"))
        false_pos = sum(f.contains(xxh64(f"out-{i}")) for i in range(1000))
        # 16-bit fingerprints ⇒ FP rate well under 1%.
        assert false_pos < 10

    def test_delete(self):
        f = CuckooFilter(100)
        h = xxh64("https://x.example/gone")
        f.insert(h)
        assert f.contains(h)
        assert f.delete(h)
        assert not f.contains(h)
        assert not f.delete(h)

    def test_fill_to_capacity(self):
        f = CuckooFilter(5000)
        ok = sum(f.insert(xxh64(f"u{i}")) for i in range(5000))
        assert ok == 5000


class TestSeenShards:
    def test_claim_contains_remove(self, ray_session):
        from website_indexer_ray.state import seen as seen_state

        shards = seen_state.create_shards(4, 1 << 12)
        urls = [f"https://t.example/p{i}/" for i in range(100)]
        hashes = [xxh64(u) for u in urls]

        mask = seen_state.claim_batch(shards, urls, hashes)
        assert all(mask)
        # second claim: everything already seen
        mask2 = seen_state.claim_batch(shards, urls, hashes)
        assert not any(mask2)
        assert all(seen_state.contains_batch(shards, urls, hashes))

        # duplicates within one batch: exactly one claim wins
        dup = ["https://t.example/dup/"] * 5
        dh = [xxh64(dup[0])] * 5
        m = seen_state.claim_batch(shards, dup, dh)
        assert sum(m) == 1

        # delete (F8 mirror of URLTable.remove_many)
        n = seen_state.remove_batch(shards, urls[:10], hashes[:10])
        assert n == 10
        m3 = seen_state.claim_batch(shards, urls[:10], hashes[:10])
        assert all(m3)

    def test_seen_claim_stage(self, ray_session):
        """SeenClaimStage — the streaming per-batch claim form of the
        anti-join (J5): first batch claims, second batch with the same
        URLs is fully filtered."""
        import pyarrow as pa

        from website_indexer_ray.stages.seen_claim import SeenClaimStage
        from website_indexer_ray.state import seen as seen_state

        shards = seen_state.create_shards(2)
        stage = SeenClaimStage(shards)
        batch = pa.table(
            {
                "url": ["https://a/1", "https://a/2"],
                "url_hash": pa.array([11, 22], type=pa.uint64()),
            }
        )
        first = stage(batch)
        assert first.num_rows == 2
        second = stage(batch)
        assert second.num_rows == 0

    def test_snapshot_restore(self, ray_session, tmp_path):
        from website_indexer_ray.state import seen as seen_state

        shards = seen_state.create_shards(2, 1 << 12)
        urls = [f"https://t.example/s{i}/" for i in range(50)]
        hashes = [xxh64(u) for u in urls]
        seen_state.claim_batch(shards, urls, hashes)
        n = seen_state.snapshot_all(shards, str(tmp_path / "seen"))
        assert n == 50

        fresh = seen_state.create_shards(2, 1 << 12)
        seen_state.restore_all(fresh, str(tmp_path / "seen"))
        assert all(seen_state.contains_batch(fresh, urls, hashes))


class TestPoliteness:
    def test_rate_limiter_spacing(self):
        t = [0.0]
        slept = []

        def clock():
            return t[0]

        def sleep(s):
            slept.append(s)
            t[0] += s

        lim = HostRateLimiter(wait=0.5, clock=clock, sleep=sleep)
        assert lim.acquire("a.example") == 0.0
        d = lim.acquire("a.example")
        assert d == pytest.approx(0.5)
        # different host: no wait
        assert lim.acquire("b.example") == 0.0

    def test_random_wait_range_and_determinism(self):
        t = [0.0]

        def clock():
            return t[0]

        def mk():
            return HostRateLimiter(
                wait=0.5, random_wait=True, seed=1, clock=clock,
                sleep=lambda s: t.__setitem__(0, t[0] + s),
            )

        t[0] = 0.0
        a = mk()
        a.acquire("h")
        d1 = a.acquire("h")
        assert 0.25 <= d1 <= 0.75  # wget --random-wait: factor 0.5-1.5
        t[0] = 0.0
        b = mk()
        b.acquire("h")
        assert b.acquire("h") == d1  # seeded ⇒ deterministic

    def test_zero_wait_no_op(self):
        lim = HostRateLimiter(wait=0.0)
        assert lim.acquire("x") == 0.0

    def test_crawl_delay_override_per_host(self):
        """set_host_wait (robots Crawl-delay): the overridden host
        spaces at max(wait, delay); other hosts keep the base wait;
        a delay SMALLER than the base wait never loosens it."""
        t = [0.0]

        def clock():
            return t[0]

        def sleep(s):
            t[0] += s

        lim = HostRateLimiter(wait=0.5, clock=clock, sleep=sleep)
        lim.set_host_wait("slow.example", 2.0)
        lim.set_host_wait("fast.example", 0.1)  # must NOT loosen
        assert lim.acquire("slow.example") == 0.0
        assert lim.acquire("slow.example") == pytest.approx(2.0)
        assert lim.acquire("fast.example") == 0.0
        assert lim.acquire("fast.example") == pytest.approx(0.5)
        assert lim.acquire("plain.example") == 0.0
        assert lim.acquire("plain.example") == pytest.approx(0.5)

    def test_crawl_delay_applies_at_zero_base_wait(self):
        t = [0.0]
        lim = HostRateLimiter(
            wait=0.0, clock=lambda: t[0],
            sleep=lambda s: t.__setitem__(0, t[0] + s),
        )
        lim.set_host_wait("h", 1.5)
        assert lim.acquire("h") == 0.0
        assert lim.acquire("h") == pytest.approx(1.5)
        assert lim.acquire("other") == 0.0  # no override, no base wait


class TestRobots:
    def test_disallow(self):
        bodies = {
            "https://a.example/robots.txt": "User-agent: *\nDisallow: /private/\n"
        }
        cache = RobotsCache(lambda u: bodies.get(u))
        assert cache.allowed("https://a.example/public/")
        assert not cache.allowed("https://a.example/private/x")
        # missing robots.txt ⇒ allow all
        assert cache.allowed("https://b.example/anything")

    def test_crawl_delay_parsed(self):
        bodies = {
            "https://a.example/robots.txt": (
                "User-agent: *\nCrawl-delay: 2\nDisallow: /private/\n"
            ),
            "https://b.example/robots.txt": "User-agent: *\nAllow: /\n",
        }
        cache = RobotsCache(lambda u: bodies.get(u))
        assert cache.crawl_delay("https://a.example/page") == 2.0
        assert cache.crawl_delay("https://b.example/page") is None
        assert cache.crawl_delay("https://c.example/page") is None  # no robots

    def test_cache_single_fetch(self):
        calls = []

        def fetch(u):
            calls.append(u)
            return "User-agent: *\nAllow: /\n"

        cache = RobotsCache(fetch)
        cache.allowed("https://a.example/1")
        cache.allowed("https://a.example/2")
        assert len(calls) == 1

    def test_shared_store_fetches_once_per_cluster(self, ray_session):
        """Two RobotsCache instances (two fetch actors) sharing one
        RobotsStore: only the FIRST cache's fetch runs; the second
        reads the body from the store — each host's robots.txt is
        requested ~once per crawl, not once per actor. Unavailable
        robots (None body) is also shared, including the allow-all
        default."""
        from website_indexer_ray.state.robots import RobotsStore

        store = RobotsStore.remote()
        calls = []

        def fetch_a(u):
            calls.append(("a", u))
            return "User-agent: *\nDisallow: /private/\n"

        def fetch_b(u):
            calls.append(("b", u))
            return "User-agent: *\nDisallow: /private/\n"

        cache_a = RobotsCache(fetch_a, store=store)
        cache_b = RobotsCache(fetch_b, store=store)
        assert not cache_a.allowed("https://h.example/private/x")
        assert not cache_b.allowed("https://h.example/private/y")
        assert cache_b.allowed("https://h.example/public")
        assert [c[0] for c in calls] == ["a"]  # b never fetched

        # missing robots shared too: one miss, allow-all everywhere
        def fetch_none(u):
            calls.append(("n", u))
            return None

        cache_c = RobotsCache(fetch_none, store=store)
        cache_d = RobotsCache(fetch_none, store=store)
        assert cache_c.allowed("https://bare.example/x")
        assert cache_d.allowed("https://bare.example/y")
        assert [c[0] for c in calls] == ["a", "n"]


class TestHostBudgetReserveN:
    """The batched politeness RPC: one reserve_n call hands out n
    consecutive wait-spaced slots, and later calls continue the same
    schedule — the per-host rate cap holds across batches/actors."""

    def test_slot_spacing_and_continuity(self, ray_session):
        import ray as _ray

        from website_indexer_ray.state.politeness import HostBudget

        b = HostBudget.remote(wait=0.5)
        delays = _ray.get(b.reserve_n.remote("h", 4))
        assert delays[0] == 0.0
        for i, d in enumerate(delays):
            assert abs(d - i * 0.5) < 0.05
        nxt = _ray.get(b.reserve_n.remote("h", 1))[0]
        assert nxt > 1.8  # continues after the 4 reserved slots
        other = _ray.get(b.reserve_n.remote("other-host", 1))[0]
        assert other == 0.0  # budgets are per host

    def test_crawl_delay_override_through_budget(self, ray_session):
        """The salted path: a pushed Crawl-delay re-spaces the host's
        slots globally (every partition of that host sees it)."""
        import ray as _ray

        from website_indexer_ray.state.politeness import HostBudget

        b = HostBudget.remote(wait=0.5)
        _ray.get(b.set_host_wait.remote("slow", 2.0))
        delays = _ray.get(b.reserve_n.remote("slow", 3))
        for i, d in enumerate(delays):
            assert abs(d - i * 2.0) < 0.05
        # other hosts unaffected
        other = _ray.get(b.reserve_n.remote("plain", 2))
        assert abs(other[1] - 0.5) < 0.05

    def test_robots_excluded_rows_consume_no_slots(self, ray_session):
        """Rows the robots check filters out never reach the fetch, so
        they must not be charged politeness slots — otherwise hosts
        with many excluded URLs accumulate phantom next_ok delay that
        permanently over-throttles later batches."""
        import pyarrow as pa
        import ray as _ray

        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.stages.fetch import FetchParseStage
        from website_indexer_ray.state.politeness import HostBudget

        host = "h.example"
        page = "<html><head><title>t</title></head><body></body></html>"
        corpus = {
            f"http://{host}/robots.txt": (
                200, "text/plain", None,
                "User-agent: *\nDisallow: /blocked/\n", 0,
            ),
            f"http://{host}/ok": (200, "text/html", None, page, 0),
        }
        cfg = CrawlConfig(
            start_url=f"http://{host}/", respect_robots=True,
            politeness_wait=0.5,
        )
        budget = HostBudget.remote(wait=0.5)
        stage = FetchParseStage(corpus, cfg, budget_handle=budget)
        rows = [
            dict(
                url=u, host=host, parent_url=None, url_hash=i,
                generation=0, depth=0, seed_batch=0, method="GET",
            )
            for i, u in enumerate(
                [f"http://{host}/ok"]
                + [f"http://{host}/blocked/{j}" for j in range(3)]
            )
        ]
        out = stage(pa.Table.from_pylist(rows))
        types = dict(
            zip(out.column("url").to_pylist(),
                out.column("record_type").to_pylist())
        )
        assert types[f"http://{host}/ok"] == "page"
        assert all(
            t == "robots_excluded" for u, t in types.items() if "/blocked/" in u
        )
        # only ONE slot was consumed: the next reservation starts one
        # wait after the fetched row, not four waits later
        nxt = _ray.get(budget.reserve_n.remote(host, 1))[0]
        assert nxt < 1.0, f"phantom slots charged: next delay {nxt}"

    def test_zero_wait_is_free(self, ray_session):
        import ray as _ray

        from website_indexer_ray.state.politeness import HostBudget

        b = HostBudget.remote(wait=0.0)
        assert _ray.get(b.reserve_n.remote("h", 3)) == [0.0, 0.0, 0.0]
import glob, os
import pyarrow as pa, pyarrow.parquet as pq, pyarrow.compute as pc

def test_sharded_map_write_resume(ray_session, tmp_path):
    from website_indexer_ray.util import sharded_map_write

    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        pq.write_table(
            pa.table({"doc_id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64())}),
            str(src / f"f{i}.parquet"),
        )

    def double(t):
        return t.append_column("twice", pc.multiply(t.column("doc_id"), 2))

    out = tmp_path / "out"
    r1 = sharded_map_write(str(src), double, str(out))
    assert r1 == {"shards": 3, "skipped": 0}
    files = sorted(glob.glob(f"{out}/shard-*/part-*.parquet"))
    assert len(files) == 3
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert sorted(t.column("twice").to_pylist()) == [2 * i for i in range(30)]

    # break one shard: its _SUCCESS gone -> only it recomputes
    os.remove(out / "shard-f1" / "_SUCCESS")
    mt_before = {f: os.path.getmtime(f) for f in files}
    r2 = sharded_map_write(str(src), double, str(out))
    assert r2 == {"shards": 3, "skipped": 2}
    for f in files:
        changed = os.path.getmtime(f) != mt_before[f]
        assert changed == ("shard-f1" in f)



class TestHashStrings64:
    """util.hash_strings64 — the vectorized routing hash every graph
    exchange keys on: determinism across array layouts (chunked,
    sliced/offset, large_string) and agreement with an independent
    per-string reference implementation of the same polynomial."""

    @staticmethod
    def _ref_one(s: str) -> int:
        P = 0x100000001B3
        M = (1 << 64) - 1
        b = s.encode("utf-8")
        h = 0
        p = 1
        for c in b:
            h = (h + (c + 1) * p) & M
            p = (p * P) & M
        h = (h * 0x9E3779B97F4A7C15 + len(b)) & M
        h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & M
        h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & M
        h = h ^ (h >> 31)
        return h & 0x7FFFFFFFFFFFFFFF

    def test_matches_reference_and_layout_invariant(self):
        import numpy as np
        import pyarrow as pa

        from website_indexer_ray.util import hash_strings64

        vals = [
            "", "a", "ab", "https://example.gov/path?page=2",
            "x" * 300, "ünïcødé ☃", "a\x1fb", "\x00\x01",
        ] * 3 + [f"u{i}" for i in range(50)]
        base = hash_strings64(pa.array(vals, type=pa.string()))
        expected = np.array([self._ref_one(s) for s in vals], dtype=np.int64)
        assert np.array_equal(base, expected)

        # sliced array (non-zero offset into shared buffers)
        arr = pa.array(["pad1", "pad2", *vals], type=pa.string())
        sliced = arr.slice(2)
        assert np.array_equal(hash_strings64(sliced), expected)

        # chunked layout
        chunked = pa.chunked_array(
            [vals[:5], vals[5:40], vals[40:]], type=pa.string()
        )
        assert np.array_equal(hash_strings64(chunked), expected)

        # large_string offsets
        assert np.array_equal(
            hash_strings64(pa.array(vals, type=pa.large_string())), expected
        )

    def test_nulls_hash_like_empty(self):
        import pyarrow as pa

        from website_indexer_ray.util import hash_strings64

        out = hash_strings64(pa.array(["x", None, ""], type=pa.string()))
        assert out[1] == out[2]
