"""End-to-end crawl tests: distributed engine vs sequential oracle vs
the reference's recorded sample crawl.

Correctness gates from BASELINE.md: URL-seen-set equality, crawl-order
equality ((generation, sorted URL)), per-page parse invariants
(re-expressed as span-sequence equality per doc_id), and lossless
resume from checkpoint.
"""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.fixtures.gen import (
    SAMPLE_START_URL,
    START_URL,
    generate_corpus,
    sample_site_corpus,
)
from website_indexer_ray.fixtures.oracle import crawl_oracle
from website_indexer_ray.functions.spans import build_spans, docs_table_from_records
from website_indexer_ray.pipelines.engine import CrawlEngine, CrawlResult, corpus_to_dict


def run_engine(corpus, seeds, cfg, out_dir, resume=False):
    engine = CrawlEngine(cfg, out_dir)
    return engine.run(corpus, seeds, resume=resume)


def engine_vs_oracle(result, oracle):
    """Assert full equality between engine checkpoint and oracle."""
    records = result.records_table().to_pylist()

    # URL-seen set equality.
    engine_seen = set(result.seen_table().column("url").to_pylist())
    assert engine_seen == oracle.seen
    assert {r["url"] for r in records} == oracle.seen

    # Crawl-order equality: (generation, sorted url).
    engine_order = sorted(
        ((r["generation"], r["url"]) for r in records)
    )
    oracle_order = sorted(((g, u) for u, g in oracle.order))
    assert engine_order == oracle_order

    # Record-level equality per type.
    by_url = {r["url"]: r for r in records}
    assert len(by_url) == len(records)  # unique (crawl, url), models.py:77-79
    for rtype in ("page", "error", "redirect", "skipped"):
        gold = oracle.by_type(rtype)
        mine = sorted(
            (r for r in records if r["record_type"] == rtype),
            key=lambda r: r["url"],
        )
        assert [r["url"] for r in mine] == [r["url"] for r in gold], rtype
        for m, o in zip(mine, gold):
            for col in (
                "status_code", "referrer", "location", "title", "language",
                "text", "components", "links", "media", "depth", "generation",
            ):
                assert m[col] == o[col], (rtype, m["url"], col)
            assert m["timestamp"].timestamp() * 1e6 == pytest.approx(o["timestamp"]), m["url"]


class TestSampleSiteConformance:
    """The reference's recorded sample crawl
    (crawler/fixtures/sample.json): 3 pages, 1 error, the o-sample
    component, 9 distinct link hrefs."""

    @pytest.fixture(scope="class")
    def result(self, ray_session, tmp_path_factory):
        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(start_url=SAMPLE_START_URL, n_seen_shards=2,
                          fetch_concurrency=2)
        out = str(tmp_path_factory.mktemp("sample_crawl"))
        return run_engine(corpus, seeds, cfg, out)

    def test_pages(self, result):
        records = result.records_table().to_pylist()
        pages = sorted(
            (r for r in records if r["record_type"] == "page"),
            key=lambda r: r["url"],
        )
        assert [p["url"] for p in pages] == [
            "http://localhost:8000/",
            "http://localhost:8000/child/",
            "http://localhost:8000/child/?page=2",
        ]
        assert [p["title"] for p in pages] == [
            "Sample homepage", "Sample child page", "Sample child page",
        ]
        home = pages[0]
        assert home["components"] == ["o-sample"]
        assert home["links"] == sorted(
            [
                "./file.xlsx", "/child/", "/child/?foo=bar", "/child/?page=2",
                "/child/?page=2&foo=bar", "https://example.com/",
                "https://example.com/file.xlsx", "https://example.org/",
            ]
        )
        assert pages[1]["links"] == ["/"]

    def test_distinct_links_match_fixture(self, result):
        # 9 distinct hrefs across pages (fixture crawler.link rows).
        records = result.records_table().to_pylist()
        hrefs = set()
        for r in records:
            if r["record_type"] == "page":
                hrefs.update(r["links"])
        assert len(hrefs) == 9

    def test_error(self, result):
        records = result.records_table().to_pylist()
        errors = [r for r in records if r["record_type"] == "error"]
        assert len(errors) == 1
        assert errors[0]["url"] == "https://example.com/file.xlsx"
        assert errors[0]["status_code"] == 404
        assert errors[0]["referrer"] == "http://localhost:8000/"

    def test_seen_set(self, result):
        assert set(result.seen_table().column("url").to_pylist()) == {
            "http://localhost:8000/",
            "http://localhost:8000/child/",
            "http://localhost:8000/child/?page=2",
            "https://example.com/",
            "https://example.com/file.xlsx",
            "https://example.org/",
        }

    def test_matches_oracle(self, result):
        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(start_url=SAMPLE_START_URL)
        oracle = crawl_oracle(
            corpus_to_dict(corpus), [SAMPLE_START_URL], cfg
        )
        engine_vs_oracle(result, oracle)


class TestSyntheticEquality:
    @pytest.fixture(scope="class")
    def corpus_seeds(self):
        return generate_corpus(n_pages=60, seed=42)

    def _cfg(self, **kw):
        return CrawlConfig(start_url=START_URL, n_seen_shards=4,
                           fetch_concurrency=2, fetch_batch_size=64, **kw)

    def test_full_crawl_equality(self, ray_session, tmp_path, corpus_seeds):
        corpus, seeds = corpus_seeds
        cfg = self._cfg()
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "full"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        assert len(oracle.seen) > 50  # crawl actually covered the site
        engine_vs_oracle(result, oracle)

    def test_budget_equality(self, ray_session, tmp_path, corpus_seeds):
        corpus, seeds = corpus_seeds
        cfg = self._cfg(max_pages=17)
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "budget"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        assert len(oracle.seen) == 17
        engine_vs_oracle(result, oracle)

    def test_distributed_path_equality(self, ray_session, tmp_path, corpus_seeds):
        """Force the Ray Data pipelines (driver_threshold=0,
        fetch_driver_threshold=0) — the adaptive driver-side shortcut
        for tiny generations must be behavior-identical to the
        distributed path, both equal to the oracle."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg(driver_threshold=0, fetch_driver_threshold=0)
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "dist"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        engine_vs_oracle(result, oracle)

    def test_salted_politeness_equality(self, ray_session, tmp_path, corpus_seeds):
        """Politeness + salted groupby(host) fetch (north_rule skew
        handling): per-host pacing through the shared HostBudget actor
        must not change any record — timestamps are pure functions, so
        the salted shuffle path is output-identical to the oracle."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg(
            politeness_wait=0.005,
            random_wait=True,
            salt_partitions=4,
            driver_threshold=0,
            fetch_driver_threshold=0,
        )
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "salted"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        engine_vs_oracle(result, oracle)

    def test_unsalted_politeness_uses_shared_budget(
        self, ray_session, tmp_path, corpus_seeds
    ):
        """politeness_wait>0 WITHOUT salting must still pace through
        the one shared HostBudget actor — per-actor limiters would
        multiply the per-host rate by the pool size. Records stay
        oracle-identical and the engine holds a budget handle."""
        from website_indexer_ray.pipelines.engine import CrawlEngine

        corpus, seeds = corpus_seeds
        cfg = self._cfg(
            politeness_wait=0.005,
            salt_partitions=1,
            driver_threshold=0,
            fetch_driver_threshold=0,
        )
        eng = CrawlEngine(cfg, str(tmp_path / "unsalted_polite"))
        captured = {}
        orig = eng._fetch_table_or_ds

        def spy(claimed_tbl, claimed_ds, records_dir, corpus_ref,
                cfg_dict, budget_handle, counts, n_claimed, *rest):
            captured["budget"] = budget_handle
            return orig(claimed_tbl, claimed_ds, records_dir, corpus_ref,
                        cfg_dict, budget_handle, counts, n_claimed, *rest)

        eng._fetch_table_or_ds = spy
        result = eng.run(corpus, seeds)
        assert captured["budget"] is not None
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        engine_vs_oracle(result, oracle)

    def test_depth_equality(self, ray_session, tmp_path, corpus_seeds):
        corpus, seeds = corpus_seeds
        cfg = self._cfg(depth=2)
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "depth"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        engine_vs_oracle(result, oracle)

    def test_docs_span_equality(self, ray_session, tmp_path, corpus_seeds):
        """Span-sequence equality per doc_id (BASELINE.json input_hint)."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg()
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "docs"))
        docs = docs_table_from_records(result.records_table())
        gold_oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        gold = {
            r["url"]: build_spans(
                r["title"], r["language"], r["text"],
                r["links"], r["components"], r["media"],
            )
            for r in gold_oracle.records
            if r["record_type"] == "page"
        }
        mine = dict(zip(docs.column("doc_id").to_pylist(), docs.column("spans").to_pylist()))
        assert set(mine) == set(gold)
        for doc_id, spans in mine.items():
            assert [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
            ] == [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in gold[doc_id]
            ], doc_id

    def test_resume_lossless(self, ray_session, tmp_path, corpus_seeds):
        """Kill after generation g, resume, identical final tables."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg()
        full_dir = str(tmp_path / "ref_run")
        full = run_engine(corpus, seeds, cfg, full_dir)
        full_records = full.records_table()
        n_gens = len(glob.glob(os.path.join(full_dir, "records", "gen=*", "_SUCCESS")))
        assert n_gens >= 3

        # Simulate a crash after generation 1: drop everything later.
        resume_dir = str(tmp_path / "resumed")
        shutil.copytree(full_dir, resume_dir)
        for kind in ("records", "frontier", "seen"):
            for d in glob.glob(os.path.join(resume_dir, kind, "gen=*")):
                g = int(os.path.basename(d).split("=")[1])
                cut = 2 if kind == "frontier" else 1
                if g > cut:
                    shutil.rmtree(d)

        resumed = CrawlEngine(cfg, resume_dir).run(corpus, seeds, resume=True)
        resumed_records = resumed.records_table()

        key = lambda t: sorted(t.to_pylist(), key=lambda r: r["url"])
        assert key(resumed_records) == key(full_records)
        assert resumed.seen_table().equals(full.seen_table())

    def test_head_domain_equality(self, ray_session, tmp_path, corpus_seeds):
        """F6/S2: URLs matching head_url_patterns fetch with HEAD —
        no body, no parse — and the records still match the oracle."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg(
            head_url_patterns=(r"^https://ext0\.example/.*",),
        )
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "head"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        engine_vs_oracle(result, oracle)
        records = result.records_table().to_pylist()
        head_rows = [r for r in records if r["url"].startswith("https://ext0.example/")]
        assert head_rows, "corpus should contain ext0.example URLs"
        assert all(r["method"] == "HEAD" for r in head_rows)
        assert all(r["html"] is None for r in head_rows)

    def test_robots_exclusion(self, ray_session, tmp_path):
        """respect_robots=True (north_rule component; reference runs
        --no-robots so default-off reproduces its semantics): a
        disallowed path is recorded robots_excluded, never fetched or
        parsed, and contributes no frontier links."""
        import pyarrow as pa

        from website_indexer_ray.schemas import CORPUS_SCHEMA

        corpus, seeds = sample_site_corpus()
        robots_row = pa.Table.from_pylist(
            [
                dict(
                    url="http://localhost:8000/robots.txt",
                    host="localhost:8000",
                    status_code=200,
                    content_type="text/plain",
                    location=None,
                    html="User-agent: *\nDisallow: /child/\n",
                    fetch_delay_ms=0,
                )
            ],
            schema=CORPUS_SCHEMA,
        )
        corpus = pa.concat_tables([corpus, robots_row])
        cfg = CrawlConfig(
            start_url=SAMPLE_START_URL, n_seen_shards=2, respect_robots=True
        )
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "robots"))
        records = {r["url"]: r for r in result.records_table().to_pylist()}
        assert records["http://localhost:8000/"]["record_type"] == "page"
        assert records["http://localhost:8000/child/"]["record_type"] == "robots_excluded"
        assert records["http://localhost:8000/child/?page=2"]["record_type"] == "robots_excluded"
        assert records["http://localhost:8000/child/"]["title"] is None

    def test_aggressive_profile_equality(self, ray_session, tmp_path, corpus_seeds):
        """canonical_profile="aggressive" (tracking-param strip, query
        sort, trailing-slash normalization) end-to-end: engine and
        oracle share the canonicalizer, so the crawl under the
        alternate URL identity is still record-identical — and differs
        from the reference profile (slash-normalized old-K URLs hit
        their targets directly instead of redirecting)."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg(canonical_profile="aggressive")
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "aggr"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        engine_vs_oracle(result, oracle)
        ref_oracle = crawl_oracle(
            corpus_to_dict(corpus), [START_URL], self._cfg()
        )
        assert oracle.seen != ref_oracle.seen  # the profile changes identity

    def test_all_features_interaction(self, ray_session, tmp_path, corpus_seeds):
        """Politeness + salted host partitioning + robots cache (no
        robots.txt in corpus => allow-all) + budget + depth cap all at
        once — feature interactions must not change the record set."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg(
            politeness_wait=0.005,
            random_wait=True,
            salt_partitions=4,
            respect_robots=True,
            max_pages=25,
            depth=3,
        )
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "allon"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        assert len(oracle.seen) == 25
        engine_vs_oracle(result, oracle)

    def test_cuckoo_overflow_exact_fallback(self, ray_session, tmp_path, corpus_seeds):
        """With a filter capacity far below the URL count the cuckoo
        filter saturates (inserts start failing); the exact set must
        keep claim semantics — crawl results stay oracle-identical."""
        corpus, seeds = corpus_seeds
        cfg = self._cfg(seen_shard_capacity=8)
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "tinycuckoo"))
        oracle = crawl_oracle(corpus_to_dict(corpus), [START_URL], cfg)
        engine_vs_oracle(result, oracle)

    def test_max_generations_cap(self, ray_session, tmp_path, corpus_seeds):
        corpus, seeds = corpus_seeds
        cfg = self._cfg(max_generations=2)
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "gencap"))
        lineage = result.lineage_table()
        assert lineage.num_rows == 2
        full = crawl_oracle(corpus_to_dict(corpus), [START_URL], self._cfg())
        assert result.records_table().num_rows < len(full.seen)
        assert result.status()["status"] == "Finished"

    def test_invalid_seed_empty_crawl(self, ray_session, tmp_path, corpus_seeds):
        """A seed the canonicalizer rejects (mailto:) produces an empty
        Finished crawl, not a crash."""
        import pyarrow as pa

        from website_indexer_ray.schemas import SEEDS_SCHEMA

        corpus, _seeds = corpus_seeds
        seeds = pa.Table.from_pylist(
            [{"url": "mailto:info@test.example", "seed_batch": 0}],
            schema=SEEDS_SCHEMA,
        )
        result = run_engine(corpus, seeds, self._cfg(), str(tmp_path / "noseed"))
        assert result.records_table().num_rows == 0
        assert result.status()["status"] == "Finished"

    def test_fused_vs_unfused_expansion_equality(
        self, ray_session, tmp_path, corpus_seeds
    ):
        """cfg.fused_expand folds phase A (expand+predicate+offer) into
        the fetch stage; records, seen set and lineage — including the
        pre-predicate n_candidates counts banked on the shards — must
        be identical to the unfused checkpoint-reading path. Thresholds
        are zeroed so BOTH runs take the distributed Ray Data path
        (the driver path is covered by the oracle-equality tests)."""
        corpus, seeds = corpus_seeds
        kw = dict(driver_threshold=0, driver_candidate_threshold=0,
                  fetch_driver_threshold=0)
        res_f = run_engine(corpus, seeds, self._cfg(fused_expand=True, **kw),
                           str(tmp_path / "fusedA"))
        res_u = run_engine(corpus, seeds, self._cfg(fused_expand=False, **kw),
                           str(tmp_path / "fusedB"))
        key = lambda r: r["url"]  # noqa: E731
        assert sorted(res_f.records_table().to_pylist(), key=key) == sorted(
            res_u.records_table().to_pylist(), key=key
        )
        assert set(res_f.seen_table().column("url").to_pylist()) == set(
            res_u.seen_table().column("url").to_pylist()
        )
        strip = lambda rows: [  # noqa: E731
            {k: v for k, v in r.items() if k != "wall_s"} for r in rows
        ]
        assert strip(res_f.lineage_table().to_pylist()) == strip(
            res_u.lineage_table().to_pylist()
        )

    def test_fetch_threads_equality(self, ray_session, tmp_path, corpus_seeds):
        """Connection multiplexing (fetch_threads) must be output-
        invariant: records are pure per-row functions and executor.map
        preserves order."""
        corpus, seeds = corpus_seeds
        res_1 = run_engine(corpus, seeds, self._cfg(fetch_threads=1),
                           str(tmp_path / "thr1"))
        res_4 = run_engine(corpus, seeds, self._cfg(fetch_threads=4),
                           str(tmp_path / "thr4"))
        key = lambda r: r["url"]  # noqa: E731
        assert sorted(res_1.records_table().to_pylist(), key=key) == sorted(
            res_4.records_table().to_pylist(), key=key
        )

    def test_corpus_index_matches_dict(self, corpus_seeds):
        """The zero-copy Arrow corpus accessor returns exactly the
        tuples the pickled-dict broadcast used to."""
        from website_indexer_ray.stages.fetch import CorpusIndex

        corpus, _ = corpus_seeds
        d = corpus_to_dict(corpus)
        idx = CorpusIndex(corpus)
        for url, row in d.items():
            assert idx.get(url) == row
        assert idx.get("https://not-in-corpus.example/") is None

    def test_lineage(self, ray_session, tmp_path, corpus_seeds):
        corpus, seeds = corpus_seeds
        cfg = self._cfg()
        result = run_engine(corpus, seeds, cfg, str(tmp_path / "lineage"))
        lineage = result.lineage_table().to_pylist()
        assert lineage[0]["generation"] == 0
        assert lineage[0]["n_accepted"] == 1  # the seed
        total = sum(r["n_accepted"] for r in lineage)
        assert total == result.records_table().num_rows
        assert result.status()["status"] == "Finished"


class TestActorFailureRecovery:
    """Distributed fault tolerance: a seen-shard actor dying mid-crawl
    fails the run (status Failed recorded in crawl.json), and a
    resume=True run restores shard state from the last _SUCCESS seen
    snapshot and completes with tables identical to an uninterrupted
    crawl — the north_rule's lossless-checkpoint-resume contract under
    real actor loss, not just truncated directories."""

    def test_shard_death_then_resume(self, ray_session, tmp_path):
        import ray as _ray

        from website_indexer_ray.fixtures.gen import generate_corpus

        corpus, seeds = generate_corpus(n_pages=60, seed=42)
        cfg = CrawlConfig(
            start_url=START_URL, n_seen_shards=2, fetch_concurrency=2
        )

        full = run_engine(corpus, seeds, cfg, str(tmp_path / "clean"))
        full_records = full.records_table()

        class FaultyEngine(CrawlEngine):
            killed = False

            def _run_generation(self, g, corpus_ref, cfg_dict, shards,
                                budget_handle, total_requested):
                if g == 2 and not FaultyEngine.killed:
                    FaultyEngine.killed = True
                    _ray.kill(shards[0])
                return super()._run_generation(
                    g, corpus_ref, cfg_dict, shards, budget_handle,
                    total_requested,
                )

        crash_dir = str(tmp_path / "crash")
        with pytest.raises(Exception):
            FaultyEngine(cfg, crash_dir).run(corpus, seeds)
        status = CrawlResult(crash_dir).status()
        assert status["status"] == "Failed"
        assert status["failure_message"]

        resumed = CrawlEngine(cfg, crash_dir).run(corpus, seeds, resume=True)
        assert resumed.status()["status"] == "Finished"
        key = lambda t: sorted(t.to_pylist(), key=lambda r: r["url"])
        assert key(resumed.records_table()) == key(full_records)
        assert resumed.seen_table().equals(full.seen_table())


class TestSeedBatchLineage:
    """north_rule: lineage rows key on (seed batch, generation) with
    per-batch outcome counts; seed_batch provenance inherits
    parent→child through expansion and redirect follows."""

    def test_two_seed_batches(self, ray_session, tmp_path):
        import pyarrow as pa

        from website_indexer_ray.fixtures.gen import generate_corpus
        from website_indexer_ray.schemas import SEEDS_SCHEMA

        corpus, _ = generate_corpus(n_pages=60, seed=42)
        # Second batch seeds a section page: its subtree counts under
        # batch 1 unless batch 0 claims a URL first (dedup is global).
        urls = corpus.column("url").to_pylist()
        section = next(
            u for u in urls if u != START_URL and u.endswith("/")
            and "ext" not in u
        )
        seeds = pa.Table.from_pylist(
            [
                {"url": START_URL, "seed_batch": 0},
                {"url": section, "seed_batch": 1},
            ],
            schema=SEEDS_SCHEMA,
        )
        cfg = CrawlConfig(
            start_url=START_URL, n_seen_shards=2, fetch_concurrency=2
        )
        res = run_engine(corpus, seeds, cfg, str(tmp_path / "two_batches"))

        lin = res.lineage_table().to_pylist()
        gen0 = [r for r in lin if r["generation"] == 0]
        assert sorted(r["seed_batch"] for r in gen0) == [0, 1]
        assert all(r["n_accepted"] == 1 for r in gen0)

        records = res.records_table()
        batches = set(records.column("seed_batch").to_pylist())
        assert batches == {0, 1}

        # Lineage accounting is exact per batch: outcome counts sum to
        # the records table's per-batch row counts.
        import collections

        by_batch = collections.Counter(records.column("seed_batch").to_pylist())
        for sb, n in by_batch.items():
            assert sum(r["n_accepted"] for r in lin if r["seed_batch"] == sb) == n

    def test_single_batch_unchanged(self, ray_session, tmp_path):
        """Default crawls still produce one lineage row per generation
        (seed_batch 0) — the round-1 contract."""
        from website_indexer_ray.fixtures.gen import generate_corpus

        corpus, seeds = generate_corpus(n_pages=60, seed=42)
        cfg = CrawlConfig(
            start_url=START_URL, n_seen_shards=2, fetch_concurrency=2
        )
        res = run_engine(corpus, seeds, cfg, str(tmp_path / "single"))
        lin = res.lineage_table().to_pylist()
        gens = [r["generation"] for r in lin]
        assert gens == sorted(set(gens))  # exactly one row per generation
        assert set(r["seed_batch"] for r in lin) == {0}


class TestSameDomainPriority:
    """Priority frontier (north_star: BFS depth + same-domain
    priority): with prioritize_same_domain the budgeted claim takes
    every start-host candidate before any external one; off (the
    default), claims follow plain canonical URL order — externals
    like ext0.example sort first lexicographically."""

    def _crawl(self, tmp_path, tag, **cfg_kw):
        from website_indexer_ray.fixtures.gen import generate_corpus

        corpus, seeds = generate_corpus(n_pages=60, seed=42)
        cfg = CrawlConfig(
            start_url=START_URL, n_seen_shards=2, fetch_concurrency=2,
            max_pages=12, **cfg_kw,
        )
        return run_engine(corpus, seeds, cfg, str(tmp_path / tag))

    def test_priority_orders_internal_first(self, ray_session, tmp_path):
        from website_indexer_ray.functions.urls import hostname_with_port

        start_host = hostname_with_port(START_URL)

        res = self._crawl(tmp_path, "prio", prioritize_same_domain=True)
        rec = res.records_table().to_pylist()
        # the whole 12-URL budget goes to start-host URLs
        assert all(r["host"] == start_host for r in rec)

        res2 = self._crawl(tmp_path, "plain")
        rec2 = res2.records_table().to_pylist()
        # default canonical order lets lexicographically-early external
        # hosts (ext*.example < test.example) into the same budget
        n_ext = sum(1 for r in rec2 if r["host"] != start_host)
        assert n_ext > 0
        assert len(rec) == len(rec2)  # identical budget spend


class TestDocsArtifact:
    """write_docs_table materializes the interleaved-span docs table
    (BASELINE input_hint shape) as a crawl artifact via the Lance
    seam; contents equal the on-demand projection."""

    def test_docs_written_and_equal(self, ray_session, tmp_path):
        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(
            start_url=SAMPLE_START_URL, n_seen_shards=2,
            fetch_concurrency=2, write_docs_table=True,
        )
        res = run_engine(corpus, seeds, cfg, str(tmp_path / "docs_artifact"))
        docs_ds = res.ray_docs()
        rows = sorted(docs_ds.take_all(), key=lambda r: r["doc_id"])
        expected = docs_table_from_records(res.records_table()).to_pylist()
        expected.sort(key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in expected]
        assert [r["spans"] for r in rows] == [r["spans"] for r in expected]

    def test_docs_artifact_failure_keeps_crawl_finished(
        self, ray_session, tmp_path, monkeypatch
    ):
        """The artifact is derived from the already-finalized records
        checkpoint — a write failure must not demote the crawl to
        Failed; it lands as a status warning instead."""
        import json

        from website_indexer_ray.sources import lance_io

        def boom(*a, **k):
            raise RuntimeError("simulated artifact sink failure")

        monkeypatch.setattr(lance_io, "write_records", boom)
        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(
            start_url=SAMPLE_START_URL, n_seen_shards=2,
            fetch_concurrency=2, write_docs_table=True,
        )
        res = run_engine(corpus, seeds, cfg, str(tmp_path / "docs_fail"))
        with open(f"{tmp_path}/docs_fail/crawl.json") as f:
            status = json.load(f)
        assert status["status"] == "Finished"
        assert "simulated artifact sink failure" in status["warnings"]["docs_artifact"]


class TestCrawlDiff:
    """Recrawl diffing (pipelines/recrawl.py): the delta between two
    nightly snapshots, classified added/removed/changed, equal to the
    DuckDB full-outer-join oracle."""

    def test_diff_classes_and_oracle(self, ray_session, tmp_path):
        import duckdb

        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.fixtures.gen import mutate_corpus_rev2
        from website_indexer_ray.pipelines.recrawl import (
            crawl_diff_from_checkpoints,
        )

        corpus, seeds = generate_corpus(n_pages=60, seed=42)
        cfg = CrawlConfig(start_url=START_URL, n_seen_shards=4,
                          fetch_concurrency=4)
        a_out, b_out = str(tmp_path / "a"), str(tmp_path / "b")
        run_engine(corpus, seeds, cfg, a_out)
        run_engine(mutate_corpus_rev2(corpus), seeds, cfg, b_out)

        d = crawl_diff_from_checkpoints(a_out, b_out)
        classes = set(d.column("change").to_pylist())
        assert classes == {"added", "removed", "changed"}
        assert "https://test.example/rev2-extra/" in d.filter(
            __import__("pyarrow").compute.equal(d.column("change"), "added")
        ).column("url").to_pylist()

        con = duckdb.connect()
        gold = con.execute(f"""
            WITH a AS (SELECT url, html
                       FROM read_parquet('{a_out}/records/gen=*/*.parquet')
                       WHERE record_type='page'),
                 b AS (SELECT url, html
                       FROM read_parquet('{b_out}/records/gen=*/*.parquet')
                       WHERE record_type='page')
            SELECT COALESCE(a.url, b.url) AS url,
                   CASE WHEN a.url IS NULL THEN 'added'
                        WHEN b.url IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM a FULL OUTER JOIN b ON a.url = b.url
            WHERE a.url IS NULL OR b.url IS NULL OR a.html <> b.html
            ORDER BY url""").fetch_arrow_table()
        assert d.to_pydict() == gold.to_pydict()

    def test_identical_snapshots_empty_diff(self, ray_session, tmp_path):
        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.pipelines.recrawl import (
            _DIFF_COLUMNS,
            crawl_diff_from_checkpoints,
            recrawl_priority,
        )

        corpus, seeds = generate_corpus(n_pages=30, seed=42)
        cfg = CrawlConfig(start_url=START_URL, n_seen_shards=2,
                          fetch_concurrency=2)
        a_out, b_out = str(tmp_path / "a"), str(tmp_path / "b")
        run_engine(corpus, seeds, cfg, a_out)
        run_engine(corpus, seeds, cfg, b_out)
        assert crawl_diff_from_checkpoints(a_out, b_out).num_rows == 0
        # identical snapshots -> every page stable (priority 2),
        # exactly B's page set, url-sorted within the priority band
        from website_indexer_ray.pipelines.engine import CrawlResult

        pri = recrawl_priority(
            CrawlResult(a_out).ray_records(columns=_DIFF_COLUMNS),
            CrawlResult(b_out).ray_records(columns=_DIFF_COLUMNS),
        )
        assert set(pri.column("priority").to_pylist()) == {2}
        urls = pri.column("url").to_pylist()
        assert urls == sorted(urls) and len(urls) > 0

    def test_recrawl_priority_bands(self, ray_session, tmp_path):
        """Changed pages outrank added, added outrank stable; removed
        pages never appear (nothing to fetch)."""
        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.fixtures.gen import mutate_corpus_rev2
        from website_indexer_ray.pipelines.engine import CrawlResult
        from website_indexer_ray.pipelines.recrawl import (
            _DIFF_COLUMNS,
            crawl_diff_from_checkpoints,
            recrawl_priority,
        )

        corpus, seeds = generate_corpus(n_pages=60, seed=42)
        cfg = CrawlConfig(start_url=START_URL, n_seen_shards=4,
                          fetch_concurrency=4)
        a_out, b_out = str(tmp_path / "a"), str(tmp_path / "b")
        run_engine(corpus, seeds, cfg, a_out)
        run_engine(mutate_corpus_rev2(corpus), seeds, cfg, b_out)

        diff = crawl_diff_from_checkpoints(a_out, b_out)
        by_class = {
            c: {u for u, cc in zip(diff.column("url").to_pylist(),
                                   diff.column("change").to_pylist()) if cc == c}
            for c in ("added", "removed", "changed")
        }
        pri = recrawl_priority(
            CrawlResult(a_out).ray_records(columns=_DIFF_COLUMNS),
            CrawlResult(b_out).ray_records(columns=_DIFF_COLUMNS),
        )
        got = dict(zip(pri.column("url").to_pylist(),
                       pri.column("priority").to_pylist()))
        assert by_class["changed"] and by_class["added"]  # both present
        assert all(got[u] == 0 for u in by_class["changed"])
        assert all(got[u] == 1 for u in by_class["added"])
        assert not (by_class["removed"] & set(got))
        rest = set(got) - by_class["changed"] - by_class["added"]
        assert rest and all(got[u] == 2 for u in rest)
        # output ordering: priority bands, url-sorted within each
        pairs = list(zip(pri.column("priority").to_pylist(),
                         pri.column("url").to_pylist()))
        assert pairs == sorted(pairs)
