"""Benchmark harness.

Runs the headline pipelines and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

Headline: a full crawl of the deterministic synthetic web corpus
(sized to the scale factor) through the generation-loop engine —
pages/sec is the BASELINE.md comparison against the reference's
measured ~1.08 pages/s sequential crawler — plus the heavyweight
training-data ops (MinHash near-dup, brute-force ANN) and a grouped
aggregate over the sf tables.

``--scaling``: runs the same bench in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 (the sandbox stand-in for N vs 4N nodes) and
reports throughput at both plus scaling efficiency.

Environment: GRAFT_SF_DIR (default /root/testdata/sf0.1),
RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from website_indexer_ray.config import CrawlConfig
    from website_indexer_ray.fixtures.gen import START_URL, generate_corpus
    from website_indexer_ray.pipelines import annops, relational, textops
    from website_indexer_ray.pipelines.engine import CrawlEngine

    sf = _sf_from_dir(sf_dir)
    n_pages = max(200, int(20000 * sf))

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- headline: the crawl --------------------------------------
    corpus, seeds = generate_corpus(n_pages=n_pages, seed=42)
    cfg = CrawlConfig(
        start_url=START_URL,
        n_seen_shards=8,
        fetch_concurrency=max(2, num_cpus // 2),
        fetch_batch_size=512,
    )
    out_dir = f"/tmp/wir_bench/crawl-{num_cpus}-{sf}"
    t0 = time.monotonic()
    result = CrawlEngine(cfg, out_dir, crawl_id="bench").run(corpus, seeds)
    crawl_s = time.monotonic() - t0
    queries["crawl"] = round(crawl_s, 3)

    lineage = result.lineage_table()
    n_requested = sum(lineage.column("n_accepted").to_pylist())
    n_pages_out = sum(lineage.column("n_pages").to_pylist())
    extra["crawl_urls_fetched"] = n_requested
    extra["crawl_pages_indexed"] = n_pages_out
    extra["crawl_pages_per_s"] = round(n_requested / crawl_s, 2)

    # --- training-data ops ----------------------------------------
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


def run_scaling(sf_dir: str) -> dict:
    import subprocess

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    # Throughput basis: crawl URLs fetched per second.
    thr_lo = r_lo["crawl_urls_fetched"] / r_lo["queries"]["crawl"]
    thr_hi = r_hi["crawl_urls_fetched"] / r_hi["queries"]["crawl"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "crawl_sec_lo": r_lo["queries"]["crawl"],
        "crawl_sec_hi": r_hi["queries"]["crawl"],
        "pages_per_s_lo": round(thr_lo, 2),
        "pages_per_s_hi": round(thr_hi, 2),
        "sf": r_lo["sf"],
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
