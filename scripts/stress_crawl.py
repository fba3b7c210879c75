"""Scale-stress the crawl frontier machinery one order of magnitude
past the 65k scaling corpus: a ~598k-URL deterministic deep tree
(branching 9, depth 6 — SEVEN generations, vs the bench corpus's BFS
diameter ~3), with cross-links so every generation also offers
already-seen URLs (the dedup path carries real load).

Evidence recorded per generation (the things that must stay bounded
for the frontier loop to hold at 100 TB):
  - wall seconds and fetched/accepted/candidate counts (lineage)
  - DRIVER-resident bytes (VmRSS read from /proc/self/status) — the
    claim is the driver never holds O(frontier) rows
  - per-shard peak pending rows between barriers and final seen-set
    bytes (SeenShard.state_stats)

The corpus is synthesized deterministically in-process (no external
data): level-order tree node (d, i) at URL g{d}/x{i}/ links its 9
children plus 2 deterministic back-links to earlier nodes (re-offer
pressure).  HTML is minimal but real — the regular parse/predicate
path runs.

Usage: python scripts/stress_crawl.py [branching] [depth]
Prints one JSON line per generation and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def build_tree_corpus(base: str, branching: int, depth: int):
    """Level-order complete tree: node (d, i) has children
    (d+1, branching*i + j).  Two extra deterministic back-links per
    node point at already-crawled URLs (dedup-path load)."""
    host = base.split("/")[2]
    urls: list[str] = []
    htmls: list[str] = []

    def url_of(d: int, i: int) -> str:
        return base if d == 0 else f"{base}g{d}/x{i}/"

    for d in range(depth + 1):
        n_level = branching ** d
        for i in range(n_level):
            links = []
            if d < depth:
                links = [
                    f'<a href="{url_of(d + 1, branching * i + j)}">c</a>'
                    for j in range(branching)
                ]
            # deterministic back-links into the previous level: nodes
            # re-offered every generation, exercising the seen filter
            if d > 0:
                prev_n = branching ** (d - 1)
                links.append(
                    f'<a href="{url_of(d - 1, (i * 7 + 3) % prev_n)}">b</a>'
                )
                links.append(f'<a href="{base}">home</a>')
            urls.append(url_of(d, i))
            htmls.append(
                f"<html><head><title>Node {d}-{i} — Stress</title></head>"
                f'<body><nav class="o-nav"></nav>{"".join(links)}</body></html>'
            )
    n = len(urls)
    corpus = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "host": pa.array([host] * n, type=pa.string()),
            "status_code": pa.array([200] * n, type=pa.int32()),
            "content_type": pa.array(["text/html"] * n, type=pa.string()),
            "location": pa.array([None] * n, type=pa.string()),
            "html": pa.array(htmls, type=pa.string()),
            "fetch_delay_ms": pa.array([0] * n, type=pa.int32()),
        }
    )
    return corpus


def main() -> None:
    branching = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from website_indexer_ray.config import CrawlConfig
    from website_indexer_ray.fixtures.gen import START_URL
    from website_indexer_ray.pipelines.engine import CrawlEngine
    from website_indexer_ray.schemas import SEEDS_SCHEMA
    from website_indexer_ray.state import seen as seen_state

    t0 = time.monotonic()
    corpus = build_tree_corpus(START_URL, branching, depth)
    seeds = pa.Table.from_pylist(
        [{"url": START_URL, "seed_batch": 0}], schema=SEEDS_SCHEMA
    )
    gen_s = time.monotonic() - t0
    print(
        json.dumps(
            {
                "corpus_urls": corpus.num_rows,
                "corpus_mb": round(corpus.nbytes / 1e6, 1),
                "gen_s": round(gen_s, 1),
                "driver_rss_mb": _rss_mb(),
            }
        ),
        flush=True,
    )

    n_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    cfg = CrawlConfig(
        start_url=START_URL,
        n_seen_shards=16,
        seen_shard_capacity=1 << 17,
        fetch_concurrency=2 * n_cpus,
        fetch_num_cpus=0.5,
        fetch_batch_size=1024,
        simulate_latency=False,
    )
    out_dir = f"/tmp/wir_stress/crawl-{branching}-{depth}"
    import shutil

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    per_gen: list[dict] = []

    live_shards: list = []

    class InstrumentedEngine(CrawlEngine):
        def _run_generation(self, g, *a, **k):
            # positional layout: corpus_ref, cfg_dict, shards, ...
            if len(a) >= 3 and isinstance(a[2], list):
                live_shards[:] = a[2]
            t = time.monotonic()
            rows = super()._run_generation(g, *a, **k)
            rec = {
                "gen": g,
                "wall_s": round(time.monotonic() - t, 2),
                "driver_rss_mb": _rss_mb(),
                "n_candidates": sum(r.get("n_candidates", 0) for r in rows),
                "n_accepted": sum(r.get("n_accepted", 0) for r in rows),
                "n_pages": sum(r.get("n_pages", 0) for r in rows),
            }
            per_gen.append(rec)
            print(json.dumps(rec), flush=True)
            return rows

    engine = InstrumentedEngine(cfg, out_dir, crawl_id="stress-650k")
    engine.warm(corpus)
    t0 = time.monotonic()
    result = engine.run(corpus, seeds)
    crawl_s = time.monotonic() - t0

    lineage = result.lineage_table()
    urls_fetched = sum(lineage.column("n_accepted").to_pylist())
    shard_stats = (
        ray.get([s.state_stats.remote() for s in live_shards])
        if live_shards
        else []
    )
    summary = {
        "metric": "crawl_stress_650k",
        "corpus_urls": corpus.num_rows,
        "generations": len(per_gen),
        "crawl_s": round(crawl_s, 1),
        "urls_per_s": round(urls_fetched / crawl_s, 1),
        "urls_fetched": urls_fetched,
        "driver_rss_peak_mb": max(r["driver_rss_mb"] for r in per_gen),
        "shard_seen_total": sum(s["seen"] for s in shard_stats),
        "shard_exact_mb_max": max((s["exact_mb"] for s in shard_stats), default=0),
        "shard_pending_peak_rows_max": max(
            (s["pending_peak_rows"] for s in shard_stats), default=0
        ),
        "num_cpus": n_cpus,
    }
    print(json.dumps(summary), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
