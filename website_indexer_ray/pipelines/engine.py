"""The crawl engine: a generation-based (breadth-first) frontier loop.

Replaces the reference's single-process wpull event loop
(/root/reference/crawler/wpull/crawler.py:27-62) with per-generation
Ray Data pipelines:

  frontier(g) ──map_batches(PredicateStage)──►  accepted candidates
     ──map_batches(SeenClaimStage: sharded cuckoo actors)──► claimed
     ──map_batches(FetchParseStage actor pool)──► records(g)
     ──write_parquet──► records/gen=g/            (checkpoint)
  records(g) ──pruned read──map_batches(ExpandStage)──►
     ──write_parquet──► frontier/gen=g+1/         (checkpoint)
  seen shards ──snapshot──► seen/gen=g/           (checkpoint)
  lineage row ──► _SUCCESS manifest               (completes gen g)

BFS ordering (wpull processes URLs level by level, crawler.py:47 +
plugin.py:145-151) is reproduced by the generation barrier; crawl
order is canonically defined as (generation, sorted canonical URL) and
verified against the sequential oracle. Budgeted crawls
(max_pages > 0) take a deterministic driver-side path because the
reference budget is order-sensitive (plugin.py:88-100).

Resume: the latest generation with a ``_SUCCESS`` manifest is the
checkpoint — seen shards are restored from its snapshot, the loop
re-enters at its already-written ``frontier/gen=g+1``. Every manifest
carries the per-generation lineage record (seed batch, outcome counts,
wall time — north_rule).

Scale notes: nothing in the loop materializes records on the driver —
records flow map_batches → write_parquet as streaming blocks; the
expansion input prunes to the tiny columns (EXPAND_COLUMNS — never the
HTML); candidate→shard claims are actor calls keyed by url_hash, not a
shuffle. The only driver-side collections are the budgeted-crawl
candidate list (bounded by the budget) and per-generation row counts
read from Parquet footers.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import traceback

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.functions.urls import canonicalize, hostname_with_port, url_hash
from website_indexer_ray.schemas import FRONTIER_SCHEMA, LINEAGE_SCHEMA
from website_indexer_ray.stages.expand import EXPAND_COLUMNS, ExpandStage
from website_indexer_ray.stages.fetch import FetchParseStage
from website_indexer_ray.stages.predicates import PredicateStage
from website_indexer_ray.state import seen as seen_state
from website_indexer_ray.state.politeness import HostBudget

FRONTIER_WITH_METHOD = FRONTIER_SCHEMA.append(pa.field("method", pa.string()))


def corpus_to_dict(corpus: pa.Table) -> dict[str, tuple]:
    """url → (status, content_type, location, html, delay_ms)."""
    cols = [
        corpus.column(c).to_pylist()
        for c in ("url", "status_code", "content_type", "location", "html", "fetch_delay_ms")
    ]
    return {
        u: (s, ct, loc, html, d)
        for u, s, ct, loc, html, d in zip(*cols)
    }


def seeds_to_frontier(seeds: pa.Table, cfg: CrawlConfig) -> pa.Table:
    """Seed rows → generation-0 frontier. A seed's parent is itself
    (wpull roots have no distinct parent), so F5 passes."""
    rows = []
    for row in seeds.to_pylist():
        url = canonicalize(row["url"], profile=cfg.canonical_profile)
        if url is None:
            continue
        rows.append(
            {
                "url": url,
                "url_hash": url_hash(url),
                "host": hostname_with_port(url),
                "depth": 0,
                "parent_url": "",
                "parent_host": hostname_with_port(cfg.start_url),
                "root_url": url,
                "generation": 0,
                "seed_batch": row.get("seed_batch", 0) or 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)


def _dir_num_rows(directory: str) -> int:
    total = 0
    for f in glob.glob(os.path.join(directory, "*.parquet")):
        total += pq.read_metadata(f).num_rows
    return total


def _gen_dir(base: str, kind: str, g: int) -> str:
    return os.path.join(base, kind, f"gen={g:05d}")


class CrawlEngine:
    def __init__(self, cfg: CrawlConfig, out_dir: str, crawl_id: str = "crawl-0"):
        self.cfg = cfg
        self.out = out_dir
        self.crawl_id = crawl_id
        self.lineage: list[dict] = []

    # ---- checkpoint manifest helpers --------------------------------
    def _manifest_path(self, g: int) -> str:
        return os.path.join(self.out, "records", f"gen={g:05d}", "_SUCCESS")

    def _complete_generations(self) -> list[int]:
        out = []
        for p in sorted(glob.glob(os.path.join(self.out, "records", "gen=*", "_SUCCESS"))):
            out.append(int(os.path.basename(os.path.dirname(p)).split("=")[1]))
        return out

    # ---- main entry -------------------------------------------------
    def run(
        self,
        corpus: pa.Table | dict,
        seeds: pa.Table,
        resume: bool = False,
    ) -> "CrawlResult":
        cfg = self.cfg
        cfg_dict = cfg.to_dict()
        t_start = time.monotonic()

        if not resume and os.path.exists(self.out):
            shutil.rmtree(self.out)
        os.makedirs(self.out, exist_ok=True)

        status_path = os.path.join(self.out, "crawl.json")
        with open(status_path, "w") as f:
            json.dump(
                {"crawl_id": self.crawl_id, "status": "Started", "config": cfg_dict},
                f,
            )

        corpus_dict = corpus if isinstance(corpus, dict) else corpus_to_dict(corpus)
        corpus_ref = ray.put(corpus_dict)

        shards = seen_state.create_shards(cfg.n_seen_shards, cfg.seen_shard_capacity)
        budget_handle = (
            HostBudget.remote(cfg.politeness_wait, cfg.random_wait)
            if cfg.salt_partitions > 1 and cfg.politeness_wait > 0
            else None
        )

        total_requested = 0
        start_gen = 0
        if resume:
            complete = self._complete_generations()
            if complete:
                last = complete[-1]
                seen_state.restore_all(shards, _gen_dir(self.out, "seen", last))
                for g in complete:
                    with open(self._manifest_path(g)) as f:
                        rec = json.load(f)
                    self.lineage.append(rec["lineage"])
                    total_requested += rec["lineage"]["n_accepted"]
                start_gen = last + 1

        if start_gen == 0:
            frontier0 = seeds_to_frontier(seeds, cfg)
            fdir = _gen_dir(self.out, "frontier", 0)
            os.makedirs(fdir, exist_ok=True)
            pq.write_table(frontier0, os.path.join(fdir, "part-0.parquet"))

        try:
            g = start_gen
            while g < cfg.max_generations:
                n_frontier = _dir_num_rows(_gen_dir(self.out, "frontier", g))
                if n_frontier == 0:
                    break
                lineage_row = self._run_generation(
                    g, corpus_ref, cfg_dict, shards, budget_handle, total_requested
                )
                total_requested += lineage_row["n_accepted"]
                self.lineage.append(lineage_row)
                g += 1
                if lineage_row["n_accepted"] == 0:
                    break

            self._finalize("Finished", None, status_path, cfg_dict, t_start)
        except Exception:
            self._finalize(
                "Failed", traceback.format_exc(), status_path, cfg_dict, t_start
            )
            raise

        return CrawlResult(self.out, self.crawl_id)

    # ---- one generation --------------------------------------------
    def _run_generation(
        self,
        g: int,
        corpus_ref,
        cfg_dict: dict,
        shards: list,
        budget_handle,
        total_requested: int,
    ) -> dict:
        cfg = self.cfg
        t0 = time.monotonic()
        frontier_dir = _gen_dir(self.out, "frontier", g)
        records_dir = _gen_dir(self.out, "records", g)
        if os.path.exists(records_dir):
            shutil.rmtree(records_dir)

        n_candidates = _dir_num_rows(frontier_dir)

        frontier_ds = ray.data.read_parquet(frontier_dir)
        accepted_ds = frontier_ds.map_batches(
            PredicateStage(cfg_dict), batch_format="pyarrow"
        )

        # Within-generation duplicate resolution + seen anti-join in
        # one exchange: candidate rows are routed to the seen shards
        # (hash-partitioned on url_hash), each shard keeps the
        # canonical min-(depth, parent_url, method) row per URL
        # (deterministic winner — the oracle mirrors this), and at the
        # generation barrier ``resolve`` atomically claims every
        # pending unseen URL. No groupby shuffle; only slim candidate
        # rows move, and winners flow back as per-shard Arrow refs.
        shard_handles = shards

        def offer(batch: pa.Table) -> pa.Table:
            n = seen_state.offer_batch(shard_handles, batch)
            return pa.table({"n": pa.array([n], type=pa.int64())})

        if cfg.max_pages:
            accepted_ds.map_batches(offer, batch_format="pyarrow").materialize()
            claimed_ds = self._budgeted_claim(shards, total_requested)
        else:
            accepted_ds.map_batches(offer, batch_format="pyarrow").materialize()
            claimed_ds = ray.data.from_arrow_refs(
                seen_state.resolve_all(shards, FRONTIER_WITH_METHOD)
            )

        records_ds = claimed_ds.map_batches(
            FetchParseStage,
            fn_constructor_args=(corpus_ref, cfg_dict, budget_handle),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency,
            num_cpus=1,
        )
        records_ds.write_parquet(records_dir)

        # Outcome counts from the written checkpoint (prunes to one
        # dictionary-encoded column; no driver materialization of rows).
        counts: dict[str, int] = {}
        rt_files = glob.glob(os.path.join(records_dir, "*.parquet"))
        for f in rt_files:
            col = pq.read_table(f, columns=["record_type"]).column("record_type")
            for chunk_val, chunk_n in zip(*_value_counts(col)):
                counts[chunk_val] = counts.get(chunk_val, 0) + chunk_n
        n_accepted = sum(counts.values())

        # Expansion (pruned read; never touches the HTML column).
        next_dir = _gen_dir(self.out, "frontier", g + 1)
        if os.path.exists(next_dir):
            shutil.rmtree(next_dir)
        os.makedirs(next_dir, exist_ok=True)
        if rt_files:
            expand_ds = ray.data.read_parquet(records_dir, columns=EXPAND_COLUMNS)
            expanded = expand_ds.map_batches(
                ExpandStage(cfg_dict), batch_format="pyarrow"
            )
            expanded.write_parquet(next_dir)

        seen_dir = _gen_dir(self.out, "seen", g)
        seen_state.snapshot_all(shards, seen_dir)

        lineage_row = {
            "crawl_id": self.crawl_id,
            "generation": g,
            "seed_batch": 0,
            "n_candidates": n_candidates,
            "n_accepted": n_accepted,
            "n_pages": counts.get("page", 0),
            "n_errors": counts.get("error", 0),
            "n_redirects": counts.get("redirect", 0),
            "n_skipped": counts.get("skipped", 0) + counts.get("robots_excluded", 0),
            "wall_s": time.monotonic() - t0,
            "status": "complete",
        }
        os.makedirs(records_dir, exist_ok=True)
        with open(self._manifest_path(g), "w") as f:
            json.dump({"lineage": lineage_row}, f)
        return lineage_row

    # ---- budgeted (order-sensitive) claim ---------------------------
    def _budgeted_claim(self, shards, total_requested: int):
        """Deterministic max_pages budget: pending candidates (already
        min-key-deduped and unseen-filtered by the shards' offer pass)
        claim the remaining budget in canonical sorted-URL order
        (plugin.py:88-100 is order-sensitive, so this path is
        driver-sequenced; the collection is bounded by the crawl's
        configured budget)."""
        remaining = max(0, self.cfg.max_pages - total_requested)
        rows = [
            r
            for chunk in ray.get([s.pending_table.remote() for s in shards])
            for r in chunk
        ]
        ray.get([s.clear_pending.remote() for s in shards])
        if not rows or remaining == 0:
            return ray.data.from_arrow(FRONTIER_WITH_METHOD.empty_table())
        rows.sort(key=lambda r: r["url"])
        kept_rows = rows[:remaining]
        kept = pa.Table.from_pylist(kept_rows, schema=FRONTIER_WITH_METHOD)
        seen_state.claim_batch(
            shards,
            kept.column("url").to_pylist(),
            kept.column("url_hash").to_pylist(),
        )
        return ray.data.from_arrow(kept)

    def _finalize(self, status, failure_message, status_path, cfg_dict, t_start):
        with open(status_path, "w") as f:
            json.dump(
                {
                    "crawl_id": self.crawl_id,
                    "status": status,
                    "config": cfg_dict,
                    "failure_message": failure_message,
                    "wall_s": time.monotonic() - t_start,
                },
                f,
            )
        if self.lineage:
            pq.write_table(
                pa.Table.from_pylist(self.lineage, schema=LINEAGE_SCHEMA),
                os.path.join(self.out, "lineage.parquet"),
            )


def _value_counts(col: pa.ChunkedArray) -> tuple[list[str], list[int]]:
    vc = col.combine_chunks().value_counts()
    return (
        [v.as_py() for v in vc.field("values")],
        [c.as_py() for c in vc.field("counts")],
    )


class CrawlResult:
    """Accessors over the checkpoint directory (the crawl's tables)."""

    def __init__(self, out_dir: str, crawl_id: str = "crawl-0"):
        self.out = out_dir
        self.crawl_id = crawl_id

    def records_dataset(self, columns: list[str] | None = None) -> pads.Dataset:
        return pads.dataset(
            sorted(glob.glob(os.path.join(self.out, "records", "gen=*", "*.parquet")))
        )

    def records_table(self, columns: list[str] | None = None) -> pa.Table:
        return self.records_dataset().to_table(columns=columns)

    def ray_records(self, columns: list[str] | None = None):
        paths = sorted(glob.glob(os.path.join(self.out, "records", "gen=*", "*.parquet")))
        return ray.data.read_parquet(paths, columns=columns)

    def lineage_table(self) -> pa.Table:
        return pq.read_table(os.path.join(self.out, "lineage.parquet"))

    def seen_table(self) -> pa.Table:
        gens = sorted(glob.glob(os.path.join(self.out, "seen", "gen=*")))
        files = glob.glob(os.path.join(gens[-1], "*.parquet")) if gens else []
        if not files:
            return pa.table({"url": [], "url_hash": []})
        t = pa.concat_tables(pq.read_table(f) for f in files)
        return t.take(pa.compute.sort_indices(t, sort_keys=[("url", "ascending")]))

    def status(self) -> dict:
        with open(os.path.join(self.out, "crawl.json")) as f:
            return json.load(f)
