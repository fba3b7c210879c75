"""The crawl engine: a generation-based (breadth-first) frontier loop.

Replaces the reference's single-process wpull event loop
(/root/reference/crawler/wpull/crawler.py:27-62) with ONE Ray Data
pipeline per generation:

  (generation barrier: seen shards resolve pending claims atomically)
  claimed ──map_batches(FetchParseStage: fetch → parse →
            expand links → predicates → offer to sharded cuckoo
            actors, all while the parsed records are in memory)──►
     ──write_parquet──► records/gen=g/            (checkpoint)
  seen shards ──snapshot──► seen/gen=g/           (checkpoint)
  lineage row ──► _SUCCESS manifest               (completes gen g)

With ``cfg.fused_expand`` (default) frontier expansion runs inside the
fetch stage, so generation g+1 never re-reads generation g's
checkpoint — no frontier table is materialized beyond the gen-0
seeds, and no extra storage pass happens per generation. The
checkpoint-reading phase A (pruned read → ExpandStage → PredicateStage
→ offer) remains the gen-0 and resume-entry path: the records
checkpoint is the durable source of truth and pending offers are
re-derived from it after a restart. Tiny generations (seeds, BFS
tails) run driver-side through the same stage classes and shard actors
(adaptive thresholds in CrawlConfig) so fixed job overhead never
dominates; mass generations always take the distributed path.

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
candidate list (each shard returns only its sorted budget-sized
prefix, so the driver holds ≤ n_shards × budget rows) and
per-generation row counts read from Parquet footers.
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
from website_indexer_ray.stages.fetch import (
    CorpusIndex,
    FetchParseStage,
    fetch_parse_task,
)
from website_indexer_ray.stages.predicates import PredicateStage
from website_indexer_ray.state import seen as seen_state
from website_indexer_ray.util import cluster_cpus_cached as _cluster_cpus_cached
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


def _dir_link_values(directory: str) -> int:
    """Total frontier_links elements across a records checkpoint —
    the candidate-count estimate for the adaptive phase-A gate, read
    from parquet footers only (leaf-column num_values; no data IO)."""
    total = 0
    for f in glob.glob(os.path.join(directory, "*.parquet")):
        md = pq.read_metadata(f)
        if md.num_row_groups == 0:
            continue
        leaf = None
        for i in range(md.num_columns):
            if "frontier_links" in md.row_group(0).column(i).path_in_schema:
                leaf = i
                break
        if leaf is None:
            continue
        for rg in range(md.num_row_groups):
            total += md.row_group(rg).column(leaf).num_values
    return total


def _gen_dir(base: str, kind: str, g: int) -> str:
    return os.path.join(base, kind, f"gen={g:05d}")


class CrawlEngine:
    def __init__(self, cfg: CrawlConfig, out_dir: str, crawl_id: str = "crawl-0"):
        self.cfg = cfg
        self.out = out_dir
        self.crawl_id = crawl_id
        self.lineage: list[dict] = []
        self._driver_fetch = None  # persistent driver-side fetch stage
        self._corpus_dict: dict | None = None
        self._corpus_ref = None

    def _ensure_corpus(self, corpus):
        """corpus=None ⇒ real-network mode: the fetch stages build an
        HttpFetcher behind the same seam instead of a corpus lookup."""
        if corpus is None:
            return None
        if self._corpus_ref is None:
            if isinstance(corpus, dict):
                self._corpus_dict = corpus
                self._corpus_ref = ray.put(corpus)
            else:
                # Broadcast the Arrow table itself: zero-copy in the
                # object store (a pickled dict would be re-deserialized
                # in full by every worker process — O(corpus bytes) per
                # worker, paid inside the first timed fetch wave for
                # any worker the warm pass missed). Workers build only
                # the tiny url→row index (stages/fetch.CorpusIndex).
                self._corpus_dict = CorpusIndex(corpus)
                self._corpus_ref = ray.put(corpus)
        return self._corpus_ref

    def warm(self, corpus, n_tasks: int | None = None) -> None:
        """Pre-spawn fetch workers and populate their per-worker corpus
        caches (stages/fetch.py) before a timed run — a long-lived
        cluster is always in this state; in a fresh sandbox session the
        first big fan-out would otherwise pay worker spawn plus one
        corpus deserialize per worker inside the measurement."""
        import functools
        import json as _json

        # Pre-spawn the seen shards too (their actor spawn + first-call
        # pandas import is a session cost, not a crawl cost).
        if getattr(self, "_warm_shards", None) is None:
            self._warm_shards = seen_state.create_shards(
                self.cfg.n_seen_shards, self.cfg.seen_shard_capacity
            )
            ray.get([s.count.remote() for s in self._warm_shards])
        if corpus is None:
            return  # network mode: nothing to pre-broadcast
        cfg = self.cfg
        corpus_ref = self._ensure_corpus(corpus)
        n = n_tasks or 2 * cfg.fetch_concurrency
        dummy = pa.Table.from_pylist(
            [
                {
                    "url": f"warm://w{i}",
                    "url_hash": i,
                    "host": "warm",
                    "depth": 0,
                    "parent_url": "",
                    "parent_host": "",
                    "root_url": "",
                    "generation": 0,
                    "seed_batch": 0,
                    "method": "GET",
                }
                for i in range(n)
            ],
            schema=FRONTIER_WITH_METHOD,
        )
        fn = functools.partial(
            fetch_parse_task,
            corpus_ref=corpus_ref,
            cfg_json=_json.dumps(cfg.to_dict(), sort_keys=True),
            # The per-worker stage cache keys on the shard handles too
            # (fused expansion): warm with the SAME shards run() will
            # use, or the warmed stages (and their deserialized corpus)
            # would be cache misses in the timed run.
            shards=self._warm_shards if cfg.fused_expand else None,
        )
        (
            ray.data.from_arrow(dummy)
            .repartition(n)
            .map_batches(fn, batch_format="pyarrow", num_cpus=cfg.fetch_num_cpus)
            .materialize()
        )

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

        corpus_ref = self._ensure_corpus(corpus)

        shards = getattr(self, "_warm_shards", None) or seen_state.create_shards(
            cfg.n_seen_shards, cfg.seen_shard_capacity
        )
        self._warm_shards = None  # fresh shards per run() call
        # Fused-expansion state is per-run: the persistent driver-side
        # fetch stage holds shard handles, and offers are only "ready"
        # for a generation whose predecessor's fetch ran in THIS
        # process (a resumed crawl re-derives them from the records
        # checkpoint through the unfused phase A).
        self._driver_fetch = None
        self._offers_ready_gen: int | None = None
        # The per-host rate cap must hold GLOBALLY: with a wait
        # configured, every fetch path (driver, actor pool, salted)
        # paces through ONE shared HostBudget actor — per-actor
        # limiters would multiply the allowed rate by the pool size.
        budget_handle = (
            HostBudget.remote(cfg.politeness_wait, cfg.random_wait)
            if cfg.politeness_wait > 0
            else None
        )
        if cfg.respect_robots:
            from website_indexer_ray.state.robots import RobotsStore

            # Cluster-shared robots.txt body cache: every fetch actor
            # consults it before fetching, so each host's robots.txt
            # is requested ~once per crawl, not once per actor.
            self._robots_store = RobotsStore.remote()
        else:
            self._robots_store = None

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
                    rows = rec["lineage"]
                    if isinstance(rows, dict):  # single-row manifests
                        rows = [rows]
                    self.lineage.extend(rows)
                    total_requested += sum(r["n_accepted"] for r in rows)
                start_gen = last + 1

        if start_gen == 0:
            frontier0 = seeds_to_frontier(seeds, cfg)
            fdir = _gen_dir(self.out, "frontier", 0)
            os.makedirs(fdir, exist_ok=True)
            pq.write_table(frontier0, os.path.join(fdir, "part-0.parquet"))

        try:
            g = start_gen
            while g < cfg.max_generations:
                if g == 0 and _dir_num_rows(_gen_dir(self.out, "frontier", 0)) == 0:
                    break
                lineage_rows = self._run_generation(
                    g, corpus_ref, cfg_dict, shards, budget_handle, total_requested
                )
                gen_accepted = sum(r["n_accepted"] for r in lineage_rows)
                total_requested += gen_accepted
                self.lineage.extend(lineage_rows)
                g += 1
                if gen_accepted == 0:
                    break

            self._finalize("Finished", None, status_path, cfg_dict, t_start)
        except Exception:
            self._finalize(
                "Failed", traceback.format_exc(), status_path, cfg_dict, t_start
            )
            raise

        # The opt-in docs artifact is derived entirely from the
        # already-finalized records checkpoint — a failure here must
        # not demote an otherwise-complete crawl to Failed. Record it
        # as a status warning instead; the artifact is reproducible
        # from the checkpoint at any time.
        if cfg.write_docs_table:
            try:
                self._write_docs_table()
            except Exception:
                self._record_status_warning(
                    status_path, "docs_artifact", traceback.format_exc()
                )

        return CrawlResult(self.out, self.crawl_id)

    def _record_status_warning(self, status_path, key, message) -> None:
        with open(status_path) as f:
            status = json.load(f)
        status.setdefault("warnings", {})[key] = message
        with open(status_path, "w") as f:
            json.dump(status, f)

    def _write_docs_table(self) -> None:
        """Stream the interleaved-span docs projection (the
        BASELINE.json input_hint shape) from the records checkpoint
        into a ``docs/`` artifact via the Lance seam — pruned columns
        in, list<struct> spans out, no driver materialization."""
        from website_indexer_ray.functions.spans import (
            DOC_SOURCE_COLUMNS,
            docs_table_from_records,
        )
        from website_indexer_ray.sources import lance_io

        docs = CrawlResult(self.out, self.crawl_id).ray_records(
            columns=DOC_SOURCE_COLUMNS
        ).map_batches(docs_table_from_records, batch_format="pyarrow")
        lance_io.write_records(docs, os.path.join(self.out, "docs"))

    # ---- one generation --------------------------------------------
    def _run_generation(
        self,
        g: int,
        corpus_ref,
        cfg_dict: dict,
        shards: list,
        budget_handle,
        total_requested: int,
    ) -> list[dict]:
        cfg = self.cfg
        t0 = time.monotonic()
        records_dir = _gen_dir(self.out, "records", g)
        prev_records_dir = _gen_dir(self.out, "records", g - 1)
        if os.path.exists(records_dir):
            shutil.rmtree(records_dir)

        # ---- phase A: expand(prev records) → predicates → offer -----
        #
        # Generation g's candidates are derived directly from
        # generation g-1's records checkpoint (pruned read — never the
        # HTML column); there is no materialized frontier table beyond
        # the gen-0 seeds. Within-generation duplicate resolution and
        # the seen anti-join happen in one exchange: candidate rows are
        # routed to the seen shards (hash-partitioned on url_hash),
        # each shard keeps the canonical min-(depth, parent_url,
        # method) row per URL (deterministic winner — the oracle
        # mirrors this), and at the generation barrier ``resolve``
        # atomically claims every pending unseen URL. No groupby
        # shuffle; only slim candidate rows move, and winners flow back
        # as per-shard Arrow refs.
        #
        # Adaptive execution: a generation whose source is tiny (the
        # seed generation, BFS tails) runs phase A driver-side through
        # the SAME stage classes and shard actors — a Ray Data job
        # launch would be pure overhead. Mass generations take the
        # distributed pipeline.
        pred = PredicateStage(cfg_dict)
        shard_handles = shards

        if cfg.fused_expand and self._offers_ready_gen == g:
            # Phase A already happened inside generation g-1's fetch
            # stage (cfg.fused_expand): candidates were expanded,
            # predicate-filtered and offered while the parsed records
            # were still in memory. Drain the pre-predicate candidate
            # counts the fetch tasks banked on the shards — the
            # lineage n_candidates — and go straight to the claim
            # barrier. No read of the previous checkpoint happens.
            cand_by_batch = seen_state.take_cand_counts_all(shards)
            if os.environ.get("WIR_TIMING"):
                print(f"[timing] gen={g} phaseA=fused", flush=True)
            return self._claim_fetch_finish(
                g, corpus_ref, cfg_dict, shards, budget_handle,
                total_requested, cand_by_batch, records_dir, t0,
            )

        n_input = (
            _dir_num_rows(_gen_dir(self.out, "frontier", 0))
            if g == 0
            else _dir_num_rows(prev_records_dir)
        )
        est_candidates = 0 if g == 0 else _dir_link_values(prev_records_dir)
        if os.environ.get("WIR_TIMING"):
            print(
                f"[timing] gen={g}   est={time.monotonic()-t0:.2f}"
                f" (n_input={n_input} est_cand={est_candidates})",
                flush=True,
            )

        if (
            n_input <= cfg.driver_threshold
            and est_candidates <= cfg.driver_candidate_threshold
        ):
            if g == 0:
                src = pads.dataset(
                    glob.glob(os.path.join(_gen_dir(self.out, "frontier", 0), "*.parquet"))
                ).to_table()
                candidates = src.to_pylist()
            else:
                files = glob.glob(os.path.join(prev_records_dir, "*.parquet"))
                src = (
                    pads.dataset(files).to_table(columns=EXPAND_COLUMNS)
                    if files
                    else None
                )
                candidates = (
                    ExpandStage(cfg_dict).expand_rows(src.to_pylist()) if src is not None else []
                )
            from collections import Counter

            cand_by_batch: dict[int, int] = dict(
                Counter(r.get("seed_batch", 0) or 0 for r in candidates)
            )
            accepted = pred.process_rows(candidates)
            if accepted:
                seen_state.offer_batch(
                    shards,
                    pa.Table.from_pylist(accepted, schema=FRONTIER_WITH_METHOD),
                )
        else:
            if g == 0:
                cand_ds = ray.data.read_parquet(_gen_dir(self.out, "frontier", 0))
            else:
                cand_ds = ray.data.read_parquet(
                    prev_records_dir, columns=EXPAND_COLUMNS
                ).map_batches(ExpandStage(cfg_dict), batch_format="pyarrow")

            def pred_offer(batch: pa.Table) -> pa.Table:
                acc = pred(batch)
                if acc.num_rows:
                    seen_state.offer_batch(shard_handles, acc)
                vals, ns = _value_counts(batch.column("seed_batch"))
                return pa.table(
                    {
                        "seed_batch": pa.array(
                            [int(v) for v in vals], type=pa.int32()
                        ),
                        "n_in": pa.array(ns, type=pa.int64()),
                    }
                )

            cand_by_batch = {}
            for t in ray.get(
                cand_ds.map_batches(pred_offer, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            ):
                if t.num_rows and "seed_batch" in t.schema.names:
                    for sb, n in zip(
                        t.column("seed_batch").to_pylist(),
                        t.column("n_in").to_pylist(),
                    ):
                        cand_by_batch[sb] = cand_by_batch.get(sb, 0) + n

        if os.environ.get("WIR_TIMING"):
            print(f"[timing] gen={g} phaseA={time.monotonic()-t0:.2f}", flush=True)
        return self._claim_fetch_finish(
            g, corpus_ref, cfg_dict, shards, budget_handle,
            total_requested, cand_by_batch, records_dir, t0,
        )

    def _claim_fetch_finish(
        self,
        g: int,
        corpus_ref,
        cfg_dict: dict,
        shards: list,
        budget_handle,
        total_requested: int,
        cand_by_batch: dict,
        records_dir: str,
        t0: float,
    ) -> list[dict]:
        """Phase B (claim barrier + fetch + records checkpoint),
        seen snapshot, and the generation's lineage rows — shared by
        the checkpoint-reading phase A and the fused-expansion path."""
        cfg = self.cfg
        t_b = time.monotonic()
        # ---- phase B: claim barrier + fetch + records checkpoint ----
        fetch_thr = cfg.fetch_driver_threshold
        if cfg.simulate_latency or cfg.politeness_wait > 0:
            # latency-bound fetches must not serialize on the driver
            fetch_thr = min(fetch_thr, 8)

        n_pending = sum(
            ray.get([s.pending_count.remote() for s in shards])
        )

        counts: dict[tuple[int, str], int] = {}  # (seed_batch, record_type) → n
        offer_shards = shards if cfg.fused_expand else None
        if cfg.max_pages:
            claimed_tbl = self._budgeted_claim_table(shards, total_requested)
            self._fetch_table_or_ds(
                claimed_tbl, None, records_dir, corpus_ref, cfg_dict,
                budget_handle, counts, claimed_tbl.num_rows, offer_shards,
            )
        elif n_pending <= fetch_thr:
            rows = [
                r
                for chunk in ray.get([s.pending_table.remote() for s in shards])
                for r in chunk
            ]
            ray.get([s.clear_pending.remote() for s in shards])
            rows.sort(key=lambda r: r["url"])
            if rows:
                mask = seen_state.claim_batch(
                    shards,
                    [r["url"] for r in rows],
                    [r["url_hash"] for r in rows],
                )
                rows = [r for r, m in zip(rows, mask) if m]
            claimed_tbl = (
                pa.Table.from_pylist(rows, schema=FRONTIER_WITH_METHOD)
                if rows
                else FRONTIER_WITH_METHOD.empty_table()
            )
            self._fetch_table_or_ds(
                claimed_tbl, None, records_dir, corpus_ref, cfg_dict,
                budget_handle, counts, claimed_tbl.num_rows, offer_shards,
            )
        else:
            # Shards return their winners pre-chunked so the fetch
            # fan-out gets its block count directly from the barrier —
            # no repartition pass.
            chunks = 1
            if cfg.simulate_latency or cfg.politeness_wait > 0:
                # Target ~4 blocks per connection slot, not 1: one task
                # per slot makes the wave's tail as long as one whole
                # task (a straggler holds rows/slots × latency of work
                # nobody can steal), while 4× finer blocks let idle
                # slots pack the tail at a per-task dispatch cost that
                # is still ~1000× smaller than the block's fetch time.
                bs_est = max(
                    8, min(8192, -(-n_pending // (4 * cfg.fetch_concurrency)))
                )
                n_blocks = min(1024, -(-n_pending // bs_est))
                chunks = max(1, -(-n_blocks // cfg.n_seen_shards))
            claimed_ds = ray.data.from_arrow_refs(
                seen_state.resolve_all(shards, FRONTIER_WITH_METHOD, chunks)
            )
            self._fetch_table_or_ds(
                None, claimed_ds, records_dir, corpus_ref, cfg_dict,
                budget_handle, counts, n_pending, offer_shards,
            )
        if offer_shards is not None:
            # Generation g+1's candidates were offered (and counted)
            # by the fetch stage just now; its phase A is a no-op.
            self._offers_ready_gen = g + 1
        if os.environ.get("WIR_TIMING"):
            print(f"[timing] gen={g} phaseB={time.monotonic()-t_b:.2f}", flush=True)

        t_s = time.monotonic()
        seen_dir = _gen_dir(self.out, "seen", g)
        seen_state.snapshot_all(shards, seen_dir)
        if os.environ.get("WIR_TIMING"):
            print(f"[timing] gen={g} snapshot={time.monotonic()-t_s:.2f}", flush=True)

        # One lineage row per (generation, seed_batch) — the
        # north_rule's lineage key (seed batch, frontier generation,
        # fetch outcome counts).
        wall_s = time.monotonic() - t0
        sbs = sorted(set(cand_by_batch) | {sb for (sb, _t) in counts}) or [0]
        lineage_rows = []
        for sb in sbs:
            c = {t: n for (s, t), n in counts.items() if s == sb}
            lineage_rows.append(
                {
                    "crawl_id": self.crawl_id,
                    "generation": g,
                    "seed_batch": sb,
                    "n_candidates": cand_by_batch.get(sb, 0),
                    "n_accepted": sum(c.values()),
                    "n_pages": c.get("page", 0),
                    "n_errors": c.get("error", 0),
                    "n_redirects": c.get("redirect", 0),
                    "n_skipped": c.get("skipped", 0) + c.get("robots_excluded", 0),
                    "wall_s": wall_s,
                    "status": "complete",
                }
            )
        os.makedirs(records_dir, exist_ok=True)
        with open(self._manifest_path(g), "w") as f:
            json.dump({"lineage": lineage_rows}, f)
        return lineage_rows

    # ---- fetch dispatch ---------------------------------------------
    def _fetch_table_or_ds(
        self,
        claimed_tbl,
        claimed_ds,
        records_dir: str,
        corpus_ref,
        cfg_dict: dict,
        budget_handle,
        counts: dict[str, int],
        n_claimed: int,
        offer_shards: list | None = None,
    ) -> None:
        """Run the fetch+parse stage over the claimed URLs and write
        the records checkpoint, accumulating outcome counts.

        Driver path (``claimed_tbl``): the persistent driver-side
        ``FetchParseStage`` instance — politeness/robots state survives
        across generations, and no actor pool is spun up for a handful
        of URLs. Distributed path (``claimed_ds``): ``map_batches``
        actor pool with concurrency/batch size adapted to the claim
        count (latency-bound crawls get fine-grained batches so every
        actor stays busy; CPU-bound ones get large zero-copy batches).
        """
        cfg = self.cfg
        if claimed_tbl is not None:
            if claimed_tbl.num_rows == 0:
                os.makedirs(records_dir, exist_ok=True)
                return
            if self._driver_fetch is None:
                self._driver_fetch = FetchParseStage(
                    self._corpus_dict, cfg_dict, budget_handle,
                    getattr(self, "_robots_store", None),
                    shards=offer_shards,
                )
            records_tbl = self._driver_fetch(claimed_tbl)
            os.makedirs(records_dir, exist_ok=True)
            pq.write_table(
                records_tbl, os.path.join(records_dir, "part-driver.parquet")
            )
            _accumulate_counts(counts, records_tbl)
            return

        # Salted host partitioning (north_rule skew handling): when a
        # politeness budget is in force, co-locate each (host, salt)
        # slice in one map_groups task so per-host pacing is enforced
        # inside the task while hot hosts still spread across
        # salt_partitions parallel slices; the shared HostBudget actor
        # keeps the per-host rate cap global across those slices.
        if cfg.salt_partitions > 1 and budget_handle is not None:
            self._fetch_salted(
                claimed_ds, records_dir, corpus_ref, cfg_dict, budget_handle,
                offer_shards,
            )
            files = glob.glob(os.path.join(records_dir, "*.parquet"))
            if files:
                _accumulate_counts(
                    counts,
                    pads.dataset(files).to_table(
                        columns=["record_type", "seed_batch"]
                    ),
                )
            return

        stateless = (
            not cfg.respect_robots
            and cfg.politeness_wait == 0
            and budget_handle is None
        )
        conc = max(
            1,
            min(cfg.fetch_concurrency, -(-n_claimed // max(1, cfg.fetch_batch_size))),
        )
        bs = cfg.fetch_batch_size
        if cfg.simulate_latency or cfg.politeness_wait > 0:
            # latency-bound: one wave of exactly fetch_concurrency
            # long-running tasks — the configured aggregate connection
            # budget (which scales with cluster size). Block fan-out
            # comes from the shards' chunked resolve (resolve_all
            # chunks_per_shard targets one block per connection slot);
            # batch_size=None makes each of those blocks exactly one
            # task. Re-deriving a row-count batch_size here instead
            # loses a coin flip to rounding: a block one row SMALLER
            # than the computed batch_size gets bundled with its
            # neighbor — two blocks per task — halving the effective
            # connection parallelism the slot math just set up.
            bs = None
            conc = max(conc, min(cfg.fetch_concurrency, n_claimed))
        if stateless:
            # Task path: Ray reuses warm worker processes across jobs,
            # so there is no per-generation pool spin-up; the corpus
            # broadcast is cached per worker (stages/fetch.py).
            import functools
            import json as _json

            fn = functools.partial(
                fetch_parse_task,
                corpus_ref=corpus_ref,
                cfg_json=_json.dumps(cfg_dict, sort_keys=True),
                shards=offer_shards,
            )
            records_ds = claimed_ds.map_batches(
                fn,
                batch_format="pyarrow",
                batch_size=bs,
                num_cpus=cfg.fetch_num_cpus,
            )
        else:
            records_ds = claimed_ds.map_batches(
                FetchParseStage,
                fn_constructor_args=(
                    corpus_ref, cfg_dict, budget_handle,
                    getattr(self, "_robots_store", None),
                    offer_shards,
                ),
                batch_format="pyarrow",
                batch_size=bs,
                # Autoscaling pool: start fetching with whatever
                # actors schedule immediately; a fixed-size pool would
                # block the generation on full pool placement when
                # other stages hold CPU reservations.
                concurrency=(1, conc) if conc > 1 else 1,
                num_cpus=cfg.fetch_num_cpus,
            )
        t_w = time.monotonic()
        # Write tasks are IO-bound parquet encodes that sit idle while
        # the latency wave drains, but the streaming executor's
        # allocator reserves their full default CPU against the fetch
        # op's budget — and the reservation split is slightly
        # size-dependent, which is exactly the asymmetry the scaling
        # measurement is sensitive to. A fractional reservation lets
        # the fetch wave claim its configured slots-per-CPU at every
        # cluster size.
        # concurrency bounds ADMISSION (each write task holds an input
        # block + its encoded buffer) so the fractional reservation
        # can't quadruple peak write memory on a tight node.
        records_ds.write_parquet(
            records_dir,
            ray_remote_args={"num_cpus": 0.25},
            concurrency=_cluster_cpus_cached(),
        )
        if os.environ.get("WIR_TIMING"):
            print(f"[timing]   fetch+write={time.monotonic()-t_w:.2f}", flush=True)
        t_c = time.monotonic()
        # Outcome counts from the written checkpoint (prunes to two
        # slim columns; no driver materialization of rows). One
        # multi-threaded dataset read — a fetch wave writes one file
        # per task, and a per-file read_table loop pays file-open
        # latency hundreds of times over.
        files = glob.glob(os.path.join(records_dir, "*.parquet"))
        if files:
            _accumulate_counts(
                counts,
                pads.dataset(files).to_table(columns=["record_type", "seed_batch"]),
            )
        if os.environ.get("WIR_TIMING"):
            print(f"[timing]   counts={time.monotonic()-t_c:.2f}", flush=True)

    def _fetch_salted(
        self, claimed_ds, records_dir: str, corpus_ref, cfg_dict, budget_handle,
        offer_shards: list | None = None,
    ) -> None:
        """groupby(host, salt) → map_groups fetch: the explicit salted
        host shuffle (SURVEY.md §4.2). salt = url_hash % S defuses
        hot-host partition skew; the group task paces its host via the
        shared HostBudget actor (state/politeness.py)."""
        import functools
        import json as _json

        import numpy as np

        cfg = self.cfg
        S = cfg.salt_partitions

        def add_salt(batch: pa.Table) -> pa.Table:
            salt = (
                np.asarray(
                    batch.column("url_hash").to_numpy(zero_copy_only=False)
                )
                % S
            ).astype(np.int32)
            return batch.append_column("salt", pa.array(salt, type=pa.int32()))

        fn = functools.partial(
            fetch_parse_task,
            corpus_ref=corpus_ref,
            cfg_json=_json.dumps(cfg_dict, sort_keys=True),
            budget_handle=budget_handle,
            robots_handle=getattr(self, "_robots_store", None),
            shards=offer_shards,
        )
        records_ds = (
            claimed_ds.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["host", "salt"])
            .map_groups(fn, batch_format="pyarrow", num_cpus=cfg.fetch_num_cpus)
        )
        # Same fractional write reservation as the unsalted path (the
        # write op's default reservation starves the fetch budget),
        # admission-bounded to ~one write task per CPU.
        records_ds.write_parquet(
            records_dir,
            ray_remote_args={"num_cpus": 0.25},
            concurrency=_cluster_cpus_cached(),
        )

    # ---- budgeted (order-sensitive) claim ---------------------------
    def _budgeted_claim_table(self, shards, total_requested: int) -> pa.Table:
        """Deterministic max_pages budget: pending candidates (already
        min-key-deduped and unseen-filtered by the shards' offer pass)
        claim the remaining budget in canonical sorted-URL order
        (plugin.py:88-100 is order-sensitive, so this path is
        driver-sequenced). Each shard returns only its sorted
        budget-sized prefix (pending_topk) and the driver k-way merges
        — the collection is bounded by n_shards x remaining even when
        the pending set is vastly larger than the budget."""
        remaining = max(0, self.cfg.max_pages - total_requested)
        priority_host = (
            hostname_with_port(self.cfg.start_url)
            if self.cfg.prioritize_same_domain
            else None
        )
        rows = (
            [
                r
                for chunk in ray.get(
                    [
                        s.pending_topk.remote(remaining, priority_host)
                        for s in shards
                    ]
                )
                for r in chunk
            ]
            if remaining
            else []
        )
        ray.get([s.clear_pending.remote() for s in shards])
        if not rows or remaining == 0:
            return FRONTIER_WITH_METHOD.empty_table()
        if priority_host is not None:
            rows.sort(key=lambda r: (r["host"] != priority_host, r["url"]))
        else:
            rows.sort(key=lambda r: r["url"])
        kept_rows = rows[:remaining]
        kept = pa.Table.from_pylist(kept_rows, schema=FRONTIER_WITH_METHOD)
        seen_state.claim_batch(
            shards,
            kept.column("url").to_pylist(),
            kept.column("url_hash").to_pylist(),
        )
        return kept

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


def _accumulate_counts(counts: dict, tbl: pa.Table) -> None:
    """Accumulate (seed_batch, record_type) outcome counts from a
    pruned two-column records table — the per-partition lineage
    accounting (north_rule), never a row materialization."""
    grouped = (
        tbl.group_by(["seed_batch", "record_type"]).aggregate([([], "count_all")])
    )
    for sb, rt, n in zip(
        grouped.column("seed_batch").to_pylist(),
        grouped.column("record_type").to_pylist(),
        grouped.column("count_all").to_pylist(),
    ):
        key = (int(sb or 0), rt)
        counts[key] = counts.get(key, 0) + n


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

    def _records_paths(self) -> list[str]:
        """Compacted layout (manage.compact_crawl) when its _SUCCESS
        manifest exists, else the per-generation checkpoint."""
        compact = os.path.join(self.out, "records-compact")
        if os.path.exists(os.path.join(compact, "_SUCCESS")):
            return sorted(glob.glob(os.path.join(compact, "*.parquet")))
        return sorted(
            glob.glob(os.path.join(self.out, "records", "gen=*", "*.parquet"))
        )

    def records_dataset(self, columns: list[str] | None = None) -> pads.Dataset:
        return pads.dataset(self._records_paths())

    def records_table(self, columns: list[str] | None = None) -> pa.Table:
        return self.records_dataset().to_table(columns=columns)

    def ray_records(self, columns: list[str] | None = None):
        return ray.data.read_parquet(self._records_paths(), columns=columns)

    def ray_docs(self):
        """The materialized interleaved-docs artifact (docs/ — written
        when CrawlConfig.write_docs_table), through the Lance seam."""
        from website_indexer_ray.sources import lance_io

        path = os.path.join(self.out, "docs")
        if not (os.path.isdir(path) or os.path.isdir(path + ".lance")):
            raise FileNotFoundError(
                f"{path}: crawl was run without write_docs_table"
            )
        return lance_io.read_records(
            path if os.path.isdir(path) else path + ".lance"
        )

    def lineage_table(self) -> pa.Table:
        return pq.read_table(os.path.join(self.out, "lineage.parquet"))

    def seen_dir_latest(self) -> str:
        gens = sorted(glob.glob(os.path.join(self.out, "seen", "gen=*")))
        return gens[-1] if gens else os.path.join(self.out, "seen")

    def ray_seen(self):
        """Final seen snapshot as a Dataset (shard files of the last
        completed generation — already url-sorted within each shard)."""
        files = glob.glob(os.path.join(self.seen_dir_latest(), "*.parquet"))
        # columns= prunes the hive "gen=N" partition column the path
        # pattern would otherwise inject.
        return ray.data.read_parquet(files, columns=["url", "url_hash"])

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
