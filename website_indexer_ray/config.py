"""Crawl configuration — mirrors the reference's CrawlConfig
(/root/reference/crawler/models.py:12-16) plus the engine-level knobs
the distributed design needs. Serializable to a plain dict so it can
ride into map_batches workers and lineage records (models.py:41-43
serializes config to JSON the same way).
"""

from __future__ import annotations

import dataclasses
import re

# Reference skip list (plugin.py:22-32).
DEFAULT_SKIP_URLS = (
    r"^https://www.facebook.com/dialog/share\?.*",
    r"^https://twitter.com/intent/tweet\?.*",
    r"^https://x.com/intent/tweet\?.*",
    r"^https://www.linkedin.com/shareArticle\?.*",
)

# Reference HEAD-request list (plugin.py:34) — ours is configurable;
# tests use the synthetic files host.
DEFAULT_HEAD_URLS = ()


@dataclasses.dataclass
class CrawlConfig:
    # Reference-visible config (models.py:12-16).
    start_url: str = ""
    max_pages: int = 0
    depth: int = 0

    # Predicate chain configuration (plugin.py:22-34).
    skip_url_patterns: tuple = DEFAULT_SKIP_URLS
    head_url_patterns: tuple = DEFAULT_HEAD_URLS

    # Politeness / robots (crawler.py:35-37; reference: wait=0.5,
    # random wait, robots off).
    politeness_wait: float = 0.0
    random_wait: bool = False
    respect_robots: bool = False

    # Real-network client (crawler.py:38-47) — used when the engine
    # runs with corpus=None. host_map is a test-only /etc/hosts shim:
    # {hostname: (scheme, addr, port)}.
    user_agent: str = "CFPB website indexer"
    connect_timeout: float = 5.0
    read_timeout: float = 30.0
    session_timeout: float = 30.0
    host_map: dict | None = None

    # Engine knobs.
    # Priority frontier (north_star: BFS depth + same-domain priority):
    # within the generation barrier, budgeted claims take start-host
    # URLs before external ones. Off by default — the reference's
    # wpull order is plain BFS, and the oracle-equality tests pin that.
    prioritize_same_domain: bool = False
    canonical_profile: str = "reference"
    n_seen_shards: int = 8
    seen_shard_capacity: int = 1 << 16
    fetch_concurrency: int = 4
    fetch_batch_size: int = 256
    fetch_num_cpus: float = 1.0
    # Concurrent connections held by ONE fetch slot (task/actor).
    # wpull is a single async connection; a distributed fetcher
    # multiplexes several so a slot's wall-clock is bounded by
    # network RTTs / fetch_threads instead of their sum. Politeness
    # is unaffected: per-host pacing is enforced by absolute-time
    # slot targets (HostBudget / locked HostRateLimiter), which
    # threads respect regardless of which one carries the request.
    fetch_threads: int = 4
    # Fused frontier expansion: expand+predicate+offer run inside the
    # fetch stage on the just-parsed records (links still in memory),
    # so generation g+1 never re-reads generation g's checkpoint from
    # storage and the per-generation expansion job disappears. At
    # 100 TB that read-back is a full extra pass over the (pruned)
    # records per generation. The unfused phase A remains the gen-0 /
    # resume-entry path (and the oracle form).
    fused_expand: bool = True
    simulate_latency: bool = False
    salt_partitions: int = 1  # >1 ⇒ hot-host salting + shared HostBudget
    # Materialize the interleaved-span docs table (north_star output
    # shape) as a crawl artifact at finalize — one streaming
    # projection job over the records checkpoint, written through the
    # Lance seam (sources/lance_io).
    write_docs_table: bool = False
    max_generations: int = 64
    # Adaptive execution: generations whose input is below these row
    # thresholds run driver-side (pure-Python over the same stage
    # classes + the same seen-shard actors) instead of paying a Ray
    # Data job launch + actor-pool spin-up that dwarfs the work. At
    # scale only the first/last generations of a crawl are this small;
    # the mass generations always take the distributed path.
    # The driver path must catch only genuinely tiny generations, so
    # it gates on BOTH source rows and the candidate estimate read
    # free from the parquet footers (frontier_links leaf num_values):
    # a wide corpus expands 2k listing rows into 60k candidates, and
    # single-threading that on the driver costs far more than the job
    # launch it avoids.
    driver_threshold: int = 2048  # source rows for expand+predicate+offer
    driver_candidate_threshold: int = 4096  # est. candidates (footer link count)
    fetch_driver_threshold: int = 256  # claimed rows fetched driver-side

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["skip_url_patterns"] = list(self.skip_url_patterns)
        d["head_url_patterns"] = list(self.head_url_patterns)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "CrawlConfig":
        d = dict(d)
        d["skip_url_patterns"] = tuple(d.get("skip_url_patterns", ()))
        d["head_url_patterns"] = tuple(d.get("head_url_patterns", ()))
        return cls(**d)

    def compile_skip(self) -> list[re.Pattern]:
        return [re.compile(p) for p in self.skip_url_patterns]

    def compile_head(self) -> list[re.Pattern]:
        return [re.compile(p) for p in self.head_url_patterns]
