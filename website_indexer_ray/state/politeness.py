"""Per-host politeness: token buckets replacing the reference's global
inter-request sleep (``--wait=0.5 --random-wait``,
/root/reference/crawler/wpull/crawler.py:36-37).

The reference crawls one URL at a time, so a single global wait
suffices. Distributed, politeness must be *per host*: each fetcher
actor owns the budget for the hosts routed to it (the frontier is
host-partitioned), and when hot hosts are salted across several
partitions (north_rule skew handling) the salted partitions share one
``HostBudget`` actor so the per-host rate cap still holds globally.

``random_wait`` reproduces wget's semantics: multiply the base wait by
a uniform factor in [0.5, 1.5] — seeded per host for determinism.
"""

from __future__ import annotations

import random
import threading
import time

import ray


class HostRateLimiter:
    """In-actor per-host limiter (hosts not salted across actors)."""

    def __init__(
        self,
        wait: float = 0.0,
        random_wait: bool = False,
        seed: int = 42,
        clock=time.monotonic,
        sleep=time.sleep,
    ):
        self.wait = wait
        self.random_wait = random_wait
        self.seed = seed
        self.clock = clock
        self.sleep = sleep
        self.next_ok: dict[str, float] = {}
        # per-host overrides (robots.txt Crawl-delay); effective wait
        # for a host = max(configured wait, override) — honoring a
        # site's own stricter request never loosens the global cap
        self.host_wait: dict[str, float] = {}
        self.rngs: dict[str, random.Random] = {}
        # Multiplexed fetch slots (cfg.fetch_threads) share one
        # limiter: slot RESERVATION is locked, the sleep is not, so
        # concurrent threads each wait for their own absolute target
        # and per-host spacing survives any interleaving.
        self._lock = threading.Lock()

    def set_host_wait(self, host: str, wait: float) -> None:
        """Install a per-host minimum spacing (robots Crawl-delay)."""
        with self._lock:
            self.host_wait[host] = float(wait)

    def _wait_for(self, host: str) -> float:
        return max(self.wait, self.host_wait.get(host, 0.0))

    def _factor(self, host: str) -> float:
        if not self.random_wait:
            return 1.0
        rng = self.rngs.setdefault(host, random.Random(f"{self.seed}:{host}"))
        return rng.uniform(0.5, 1.5)

    def acquire(self, host: str) -> float:
        """Block until the host's next slot; returns seconds slept."""
        w = self._wait_for(host)
        if w <= 0:
            return 0.0
        with self._lock:
            now = self.clock()
            t = self.next_ok.get(host, now)
            delay = max(0.0, t - now)
            self.next_ok[host] = max(now, t) + w * self._factor(host)
        if delay > 0:
            self.sleep(delay)
        return delay


@ray.remote(num_cpus=0)
class HostBudget:
    """Shared budget for hosts salted across fetcher actors.

    ``reserve(host)`` hands out monotonically increasing wall-clock
    slots; callers sleep locally until their slot. This keeps the
    per-host rate cap global while the fetch work itself stays
    parallel across partitions.
    """

    def __init__(self, wait: float, random_wait: bool = False, seed: int = 42):
        self.limiter = HostRateLimiter(wait, random_wait, seed, sleep=lambda _: None)

    def reserve(self, host: str) -> float:
        """Returns seconds the caller must wait before fetching."""
        return self.reserve_n(host, 1)[0]

    def reserve_n(self, host: str, n: int) -> list[float]:
        """Reserve ``n`` consecutive slots for one host in a single
        RPC (the fetch stage calls this once per batch, not per row).
        Returns per-slot delays relative to now; callers sleep until
        ``t0 + delay[i]`` before request i."""
        lim = self.limiter
        w = lim._wait_for(host)
        if w <= 0:
            return [0.0] * n
        now = lim.clock()
        t = lim.next_ok.get(host, now)
        delays = []
        for _ in range(n):
            delays.append(max(0.0, t - now))
            t = max(now, t) + w * lim._factor(host)
        lim.next_ok[host] = t
        return delays

    def set_host_wait(self, host: str, wait: float) -> None:
        """Per-host Crawl-delay override (fetchers push a host's
        robots delay once; the global budget applies it to every
        salted partition of that host)."""
        self.limiter.set_host_wait(host, wait)
