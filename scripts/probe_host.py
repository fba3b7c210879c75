"""Measure the measuring host: one JSON line of the probes used to
separate engine regressions from sandbox-host contention episodes
(BENCH/BASELINE.md round-5 forensics).

The signature of a contention episode: the bench's wide (32-CPU)
waves run 2-4x slow while every in-VM probe below stays healthy and
steal accounting reads zero — i.e. the physical host is throttling
wide waves invisibly. Run this BETWEEN bench windows; if it reads
healthy but the bench reads slow, record the window and re-run later
rather than chasing a code regression that isn't there.

Probes:
- single_thread_s: one 10^7-iteration Python loop (CPython speed).
- effective_cores: 32 concurrent copies; sum(work)/wall.
- sleep_p95_ms: p95 stretch of 50 ms sleeps across 64 threads (the
  crawl's simulated-latency waves are built on timers).
- ray_task_ms: mean round-trip of 1000 no-op Ray tasks.
- put_get_100mb_s: object-store 100 MB put+get.
- steal_share: delta steal/total from /proc/stat across the burn.

Usage: python scripts/probe_host.py [--no-ray]
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import multiprocessing as mp
import sys
import time


def _burn(_):
    t = time.perf_counter()
    s = 0
    for i in range(10**7):
        s += i
    return time.perf_counter() - t


def _stat():
    f = open("/proc/stat").readline().split()
    return [int(x) for x in f[1:9]]  # user nice sys idle iowait irq sirq steal


def _sleep_probe(_):
    errs = []
    for _ in range(10):
        t = time.perf_counter()
        time.sleep(0.05)
        errs.append(time.perf_counter() - t - 0.05)
    return errs


def main() -> None:
    out: dict = {"metric": "host_probe", "ts": time.time()}

    out["single_thread_s"] = round(_burn(None), 3)

    s0 = _stat()
    t0 = time.time()
    with mp.Pool(32) as p:
        times = p.map(_burn, range(32))
    wall = time.time() - t0
    s1 = _stat()
    d = [b - a for a, b in zip(s0, s1)]
    tot = sum(d) or 1
    out["effective_cores"] = round(sum(times) / wall, 1)
    out["burn32_wall_s"] = round(wall, 2)
    out["steal_share"] = round(d[7] / tot, 4)

    with cf.ThreadPoolExecutor(64) as ex:
        errs = [e for es in ex.map(_sleep_probe, range(64)) for e in es]
    errs.sort()
    out["sleep_p50_ms"] = round(errs[len(errs) // 2] * 1e3, 2)
    out["sleep_p95_ms"] = round(errs[int(len(errs) * 0.95)] * 1e3, 2)

    if "--no-ray" not in sys.argv:
        import numpy as np
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=32, include_dashboard=False)

        @ray.remote
        def f(x):
            return x + 1

        t = time.perf_counter()
        ray.get([f.remote(i) for i in range(1000)])
        out["ray_task_ms"] = round((time.perf_counter() - t), 3)
        t = time.perf_counter()
        ref = ray.put(np.zeros(100_000_000 // 8))
        ray.get(ref)
        out["put_get_100mb_s"] = round(time.perf_counter() - t, 3)
        ray.shutdown()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
