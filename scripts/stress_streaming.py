"""Scale-stress the streaming shard state: feed 10^6 events through a
DistinctShard and a SessionShard while holding 10^3-10^4 windows /
user-carries OPEN (the watermark pinned behind the data), recording
per-shard state bytes (pickled snapshot size — what a checkpoint
actually writes) and snapshot/restore wall — the "state bounded by
open windows, independent of stream length" claim
(state/streaming.py) measured, not asserted.

Shards are exercised as plain objects (their Ray-actor wrapper adds
nothing to the state-size question); events are deterministic
(seeded RNG).  Two phases per shard:
  1. load: all 10^6 events arrive with the watermark held back, so
     every window/carry stays open — the worst-case state;
  2. drain: one max-ts tick finalizes everything; state must collapse.

Usage: python scripts/stress_streaming.py [n_events] [n_windows]
Prints one JSON line per shard and a summary line.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stress_distinct(n_events: int, n_windows: int) -> dict:
    from website_indexer_ray.state.streaming import DistinctShard, _splitmix64

    cls = DistinctShard.__ray_metadata__.modified_class  # plain class
    window_us = 3_600_000_000
    shard = cls.__new__(cls)
    cls.__init__(shard, window_us, lateness_us=0, p=12)

    rng = np.random.default_rng(7)
    ts = rng.integers(0, n_windows * window_us, n_events)
    users = rng.integers(0, 200_000, n_events)
    etypes = np.array(["click", "view", "purchase", "search"])
    ev = etypes[rng.integers(0, len(etypes), n_events)]

    load_s = 0.0  # shard-side time only (partial building is the
    # scan tasks' cost in the real pipeline, not the shard's)
    chunk = 50_000
    for lo in range(0, n_events, chunk):
        hi = min(n_events, lo + chunk)
        w = (ts[lo:hi] // window_us) * window_us
        h = _splitmix64(users[lo:hi])
        # group by (window, type) within the chunk (the partial's job)
        key = w * 8 + np.searchsorted(etypes, ev[lo:hi])
        order = np.argsort(key, kind="stable")
        ks, ws, hs = key[order], w[order], h[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(ks)) + 1, [len(ks)])
        )
        wins, types, arrays, counts = [], [], [], []
        evo = ev[lo:hi][order]
        for s, e in zip(bounds[:-1], bounds[1:]):
            wins.append(int(ws[s]))
            types.append(str(evo[s]))
            arrays.append(np.unique(hs[s:e]))
            counts.append(e - s)
        # max_ts held at 0: watermark never advances, all windows open
        t0 = time.perf_counter()
        shard.add(wins, types, arrays, counts, max_ts_us=0)
        load_s += time.perf_counter() - t0

    n_open = len(shard.open)
    t0 = time.perf_counter()
    snap = shard.snapshot()
    blob = pickle.dumps(snap)
    snap_s = time.perf_counter() - t0

    shard2 = cls.__new__(cls)
    cls.__init__(shard2, window_us, 0, p=12)
    t0 = time.perf_counter()
    shard2.restore(pickle.loads(blob))
    restore_s = time.perf_counter() - t0
    assert len(shard2.open) == n_open

    # drain: one tick past the last window closes everything
    shard.add([], [], [], [], max_ts_us=(n_windows + 1) * window_us)
    rows = shard.poll_finalized()
    return {
        "metric": "streaming_stress_distinct",
        "n_events": n_events,
        "open_windows_by_type": n_open,
        "load_s": round(load_s, 2),
        "events_per_s": round(n_events / load_s, 0),
        "state_bytes": len(blob),
        "bytes_per_open_window": round(len(blob) / max(n_open, 1)),
        "snapshot_s": round(snap_s, 3),
        "restore_s": round(restore_s, 3),
        "finalized_rows": len(rows),
        "open_after_drain": len(shard.open),
    }


def stress_session(n_events: int, n_users: int) -> dict:
    from website_indexer_ray.state.streaming import SessionShard

    cls = SessionShard.__ray_metadata__.modified_class if hasattr(
        SessionShard, "__ray_metadata__"
    ) else SessionShard
    gap_us = 1_800_000_000
    shard = cls.__new__(cls)
    cls.__init__(shard, gap_us, lateness_us=0)

    rng = np.random.default_rng(11)
    ts = np.sort(rng.integers(0, 86_400_000_000, n_events))
    users = rng.integers(0, n_users, n_events)

    t0 = time.perf_counter()
    chunk = 50_000
    for lo in range(0, n_events, chunk):
        hi = min(n_events, lo + chunk)
        # watermark trails the data by one chunk: carries stay live,
        # the buffer holds only the un-ripe tail (bounded disorder)
        shard.add(users[lo:hi], ts[lo:hi], max_ts_us=int(ts[lo]))
    load_s = time.perf_counter() - t0

    n_carries = len(shard.carry)
    buffered = int(sum(len(a) for a in shard.buf_u))
    t0 = time.perf_counter()
    blob = pickle.dumps(shard.snapshot())
    snap_s = time.perf_counter() - t0

    shard2 = cls.__new__(cls)
    cls.__init__(shard2, gap_us, 0)
    t0 = time.perf_counter()
    shard2.restore(pickle.loads(blob))
    restore_s = time.perf_counter() - t0
    assert len(shard2.carry) == n_carries

    rows = shard.flush()
    return {
        "metric": "streaming_stress_session",
        "n_events": n_events,
        "user_carries": n_carries,
        "buffered_tail_events": buffered,
        "load_s": round(load_s, 2),
        "events_per_s": round(n_events / load_s, 0),
        "state_bytes": len(blob),
        "bytes_per_carry": round(len(blob) / max(n_carries, 1)),
        "snapshot_s": round(snap_s, 3),
        "restore_s": round(restore_s, 3),
        "flushed_users": len(rows),
    }


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_windows = int(sys.argv[2]) if len(sys.argv) > 2 else 2500

    # 2500 windows x 4 types = 10^4 open (window, type) sketches
    print(json.dumps(stress_distinct(n_events, n_windows)), flush=True)
    print(json.dumps(stress_session(n_events, n_users=10_000)), flush=True)


if __name__ == "__main__":
    main()
