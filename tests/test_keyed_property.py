"""Property tests for the keyed-window partition bodies
(relational._asof_resolve / _range_resolve / _session_resolve): the
vectorized one-pass-per-partition implementations must equal a plain
per-key pandas reference on hypothesis-generated inputs — the same
oracle-vs-vectorized strategy the crawl predicate chain uses.

These run WITHOUT Ray: the resolve functions are pure
pa.Table -> pa.Table, exactly what one exchange reducer executes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from website_indexer_ray.pipelines.relational import (
    _asof_resolve,
    _range_resolve,
    _session_resolve,
)

_T0 = 1_700_000_000_000_000  # µs epoch base so timestamps stay realistic

keys = st.integers(min_value=0, max_value=5)
times = st.integers(min_value=0, max_value=100)  # coarse -> many ties


def _ts(v):
    return (_T0 + int(v) * 1_000_000) * np.int64(1)


orders_strategy = st.lists(
    st.tuples(keys, times, st.integers(min_value=1, max_value=999)),
    max_size=40,
)
events_strategy = st.lists(st.tuples(keys, times), max_size=40)


def _tagged_union(orders, events):
    rows = []
    for k, t, ok in orders:
        rows.append((k, _ts(t), 0, -1, ok))
    for i, (k, t) in enumerate(events):
        rows.append((k, _ts(t), 1, i, -1))
    return pa.table(
        {
            "key": pa.array([r[0] for r in rows], type=pa.int64()),
            "t": pa.array(
                [int(r[1]) for r in rows], type=pa.int64()
            ).cast(pa.timestamp("us")),
            "kind": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_id": pa.array([r[3] for r in rows], type=pa.int64()),
            "orderkey": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


class TestAsofProperty:
    @settings(max_examples=150, deadline=None)
    @given(orders=orders_strategy, events=events_strategy)
    def test_matches_per_key_pandas_ffill(self, orders, events):
        t = _tagged_union(orders, events)
        got = _asof_resolve(t).to_pandas().set_index("event_id")["last_orderkey"]
        # reference: per event, the max orderkey among same-key orders
        # at the latest order time <= event time
        for i, (k, et) in enumerate(events):
            cand = [
                (ot, ok) for (okk, ot, ok) in orders if okk == k and ot <= et
            ]
            if not cand:
                expected = -1
            else:
                tmax = max(ot for ot, _ in cand)
                expected = max(ok for ot, ok in cand if ot == tmax)
            assert got[i] == expected, (i, k, et, sorted(cand))


class TestRangeProperty:
    @settings(max_examples=150, deadline=None)
    @given(
        orders=st.lists(st.tuples(keys, times), max_size=40),
        events=events_strategy,
        window=st.integers(min_value=0, max_value=50),
    )
    def test_matches_per_key_count(self, orders, events, window):
        rows = []
        for k, t in orders:
            rows.append((k, _ts(t), 0, -1))
        for i, (k, t) in enumerate(events):
            rows.append((k, _ts(t), 1, i))
        t = pa.table(
            {
                "key": pa.array([r[0] for r in rows], type=pa.int64()),
                "t": pa.array(
                    [int(r[1]) for r in rows], type=pa.int64()
                ).cast(pa.timestamp("us")),
                "kind": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_id": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
        window_us = window * 1_000_000
        out = _range_resolve(window_us, t).to_pandas()
        got = out.set_index("event_id")["n_orders"]
        for i, (k, et) in enumerate(events):
            expected = sum(
                1
                for (okk, ot) in orders
                if okk == k and (et - window) * 1_000_000 < (ot * 1_000_000)
                and ot <= et
            )
            assert got[i] == expected, (i, k, et, window)


class TestSessionizeProperty:
    @settings(max_examples=150, deadline=None)
    @given(
        events=st.lists(st.tuples(keys, times), min_size=1, max_size=60),
        gap=st.integers(min_value=0, max_value=30),
    )
    def test_matches_per_key_gap_split(self, events, gap):
        t = pa.table(
            {
                "user_id": pa.array([k for k, _ in events], type=pa.int64()),
                "ts": pa.array(
                    [int(_ts(v)) for _, v in events], type=pa.int64()
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(
                    list(range(len(events))), type=pa.int64()
                ),
            }
        )
        # gap in the generator's coarse time units (1 unit = 1 s here)
        out = _session_resolve(gap * 1_000_000, t).to_pandas()
        got = out.set_index("user_id")
        df = pd.DataFrame(events, columns=["k", "t"])
        for k, g in df.groupby("k"):
            ts = np.sort(g["t"].to_numpy())
            n_sessions = 1 + int(np.sum(np.diff(ts) > gap))
            assert got.loc[k, "n_events"] == len(g)
            assert got.loc[k, "n_sessions"] == n_sessions, (k, ts.tolist(), gap)

    def test_empty_partition(self):
        t = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()).cast(pa.timestamp("us")),
                "event_id": pa.array([], type=pa.int64()),
            }
        )
        assert _session_resolve(0, t).num_rows == 0
