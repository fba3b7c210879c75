"""Relational operator demonstrations over the driver's TPC-H-ish
tables — each maps a SURVEY.md §2 operator class onto an
SQL-oracle-checkable pipeline and shows the scale pattern (partial
aggregation before the shuffle, pruned reads, vectorized kernels).

Money sums are computed in scaled integer space
(``round(price*100)`` etc.) so Ray's and DuckDB's different summation
orders produce bit-identical results (float addition is not
associative; integer addition is).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum


def _to_table(ds) -> pa.Table:
    from website_indexer_ray.util import collect_table

    return collect_table(ds)


def agg_lineitem(sf_dir: str) -> pa.Table:
    """TPC-H Q1-shaped grouped aggregate (A1/A3/A4 operator class) with
    per-batch partial aggregation before the groupby shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Zero-copy Arrow partials: scaled-integer money columns +
        # pyarrow group_by (no Arrow→pandas→Arrow round trip).
        qty = pc.cast(pc.round(batch.column("l_quantity")), pa.int64())
        price_c = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        disc_c = pc.cast(
            pc.round(
                pc.multiply(pc.subtract(1.0, batch.column("l_discount")), 100.0)
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": qty,
                "price_c": price_c,
                "revenue_c4": pc.multiply(price_c, disc_c),
                "n": pa.array([1] * batch.num_rows, type=pa.int64()),
            }
        )
        from website_indexer_ray.util import agg_named

        return agg_named(
            t,
            ["l_returnflag", "l_linestatus"],
            [("qty", "sum"), ("price_c", "sum"), ("revenue_c4", "sum"), ("n", "sum")],
            ["l_returnflag", "l_linestatus", "qty", "price_c", "revenue_c4", "n"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_c", alias_name="sum_price_c"),
            Sum("revenue_c4", alias_name="sum_revenue_c4"),
            Sum("n", alias_name="n_rows"),
        )
    )
    tbl = _to_table(out)
    return tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[("l_returnflag", "ascending"), ("l_linestatus", "ascending")],
        )
    )


def top_revenue_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k by aggregated revenue (O-class: sort/limit after a keyed
    aggregate; partials shrink the shuffle to one row per key/batch)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        price_c = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        disc_c = pc.cast(
            pc.round(
                pc.multiply(pc.subtract(1.0, batch.column("l_discount")), 100.0)
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "revenue_c4": pc.multiply(price_c, disc_c),
            }
        )
        from website_indexer_ray.util import agg_named

        return agg_named(
            t, "l_orderkey", [("revenue_c4", "sum")], ["l_orderkey", "revenue_c4"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    # Final merge: partials are one row per (key, batch) — a tiny
    # table — so the combine runs on the driver. At 10^9+ key
    # cardinality this flips to a hash-partitioned groupby; top-k
    # itself never needs a full sort (per-partition top-k, then merge).
    from website_indexer_ray.util import agg_named

    merged = agg_named(
        _to_table(partials),
        "l_orderkey",
        [("revenue_c4", "sum")],
        ["l_orderkey", "revenue_c4"],
    )
    order = pc.sort_indices(
        merged,
        sort_keys=[("revenue_c4", "descending"), ("l_orderkey", "ascending")],
    )
    return merged.take(order.slice(0, k))


def events_stats(sf_dir: str) -> pa.Table:
    """Count/Min/Max timestamp stats (A1 — the reference's crawl_stats
    aggregate, viewer/context_processors.py:6-27)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    from ray.data.aggregate import Count, Max, Min

    res = ds.aggregate(Count(alias_name="n"), Min("ts", alias_name="min_ts"), Max("ts", alias_name="max_ts"))
    return pa.table(
        {
            "n": pa.array([res["n"]], type=pa.int64()),
            "min_ts": pa.array([res["min_ts"]], type=pa.timestamp("us")),
            "max_ts": pa.array([res["max_ts"]], type=pa.timestamp("us")),
        }
    )


def status_counts(sf_dir: str) -> pa.Table:
    """Per-type outcome counts (A3 — plugin.py:219-255 accounting)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        from website_indexer_ray.util import agg_named

        return agg_named(
            batch, "event_type", [([], "count_all")], ["event_type", "n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby("event_type").aggregate(Sum("n", alias_name="n"))
    tbl = _to_table(out)
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("event_type", "ascending")]))


def distinct_sources(sf_dir: str) -> pa.Table:
    """Global distinct dimension (A4/D4 — the reference's unique
    Component/Link tables, models.py:84-95)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    values = sorted(ds.unique("source"))
    return pa.table({"source": pa.array(values, type=pa.string())})


def pagination_orders(sf_dir: str, page: int = 2, page_size: int = 25) -> pa.Table:
    """Sorted LIMIT/OFFSET window (O3 — viewer pagination,
    settings.py:131). Sort is the shuffle; the window take is tiny."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    window = ds.sort("o_orderkey").limit(page * page_size)
    tbl = _to_table(window)
    return tbl.slice((page - 1) * page_size, page_size)


def filter_chain_events(sf_dir: str) -> pa.Table:
    """Multi-predicate vectorized filter chain (F-rule analog over
    events: type membership + numeric threshold + regex on props).
    Table form for the driver contract; at scale use
    ``filter_chain_events_ds`` / ``_write`` — match-set output is
    O(matches), unbounded for a common predicate at 100 TB."""
    out = _to_table(filter_chain_events_ds(sf_dir))
    return out.take(pc.sort_indices(out, sort_keys=[("event_id", "ascending")]))


def filter_chain_events_ds(sf_dir: str):
    """Streaming Dataset form of ``filter_chain_events`` — the match
    set never concatenates on the driver; consume with write_parquet /
    iter_batches or the ``_write`` sink."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value", "props"],
    )

    def predicate(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(
                batch.column("event_type"),
                value_set=pa.array(["click", "purchase"]),
            ),
            pc.greater(batch.column("value"), 50.0),
        )
        mask = pc.and_(
            mask, pc.match_substring_regex(batch.column("props"), r'"k": [0-9]*[02468]}')
        )
        return batch.filter(mask).select(["event_id", "user_id"])

    return ds.map_batches(predicate, batch_format="pyarrow")


def filter_chain_events_write(sf_dir: str, out_dir: str) -> None:
    """Sink form: matches stream straight to partitioned parquet under
    the commit protocol — nothing O(matches) driver-side."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(filter_chain_events_ds(sf_dir), out_dir)


def window_counts(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate (1-hour windows) over the events
    stream — the windowed-aggregate operator class the reference
    lacks, built per the guide's composition rule: assign the window
    key inside ``map_batches`` (pure per-row arithmetic, no state),
    pre-aggregate per batch, then a small keyed merge. At 100 TB the
    partial tables are one row per (window, type, batch) — the only
    shuffle input. Value sums are in scaled integer cents so Ray's and
    DuckDB's float summation orders can't drift."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "window_start": pc.floor_temporal(batch.column("ts"), unit="hour"),
                "event_type": batch.column("event_type"),
                "value_c": pc.cast(
                    pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64()
                ),
                "n": pa.array([1] * batch.num_rows, type=pa.int64()),
            }
        )
        from website_indexer_ray.util import agg_named

        return agg_named(
            t,
            ["window_start", "event_type"],
            [("value_c", "sum"), ("n", "sum")],
            ["window_start", "event_type", "value_c", "n"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("value_c", alias_name="sum_value_c"),
        Sum("n", alias_name="n"),
    )
    tbl = _to_table(out)
    return tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[("window_start", "ascending"), ("event_type", "ascending")],
        )
    )


# --- keyed-window partition bodies ----------------------------------
# Module-level pure functions (pa.Table -> pa.Table) so they are
# property-testable without Ray and picklable into the exchange's
# reducer actors. Each resolves EVERY key in its partition in one
# vectorized pass — no per-key Python call anywhere.


def _asof_resolve(t: pa.Table) -> pa.Table:
    key = t.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    ts = ts.view(np.int64)
    kind = t.column("kind").to_numpy(zero_copy_only=False)
    ev_id = t.column("event_id").to_numpy(zero_copy_only=False)
    okey = t.column("orderkey").to_numpy(zero_copy_only=False)
    # one lexsort for ALL keys in the partition: orders before
    # events at equal t (kind asc), max orderkey last within a tie
    order = np.lexsort((okey, kind, ts, key))
    key_s, kind_s = key[order], kind[order]
    ev_s, ok_s = ev_id[order], okey[order]
    pos = np.arange(len(key_s), dtype=np.int64)
    last_order_pos = np.where(kind_s == 0, pos, np.int64(-1))
    np.maximum.accumulate(last_order_pos, out=last_order_pos)
    grp_first = np.ones(len(key_s), dtype=bool)
    grp_first[1:] = key_s[1:] != key_s[:-1]
    grp_start = np.maximum.accumulate(np.where(grp_first, pos, np.int64(0)))
    # a fill from before this key's first row is another customer's
    valid = last_order_pos >= grp_start
    filled = np.where(valid, ok_s[np.clip(last_order_pos, 0, None)], np.int64(-1))
    mask = kind_s == 1
    return pa.table(
        {
            "event_id": pa.array(ev_s[mask], type=pa.int64()),
            "last_orderkey": pa.array(filled[mask], type=pa.int64()),
        }
    )


def _range_resolve(window_us: int, t: pa.Table) -> pa.Table:
    key = t.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    ts = ts.view(np.int64)
    kind = t.column("kind").to_numpy(zero_copy_only=False)
    ev_id = t.column("event_id").to_numpy(zero_copy_only=False)

    is_order = kind == 0
    okey, ots = key[is_order], ts[is_order]
    ekey, ets = key[~is_order], ts[~is_order]
    eid = ev_id[~is_order].astype(np.int64)
    n_ev = len(ekey)
    # two probes per event: count(t' <= ts) and count(t' <= ts-w)
    pkey = np.concatenate([okey, ekey, ekey])
    pts = np.concatenate([ots, ets, ets - np.int64(window_us)])
    probe = np.concatenate(
        [np.zeros(len(okey), dtype=np.int8), np.ones(2 * n_ev, dtype=np.int8)]
    )
    sign = np.concatenate(
        [
            np.zeros(len(okey), dtype=np.int64),
            np.ones(n_ev, dtype=np.int64),
            -np.ones(n_ev, dtype=np.int64),
        ]
    )
    ev_idx = np.concatenate(
        [
            np.zeros(len(okey), dtype=np.int64),
            np.arange(n_ev, dtype=np.int64),
            np.arange(n_ev, dtype=np.int64),
        ]
    )
    # orders sort before probes at equal (key, t) → probe sees
    # `count(t' <= X)` (searchsorted side="right" semantics)
    order = np.lexsort((probe, pts, pkey))
    key_s = pkey[order]
    probe_s = probe[order]
    sign_s = sign[order]
    ev_idx_s = ev_idx[order]
    pos = np.arange(len(key_s), dtype=np.int64)
    cum = np.cumsum(probe_s == 0)  # inclusive order count
    grp_first = np.ones(len(key_s), dtype=bool)
    grp_first[1:] = key_s[1:] != key_s[:-1]
    grp_start = np.maximum.accumulate(np.where(grp_first, pos, np.int64(0)))
    base = cum[grp_start] - (probe_s[grp_start] == 0)
    within = cum - base  # orders of this key at or before this row
    counts = np.zeros(n_ev, dtype=np.int64)
    pm = probe_s == 1
    np.add.at(counts, ev_idx_s[pm], sign_s[pm] * within[pm])
    return pa.table(
        {
            "event_id": pa.array(eid, type=pa.int64()),
            "n_orders": pa.array(counts, type=pa.int64()),
        }
    )


def _session_resolve(gap_us: int, t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_sessions": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    ts = ts.view(np.int64)
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    uid_s, ts_s = uid[order], ts[order]
    new_user = np.ones(len(uid_s), dtype=bool)
    new_user[1:] = uid_s[1:] != uid_s[:-1]
    dt = np.empty(len(ts_s), dtype=np.int64)
    dt[0] = 0
    dt[1:] = ts_s[1:] - ts_s[:-1]
    new_session = new_user | (dt > np.int64(gap_us))
    ui = np.cumsum(new_user) - 1  # dense per-user run index
    users = uid_s[new_user]
    return pa.table(
        {
            "user_id": pa.array(users, type=pa.int64()),
            "n_sessions": pa.array(
                np.bincount(ui, weights=new_session).astype(np.int64),
                type=pa.int64(),
            ),
            "n_events": pa.array(
                np.bincount(ui).astype(np.int64), type=pa.int64()
            ),
        }
    )


def asof_last_order(sf_dir: str) -> pa.Table:
    """As-of join: for every event, the latest order of the same
    customer at or before the event time (ties on order date broken by
    max o_orderkey; -1 when the customer has no prior order).

    A custom wide operator Ray Data lacks, composed per the guide:
    tag both sides into one slim (key, time, kind, payload) relation,
    hash-co-partition through the actor-reducer exchange
    (state/exchange.py — NOT sort-based groupby+map_groups, which pays
    a Python call and a pandas conversion per key), and resolve each
    whole partition in ONE vectorized pass: lexsort by
    (key, t, kind, orderkey), forward-fill the last order position
    with ``np.maximum.accumulate``, and invalidate fills that cross a
    key boundary by comparing against each row's group-start index.
    Only the four slim join columns shuffle, never the wide source
    rows. Partitioning assumption: one partition (all rows of the keys
    hashing to it) fits a reducer's heap — size ``n_reducers`` up, not
    the algorithm, as key volume grows."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "key": b.column("o_custkey"),
                "t": pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                "kind": pa.array([0] * n, type=pa.int64()),
                "event_id": pa.array([-1] * n, type=pa.int64()),
                "orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            }
        )

    def tag_events(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "key": b.column("user_id"),
                "t": pc.cast(b.column("ts"), pa.timestamp("us")),
                "kind": pa.array([1] * n, type=pa.int64()),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "orderkey": pa.array([-1] * n, type=pa.int64()),
            }
        )

    unioned = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow")
    )

    from website_indexer_ray.state.exchange import hash_exchange

    tbl = hash_exchange(unioned, "key", _asof_resolve)
    if tbl is None:
        return pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "last_orderkey": pa.array([], type=pa.int64()),
            }
        )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("event_id", "ascending")]))


def range_join_orders(sf_dir: str, days: int = 30) -> pa.Table:
    """Range join: for every event, the number of the same customer's
    orders dated in the trailing window (ts - days, ts] — the
    interval-predicate join class (as-of's sibling), composed the same
    way: tag both sides into one slim keyed relation, hash-co-partition
    through the actor-reducer exchange, and resolve each whole
    partition in ONE vectorized pass — every event expands to two
    probe rows (window end at ts, window start at ts-days), one
    lexsort interleaves probes with the order rows, and an order-count
    cumsum read off at each probe position gives `count(t' <= X)`;
    hi-probe minus lo-probe is the trailing-window count. No per-key
    Python call, no per-pair scan; only the slim join columns
    shuffle."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "key": b.column("o_custkey"),
                "t": pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                "kind": pa.array([0] * n, type=pa.int64()),
                "event_id": pa.array([-1] * n, type=pa.int64()),
            }
        )

    def tag_events(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "key": b.column("user_id"),
                "t": pc.cast(b.column("ts"), pa.timestamp("us")),
                "kind": pa.array([1] * n, type=pa.int64()),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
            }
        )

    unioned = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow")
    )
    window_us = int(days) * 86_400_000_000

    from functools import partial

    from website_indexer_ray.state.exchange import hash_exchange

    tbl = hash_exchange(unioned, "key", partial(_range_resolve, window_us))
    if tbl is None:
        return pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "n_orders": pa.array([], type=pa.int64()),
            }
        )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("event_id", "ascending")]))


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Session windows over the event stream: a user's events belong
    to one session until a gap > ``gap_minutes`` (the classic
    streaming sessionization, expressed per the engine's rule for
    keyed stateful windows: hash-co-partition on user_id through the
    actor-reducer exchange, then ONE vectorized pass per partition —
    lexsort by (user, ts), session starts where the user changes or
    the gap-diff exceeds the threshold, per-user sums via bincount
    over the run index). Returns per-user (n_sessions, n_events)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap_us = int(gap_minutes) * 60_000_000

    from functools import partial

    from website_indexer_ray.state.exchange import hash_exchange

    tbl = hash_exchange(ds, "user_id", partial(_session_resolve, gap_us))
    if tbl is None:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_sessions": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("user_id", "ascending")]))


def _cum_resolve(t: pa.Table) -> pa.Table:
    """Partition body for the cumulative window: lexsort by
    (custkey, date, orderkey), then one global cumsum with the
    per-group start offset subtracted — vectorized running totals for
    every customer in the partition at once."""
    import numpy as np

    cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
    date = t.column("date_us").to_numpy(zero_copy_only=False)
    okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
    price = t.column("price_c").to_numpy(zero_copy_only=False)
    order = np.lexsort((okey, date, cust))
    cust, okey, price = cust[order], okey[order], price[order]
    run = np.cumsum(price)
    starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
    lens = np.diff(np.r_[starts, len(cust)])
    # offset per row = cumulative total before its group started
    offs = np.repeat(np.r_[0, run[starts[1:] - 1]], lens)
    return pa.table(
        {
            "o_orderkey": pa.array(okey, type=pa.int64()),
            "o_custkey": pa.array(cust, type=pa.int64()),
            "cum_price_c": pa.array(run - offs, type=pa.int64()),
        }
    )


def cumulative_revenue(sf_dir: str, sink_dir: str | None = None) -> pa.Table:
    """Cumulative-window aggregate (the running-total window-function
    class: SUM() OVER (PARTITION BY key ORDER BY ts)): each order's
    running total of integer-cent o_totalprice per customer, ordered
    by (o_orderdate, o_orderkey).

    Scale shape: slim (custkey, orderkey, date, cents) rows
    hash-co-partition on custkey through the actor-reducer exchange;
    each partition resolves EVERY customer's running totals in one
    vectorized lexsort + cumsum-with-group-offsets pass — no per-key
    loop, nothing O(orders) on the driver until the (bounded) query
    projection.  Integer cents ⇒ hash-identical to the SQL window
    oracle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def slim(b: pa.Table) -> pa.Table:
        import numpy as np

        cents = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
                "date_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                "price_c": pa.array(cents, type=pa.int64()),
            }
        )

    from website_indexer_ray.state.exchange import hash_exchange

    tbl = hash_exchange(
        ds.map_batches(slim, batch_format="pyarrow"),
        "o_custkey",
        _cum_resolve,
        sink_dir=sink_dir,
    )
    if sink_dir is not None:
        return None
    if tbl is None:
        return pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "cum_price_c": pa.array([], type=pa.int64()),
            }
        )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("o_orderkey", "ascending")]))


def cumulative_revenue_write(sf_dir: str, out_dir: str) -> None:
    """Sink form: the running-total table is O(orders), so at scale
    it lands in per-partition parquet (committed ``_SUCCESS``) instead
    of concatenating on the driver."""
    from website_indexer_ray.state.exchange import sink_committed

    if sink_committed(out_dir):
        return
    cumulative_revenue(sf_dir, sink_dir=out_dir)


class _HLL:
    """HyperLogLog sketch (Flajolet et al. 2007), 2^p registers —
    partial-mergeable, so per-batch sketches combine with a per-key
    max instead of shuffling raw values."""

    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 12):
        import numpy as np

        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def rank_parts(hashes, p: int):
        """(register index, rank) arrays for a hash batch — the
        vectorized rank pass factored out so callers updating MANY
        sketches from one batch (DistinctShard) can rank once and
        scatter per sketch, instead of paying the 64-p step loop per
        tiny group."""
        import numpy as np

        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        rank = np.ones(len(h), dtype=np.uint8)
        for _ in range(64 - p + 1):
            top = (cur & mask) != 0
            ranks = np.where((ranks == 0) & top, rank, ranks)
            cur = cur << np.uint64(1)
            rank = rank + 1
        return idx, ranks

    def add_hashes(self, hashes) -> None:
        import numpy as np

        idx, ranks = _HLL.rank_parts(hashes, self.p)
        np.maximum.at(self.regs, idx, ranks)

    def merge(self, other: "_HLL") -> None:
        import numpy as np

        np.maximum(self.regs, other.regs, out=self.regs)

    def estimate(self) -> int:
        import numpy as np

        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.regs.astype(np.float64))
        zeros = int(np.sum(self.regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        return int(round(est))


def approx_distinct_users(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate distinct user_id per event_type via HyperLogLog:
    each batch emits one serialized sketch per key (the partial), the
    driver merges registers with a per-key max — at 100 TB the merge
    is a tiny groupby over 4 KB sketches, never a shuffle of user ids.
    Approximate ⇒ rows-only driver check; error bound asserted in
    pytest against the exact counts."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # fully vectorized: splitmix64 mix over the int64 user ids
        # (replacing a per-row Python blake2b through pandas groupby),
        # group recovery via dictionary-encode + argsort — the only
        # Python-level loop is one iteration per DISTINCT event type
        if not batch.num_rows:
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "sketch": pa.array([], type=pa.binary()),
                }
            )
        enc = pc.dictionary_encode(
            batch.column("event_type").combine_chunks()
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = enc.dictionary.to_pylist()
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        h = uid + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        order = np.argsort(codes, kind="stable")
        codes, h = codes[order], h[order]
        bounds = np.r_[
            np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]), len(codes)
        ]
        out_t, out_s = [], []
        for i in range(len(bounds) - 1):
            sk = _HLL(p)
            sk.add_hashes(h[bounds[i] : bounds[i + 1]])
            out_t.append(types[codes[bounds[i]]])
            out_s.append(sk.regs.tobytes())
        return pa.table(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "sketch": pa.array(out_s, type=pa.binary()),
            }
        )

    partials = _to_table(ds.map_batches(partial, batch_format="pyarrow"))
    import numpy as np

    merged: dict[str, _HLL] = {}
    for etype, raw in zip(
        partials.column("event_type").to_pylist(),
        partials.column("sketch").to_pylist(),
    ):
        sk = merged.setdefault(etype, _HLL(p))
        other = _HLL(p)
        other.regs = np.frombuffer(raw, dtype=np.uint8).copy()
        sk.merge(other)
    keys = sorted(merged)
    return pa.table(
        {
            "event_type": pa.array(keys, type=pa.string()),
            "approx_distinct": pa.array(
                [merged[k].estimate() for k in keys], type=pa.int64()
            ),
        }
    )


def revenue_rollup(sf_dir: str) -> pa.Table:
    """Multi-level (ROLLUP) aggregate: order revenue by
    (o_orderpriority, o_orderstatus) with per-priority subtotals and a
    grand total — the GROUPING SETS operator class, expressed
    Ray-Data-first: ONE streaming pass computes per-batch integer-cent
    partials at the finest level (the only O(rows) work); the rollup
    levels derive from that tiny base aggregate (priorities × statuses
    rows) with plain Arrow group_bys.  Subtotal rows carry 'ALL'
    (COALESCE'd in the oracle) so the hash never compares NULLs."""
    from website_indexer_ray.util import agg_named

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        from website_indexer_ray.util import agg_named

        cents = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "o_orderstatus": b.column("o_orderstatus"),
                "sum_price_c": pa.array(cents, type=pa.int64()),
                "n": pa.array(np.ones(len(cents), dtype=np.int64)),
            }
        )
        return agg_named(
            t,
            ["o_orderpriority", "o_orderstatus"],
            [("sum_price_c", "sum"), ("n", "sum")],
            ["o_orderpriority", "o_orderstatus", "sum_price_c", "n"],
        )

    base = _to_table(ds.map_batches(partial, batch_format="pyarrow"))
    if base is None or not base.num_rows:
        return pa.table(
            {
                "o_orderpriority": pa.array([], type=pa.string()),
                "o_orderstatus": pa.array([], type=pa.string()),
                "sum_price_c": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    base = agg_named(
        base,
        ["o_orderpriority", "o_orderstatus"],
        [("sum_price_c", "sum"), ("n", "sum")],
        ["o_orderpriority", "o_orderstatus", "sum_price_c", "n"],
    )
    sub = agg_named(
        base,
        "o_orderpriority",
        [("sum_price_c", "sum"), ("n", "sum")],
        ["o_orderpriority", "sum_price_c", "n"],
    )
    sub = sub.add_column(
        1, "o_orderstatus", pa.array(["ALL"] * sub.num_rows, type=pa.string())
    )
    total = pa.table(
        {
            "o_orderpriority": pa.array(["ALL"], type=pa.string()),
            "o_orderstatus": pa.array(["ALL"], type=pa.string()),
            "sum_price_c": pa.array(
                [pc.sum(base.column("sum_price_c")).as_py()], type=pa.int64()
            ),
            "n": pa.array([pc.sum(base.column("n")).as_py()], type=pa.int64()),
        }
    )
    cols = ["o_orderpriority", "o_orderstatus", "sum_price_c", "n"]
    out = pa.concat_tables([base.select(cols), sub.select(cols), total])
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[
                ("o_orderpriority", "ascending"),
                ("o_orderstatus", "ascending"),
            ],
        )
    )


def priority_revenue(sf_dir: str) -> pa.Table:
    """Big-big hash join (lineitem ⨝ orders on orderkey) — the join
    class the reference never needs, expressed with the engine's keyed
    exchange: both sides project to slim tagged rows, one
    orderkey-hashed exchange co-locates each key's rows, and the
    partition joins + pre-aggregates to (priority, revenue) partials —
    the driver merges a handful of rows. Revenue in scaled-integer
    cents⁴ so the DuckDB oracle hashes identically."""
    from website_indexer_ray.state.exchange import hash_exchange

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def tag_li(b: pa.Table) -> pa.Table:
        price_c = pc.cast(
            pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()
        )
        disc_c = pc.cast(
            pc.round(pc.multiply(pc.subtract(1.0, b.column("l_discount")), 100.0)),
            pa.int64(),
        )
        t = pa.table(
            {
                "k": pc.cast(b.column("l_orderkey"), pa.int64()),
                "revenue_c4": pc.multiply(price_c, disc_c),
            }
        )
        # local combiner: one row per orderkey per batch
        from website_indexer_ray.util import agg_named

        t = agg_named(t, "k", [("revenue_c4", "sum")], ["k", "revenue_c4"])
        return t.append_column(
            "priority", pa.array([None] * t.num_rows, type=pa.string())
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b.column("o_orderkey"), pa.int64()),
                "revenue_c4": pa.array([-1] * b.num_rows, type=pa.int64()),
                "priority": b.column("o_orderpriority"),
            }
        )

    def join_partition(t: pa.Table) -> pa.Table:
        pri_rows = t.filter(pc.is_valid(t.column("priority")))
        pri_of = dict(
            zip(pri_rows.column("k").to_pylist(),
                pri_rows.column("priority").to_pylist())
        )
        li_rows = t.filter(pc.is_null(t.column("priority")))
        out: dict[str, int] = {}
        for k, rev in zip(
            li_rows.column("k").to_pylist(),
            li_rows.column("revenue_c4").to_pylist(),
        ):
            p = pri_of.get(k)
            if p is not None:
                out[p] = out.get(p, 0) + rev
        return pa.table(
            {
                "o_orderpriority": pa.array(list(out.keys()), type=pa.string()),
                "revenue_c4": pa.array(list(out.values()), type=pa.int64()),
            }
        )

    partials = hash_exchange(
        li.map_batches(tag_li, batch_format="pyarrow").union(
            orders.map_batches(tag_orders, batch_format="pyarrow")
        ),
        "k",
        join_partition,
    )
    if partials is None:
        return pa.table(
            {
                "o_orderpriority": pa.array([], type=pa.string()),
                "revenue_c4": pa.array([], type=pa.int64()),
            }
        )
    from website_indexer_ray.util import agg_named

    out = agg_named(
        partials,
        "o_orderpriority",
        [("revenue_c4", "sum")],
        ["o_orderpriority", "revenue_c4"],
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("o_orderpriority", "ascending")])
    )


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """TPC-H Q5-flavored: revenue per customer nation — BOTH join
    strategies in one pipeline: the small sides (nation, customer →
    custkey→nation-name, bounded dimension tables) broadcast once via
    ray.put; the big-big lineitem ⨝ orders leg runs through the
    orderkey-hashed exchange exactly like priority_revenue. At 10⁹
    customers the broadcast side flips to the same keyed-exchange
    join — the strategy choice is a size threshold, not a rewrite."""
    import pyarrow.parquet as pq

    from website_indexer_ray.state.exchange import hash_exchange
    from website_indexer_ray.util import cached_get

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    n_name = dict(
        zip(nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist())
    )
    cust_nation = {
        c: n_name[n]
        for c, n in zip(
            cust.column("c_custkey").to_pylist(),
            cust.column("c_nationkey").to_pylist(),
        )
    }
    map_ref = ray.put(cust_nation)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def tag_li(b: pa.Table) -> pa.Table:
        price_c = pc.cast(
            pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()
        )
        disc_c = pc.cast(
            pc.round(pc.multiply(pc.subtract(1.0, b.column("l_discount")), 100.0)),
            pa.int64(),
        )
        t = pa.table(
            {
                "k": pc.cast(b.column("l_orderkey"), pa.int64()),
                "revenue_c4": pc.multiply(price_c, disc_c),
            }
        )
        from website_indexer_ray.util import agg_named

        t = agg_named(t, "k", [("revenue_c4", "sum")], ["k", "revenue_c4"])
        return t.append_column(
            "nation", pa.array([None] * t.num_rows, type=pa.string())
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        cn = cached_get(map_ref)
        nations = [cn.get(c) for c in b.column("o_custkey").to_pylist()]
        return pa.table(
            {
                "k": pc.cast(b.column("o_orderkey"), pa.int64()),
                "revenue_c4": pa.array([-1] * b.num_rows, type=pa.int64()),
                "nation": pa.array(nations, type=pa.string()),
            }
        )

    def join_partition(t: pa.Table) -> pa.Table:
        nat_rows = t.filter(pc.is_valid(t.column("nation")))
        nat_of = dict(
            zip(nat_rows.column("k").to_pylist(),
                nat_rows.column("nation").to_pylist())
        )
        li_rows = t.filter(pc.is_null(t.column("nation")))
        out: dict[str, int] = {}
        for k, rev in zip(
            li_rows.column("k").to_pylist(),
            li_rows.column("revenue_c4").to_pylist(),
        ):
            n = nat_of.get(k)
            if n is not None:
                out[n] = out.get(n, 0) + rev
        return pa.table(
            {
                "n_name": pa.array(list(out.keys()), type=pa.string()),
                "revenue_c4": pa.array(list(out.values()), type=pa.int64()),
            }
        )

    partials = hash_exchange(
        li.map_batches(tag_li, batch_format="pyarrow").union(
            orders.map_batches(tag_orders, batch_format="pyarrow")
        ),
        "k",
        join_partition,
    )
    if partials is None:
        return pa.table(
            {
                "n_name": pa.array([], type=pa.string()),
                "revenue_c4": pa.array([], type=pa.int64()),
            }
        )
    from website_indexer_ray.util import agg_named

    out = agg_named(
        partials, "n_name", [("revenue_c4", "sum")], ["n_name", "revenue_c4"]
    )
    return out.take(pc.sort_indices(out, sort_keys=[("n_name", "ascending")]))


def search_docs_text(sf_dir: str, q: str = "spark merge") -> pa.Table:
    """C1 analog over documents: case-insensitive substring search
    (the reference's icontains, crawler/search.py:57-58) vectorized
    with pc.match_substring(ignore_case=True).  Table form for the
    driver contract; at scale use ``search_docs_text_ds`` / ``_write``
    — a common substring's match set is O(corpus)."""
    out = _to_table(search_docs_text_ds(sf_dir, q))
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))


def search_docs_text_ds(sf_dir: str, q: str = "spark merge"):
    """Streaming Dataset form of ``search_docs_text`` — matches never
    concatenate on the driver (the crawl-side analog is
    query.search_pages_ds)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "text"]
    )

    def predicate(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch.column("text"), q, ignore_case=True)
        return batch.filter(mask).select(["doc_id", "lang", "source"])

    return ds.map_batches(predicate, batch_format="pyarrow")


def search_docs_text_write(sf_dir: str, out_dir: str, q: str = "spark merge") -> None:
    """Sink form: matches stream straight to partitioned parquet under
    the commit protocol — nothing O(matches) driver-side."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(search_docs_text_ds(sf_dir, q), out_dir)


def streaming_window_counts(
    sf_dir: str,
    window_s: int = 3600,
    lateness_s: int = 900,
    batch_size: int = 4096,
) -> pa.Table:
    """The STREAMING form of ``window_counts``: the same 1-hour
    tumbling aggregate computed by watermark-driven window actors
    (state/streaming.py) over an event-time-ordered stream —
    incremental finalization, late-data accounting, state bounded by
    open windows per shard instead of stream length.

    The stream source stand-in is a ts-ordered DISTRIBUTED sort of
    the events table drained batch-by-batch (``Dataset.sort`` +
    ``iter_batches`` — the driver only ever holds one batch, never
    the table; a real deployment swaps in a per-shard log consumer).
    With the source ordered and any ``lateness`` ≥ 0 no event is
    late, so the result must EQUAL the batch ``window_counts`` —
    which is exactly the SQL oracle this query is hash-checked
    against (a streaming operator with an exact batch oracle)."""
    from website_indexer_ray.state.streaming import run_windowed_stream

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).sort("ts")

    def batches():
        for b in ds.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            yield b

    out, n_late = run_windowed_stream(
        batches(), window_us=window_s * 1_000_000, lateness_us=lateness_s * 1_000_000
    )
    assert n_late == 0  # ordered source ⇒ nothing can be late
    return out


def _window_topk_body(k: int):
    def body(t: pa.Table) -> pa.Table:
        """Partition body: a window's partial (win, user, n) rows are
        co-located by routing, so sum-then-rank here is global — one
        Arrow group_by + one lexsort + run-length top-k pass for every
        window in the partition."""
        from website_indexer_ray.util import agg_named

        if not t.num_rows:
            return pa.table(
                {
                    "win_us": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        g = agg_named(
            t.select(["win_us", "user_id", "n"]),
            ["win_us", "user_id"],
            [("n", "sum")],
            ["win_us", "user_id", "n"],
        )
        win = g.column("win_us").to_numpy(zero_copy_only=False)
        user = g.column("user_id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((user, -n, win))
        win, user, n = win[order], user[order], n[order]
        new = np.r_[True, win[1:] != win[:-1]]
        gid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        pos = np.arange(len(win)) - starts[gid]
        keep = pos < k
        return pa.table(
            {
                "win_us": pa.array(win[keep], type=pa.int64()),
                "user_id": pa.array(user[keep], type=pa.int64()),
                "n": pa.array(n[keep], type=pa.int64()),
            }
        )

    return body


def top_users_per_window(sf_dir: str, k: int = 3, window_s: int = 3600) -> pa.Table:
    """EXACT windowed heavy hitters: the k most active users per
    tumbling window, (n desc, user_id) tie-break — the grouped-top-k ×
    time-window composition (the exact counterpart of the Count-Min
    approximate heavy hitters).  Per-batch partial (window, user)
    counts shrink the scan ~batch/rows-per-pair before one
    window-keyed exchange; each partition resolves all of its windows
    vectorized.  Hash-exact vs the SQL ROW_NUMBER oracle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    window_us = window_s * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        from website_indexer_ray.util import agg_named

        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "win_us": pa.array((ts // window_us) * window_us, type=pa.int64()),
                "user_id": pc.cast(b.column("user_id"), pa.int64()),
                "n": pa.array(np.ones(len(ts), dtype=np.int64)),
            }
        )
        return agg_named(
            t, ["win_us", "user_id"], [("n", "sum")], ["win_us", "user_id", "n"]
        )

    from website_indexer_ray.state.exchange import hash_exchange

    tbl = hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow"),
        "win_us",
        _window_topk_body(k),
    )
    if tbl is None:
        return pa.table(
            {
                "window_start": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    out = pa.table(
        {
            "window_start": tbl.column("win_us").cast(pa.timestamp("us")),
            "user_id": tbl.column("user_id"),
            "n": tbl.column("n"),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[
                ("window_start", "ascending"),
                ("n", "descending"),
                ("user_id", "ascending"),
            ],
        )
    )


def approx_quantiles_by_type(
    sf_dir: str,
    qs: tuple = (0.5, 0.9, 0.99),
    max_centroids: int = 256,
) -> pa.Table:
    """GROUPED quantile sketch: per-event_type centroid digests — the
    grouped form of ``approx_quantiles`` (mirroring how
    ``approx_distinct_users`` is the grouped HLL).  Each batch emits
    ≤ max_centroids (mean, count) centroids PER TYPE present in the
    batch (group recovery via dictionary_encode + argsort, no pandas);
    the driver's sort-by-mean merge runs independently per key, so
    estimates are deterministic regardless of partial arrival order.
    Approximate ⇒ rows-only driver check; per-group rank-error bound
    asserted in pytest."""
    from website_indexer_ray.pipelines.textops import _to_table

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "mean": pa.array([], type=pa.float64()),
                    "count": pa.array([], type=pa.int64()),
                }
            )
        enc = pc.dictionary_encode(batch.column("event_type").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = enc.dictionary.to_pylist()
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        codes, vals = codes[order], vals[order]
        bounds = np.r_[
            np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]), len(codes)
        ]
        parts = []
        for i in range(len(bounds) - 1):
            c = _value_centroids(vals[bounds[i] : bounds[i + 1]], max_centroids)
            parts.append(
                c.append_column(
                    "event_type",
                    pa.array([types[codes[bounds[i]]]] * c.num_rows),
                )
            )
        return pa.concat_tables(parts)

    cents = _to_table(ds.map_batches(partial, batch_format="pyarrow"))
    out_t, out_q, out_v = [], [], []
    if cents.num_rows:
        cents = cents.combine_chunks()
        for etype in sorted(set(cents.column("event_type").to_pylist())):
            g = cents.filter(pc.equal(cents.column("event_type"), etype))
            order = pc.sort_indices(g, sort_keys=[("mean", "ascending")])
            means = g.column("mean").take(order).to_numpy(zero_copy_only=False)
            counts = g.column("count").take(order).to_numpy(
                zero_copy_only=False
            )
            cum = np.cumsum(counts)
            total = int(counts.sum())
            for q in qs:
                i = min(
                    int(np.searchsorted(cum, q * total, side="left")),
                    len(means) - 1,
                )
                out_t.append(etype)
                out_q.append(float(q))
                out_v.append(float(means[i]))
    return pa.table(
        {
            "event_type": pa.array(out_t, type=pa.string()),
            "q": pa.array(out_q, type=pa.float64()),
            "value_est": pa.array(out_v, type=pa.float64()),
        }
    )


def streaming_distinct_users(
    sf_dir: str,
    window_s: int = 3600,
    lateness_s: int = 900,
    batch_size: int = 4096,
    p: int = 12,
) -> pa.Table:
    """STREAMING per-window approximate distinct users: HLL sketches
    on the watermark machinery (state/streaming.py DistinctShard) —
    the composition of the repo's sketch family with its streaming
    family.  State per shard is O(open windows × types) 4 KB sketches
    regardless of stream length OR user cardinality (an exact
    per-window user set would grow O(distinct users)); finalized
    windows drain incrementally while the stream runs.

    Register max is commutative and idempotent, so arrival order and
    cross-batch duplicate partials cannot change the result — a
    shuffled stream under sufficient lateness is bit-identical to the
    ordered one (pinned in pytest).  Approximate ⇒ rows-only driver
    check; the per-window error bound vs exact COUNT(DISTINCT) is the
    pytest gate."""
    from website_indexer_ray.state.streaming import run_distinct_stream

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id"]
    ).sort("ts")

    def batches():
        for b in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            yield b

    out, n_late = run_distinct_stream(
        batches(),
        window_us=window_s * 1_000_000,
        lateness_us=lateness_s * 1_000_000,
        p=p,
    )
    assert n_late == 0  # ordered source ⇒ nothing can be late
    return out


# --- mergeable quantile sketch (centroid digest) ---------------------

def _value_centroids(vals: np.ndarray, max_centroids: int) -> pa.Table:
    """Equal-count centroid digest of one batch: sort, chunk into at
    most ``max_centroids`` runs, emit (mean, count) per run. The
    classic mergeable-digest shape (t-digest's uniform-δ special
    case): rank error after one compression is bounded by the chunk
    width, count/max_centroids."""
    vals = np.sort(vals)
    n = len(vals)
    k = min(max_centroids, n)
    edges = np.linspace(0, n, k + 1).astype(np.int64)
    means, counts = [], []
    for s, e in zip(edges[:-1], edges[1:]):
        if e > s:
            means.append(float(vals[s:e].mean()))
            counts.append(int(e - s))
    return pa.table(
        {
            "mean": pa.array(means, type=pa.float64()),
            "count": pa.array(counts, type=pa.int64()),
        }
    )


def approx_quantiles(
    sf_dir: str,
    qs: tuple = (0.5, 0.9, 0.99),
    max_centroids: int = 256,
) -> pa.Table:
    """Approximate quantiles of the continuous ``events.value`` column
    via a mergeable centroid digest — the quantile member of the
    sketch family (HLL distinct, Count-Min heavy hitters, Bloom
    membership): each batch reduces to ≤ max_centroids (mean, count)
    centroids (a ~4 KB partial however large the batch); partials are
    sorted by mean on the driver — a deterministic merge independent
    of partial arrival order, unlike sequential digest merging — and
    the estimate reads the cumulative counts at rank q·N.

    Rank error is bounded by the widest centroid (≈ batch_rows /
    max_centroids); the pytest gate asserts the measured rank error
    of every estimate against the exact sorted column. Approximate ⇒
    rows-only driver check."""
    from website_indexer_ray.pipelines.textops import _to_table

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        return _value_centroids(
            batch.column("value").to_numpy(zero_copy_only=False),
            max_centroids,
        )

    cents = _to_table(ds.map_batches(partial, batch_format="pyarrow"))
    if cents.num_rows == 0:
        return pa.table(
            {
                "q": pa.array([], type=pa.float64()),
                "value_est": pa.array([], type=pa.float64()),
            }
        )
    order = pc.sort_indices(cents, sort_keys=[("mean", "ascending")])
    means = cents.column("mean").take(order).to_numpy(zero_copy_only=False)
    counts = cents.column("count").take(order).to_numpy(zero_copy_only=False)
    # estimate = cumulative count read at rank q*N over the sorted
    # centroid sequence (no further compression happens or is needed)
    total = int(counts.sum())
    cum = np.cumsum(counts)
    out_q, out_v = [], []
    for q in qs:
        rank = q * total
        i = int(np.searchsorted(cum, rank, side="left"))
        i = min(i, len(means) - 1)
        out_q.append(float(q))
        out_v.append(float(means[i]))
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.float64()),
            "value_est": pa.array(out_v, type=pa.float64()),
        }
    )


def streaming_sessionize(
    sf_dir: str,
    gap_minutes: int = 30,
    lateness_s: int = 0,
    batch_size: int = 4096,
) -> pa.Table:
    """The STREAMING form of ``sessionize``: gap-based session windows
    maintained by hash-sharded actors (state/streaming.py
    SessionShard) — events buffer until the watermark passes them,
    then merge into per-user carries in event-time order, so bounded
    disorder within ``lateness_s`` is reordered EXACTLY. Same
    stand-in source as ``streaming_window_counts`` (distributed
    ts-sort drained batch-by-batch); ordered source ⇒ nothing is late
    ⇒ the result must EQUAL the batch ``sessionize`` and its SQL
    oracle."""
    from website_indexer_ray.state.streaming import run_sessionized_stream

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).sort("ts")

    def batches():
        for b in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            yield b

    out, n_late = run_sessionized_stream(
        batches(),
        gap_us=int(gap_minutes) * 60_000_000,
        lateness_us=lateness_s * 1_000_000,
    )
    assert n_late == 0  # ordered source ⇒ nothing can be late
    return out
