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

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum


def _to_table(ds) -> pa.Table:
    tables = [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables([t.combine_chunks() for t in tables]).combine_chunks()


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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["qty"] = batch["l_quantity"].round().astype("int64")
        batch["price_c"] = (batch["l_extendedprice"] * 100).round().astype("int64")
        batch["disc_c"] = ((1 - batch["l_discount"]) * 100).round().astype("int64")
        batch["revenue_c4"] = batch["price_c"] * batch["disc_c"]
        batch["n"] = 1
        g = (
            batch.groupby(["l_returnflag", "l_linestatus"], as_index=False)[
                ["qty", "price_c", "revenue_c4", "n"]
            ].sum()
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_c", alias_name="sum_price_c"),
            Sum("revenue_c4", alias_name="sum_revenue_c4"),
            Sum("n", alias_name="n_rows"),
        )
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue_c4"] = (
            (batch["l_extendedprice"] * 100).round().astype("int64")
            * ((1 - batch["l_discount"]) * 100).round().astype("int64")
        )
        return batch.groupby("l_orderkey", as_index=False)[["revenue_c4"]].sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    # Final merge: partials are one row per (key, batch) — a tiny
    # table — so the combine runs on the driver. At 10^9+ key
    # cardinality this flips to a hash-partitioned groupby; top-k
    # itself never needs a full sort (per-partition top-k, then merge).
    merged = (
        _to_table(partials)
        .group_by("l_orderkey")
        .aggregate([("revenue_c4", "sum")])
        .rename_columns(["l_orderkey", "revenue_c4"])
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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("event_type", as_index=False).size()
        return g.rename(columns={"size": "n"})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = partials.groupby("event_type").aggregate(Sum("n", alias_name="n"))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
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
    tbl = pa.Table.from_pandas(window.to_pandas(), preserve_index=False)
    return tbl.slice((page - 1) * page_size, page_size)


def filter_chain_events(sf_dir: str) -> pa.Table:
    """Multi-predicate vectorized filter chain (F-rule analog over
    events: type membership + numeric threshold + regex on props)."""
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

    out = _to_table(ds.map_batches(predicate, batch_format="pyarrow"))
    return out.take(pc.sort_indices(out, sort_keys=[("event_id", "ascending")]))


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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["window_start"] = batch["ts"].dt.floor("h")
        batch["value_c"] = (batch["value"] * 100).round().astype("int64")
        batch["n"] = 1
        return batch.groupby(["window_start", "event_type"], as_index=False)[
            ["value_c", "n"]
        ].sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("value_c", alias_name="sum_value_c"),
        Sum("n", alias_name="n"),
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return tbl.take(
        pc.sort_indices(
            tbl,
            sort_keys=[("window_start", "ascending"), ("event_type", "ascending")],
        )
    )


def asof_last_order(sf_dir: str) -> pa.Table:
    """As-of join: for every event, the latest order of the same
    customer at or before the event time (ties on order date broken by
    max o_orderkey; -1 when the customer has no prior order).

    A custom wide operator Ray Data lacks, composed per the guide:
    tag both sides into one slim (key, time, kind, payload) relation,
    hash-co-partition with ``groupby(key)``, and resolve each
    partition with a vectorized sort + forward-fill inside
    ``map_groups`` — the single shuffle moves only the four join
    columns, never the wide source rows. Partitioning assumption:
    one customer's history fits a group (salt the key with a time
    bucket if a key ever doesn't)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["o_custkey"],
                "t": b["o_orderdate"],
                "kind": 0,
                "event_id": -1,
                "orderkey": b["o_orderkey"],
            }
        )

    def tag_events(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["user_id"],
                "t": b["ts"],
                "kind": 1,
                "event_id": b["event_id"],
                "orderkey": -1,
            }
        )

    unioned = orders.map_batches(tag_orders, batch_format="pandas").union(
        events.map_batches(tag_events, batch_format="pandas")
    )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "kind", "orderkey"], kind="mergesort")
        last = g["orderkey"].where(g["kind"] == 0).ffill()
        ev = g["kind"] == 1
        return pd.DataFrame(
            {
                "event_id": g.loc[ev, "event_id"].astype("int64"),
                "last_orderkey": last[ev].fillna(-1).astype("int64"),
            }
        )

    out = unioned.groupby("key").map_groups(fill, batch_format="pandas")
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("event_id", "ascending")]))


def search_docs_text(sf_dir: str, q: str = "spark merge") -> pa.Table:
    """C1 analog over documents: case-insensitive substring search
    (the reference's icontains, crawler/search.py:57-58) vectorized
    with pc.match_substring(ignore_case=True)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "text"]
    )

    def predicate(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch.column("text"), q, ignore_case=True)
        return batch.filter(mask).select(["doc_id", "lang", "source"])

    out = _to_table(ds.map_batches(predicate, batch_format="pyarrow"))
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))
