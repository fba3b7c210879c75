"""Distributed graph operators over slim edge lists.

Two graph primitives a crawl corpus invites but the reference never
computes — it stores the page→link graph (the ``crawler_page_links``
bridge table, /root/reference/crawler/models.py:91-95) and only ever
substring-searches it (/root/reference/crawler/search.py:25-42):

- ``connected_components``: the alternating large-star / small-star
  algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
  and Beyond") on the actor-reducer hash exchange.  Converges in
  O(log n) rounds on ANY graph — naive min-label propagation needs
  O(diameter) rounds, so a duplicate-chain of 10^6 docs would take
  10^6 rounds vs ~20 here.  Each round is one keyed exchange whose
  partition body is pure numpy (lexsort + minimum.reduceat); only
  (node, node) int64 pairs ever move, never payloads.

- ``pagerank``: damped power iteration over the crawled-page link
  graph in EXACT integer arithmetic (micro-rank units, floor
  division), so the result hash-matches a SQL oracle digit for digit
  — no floating-point accumulation-order sensitivity under
  parallelism.  Each iteration is two keyed exchanges: join ranks to
  out-edges co-partitioned by src (a page's rank row and all its
  out-edges hash to the same partition, so out-degree is just the
  co-located group size), then sum contributions by dst.
  ``pagerank_write`` is the scale form: every exchange lands in a
  committed parquet sink and the next stage streams from it, so rank
  vectors never materialize on the driver and a killed run resumes at
  the last committed stage.

Partitioning assumptions (custom-operator rule): one partition's rows
fit a reducer's heap — size ``n_reducers`` to key volume; edge lists
are slim (2-3 int64/string columns).  The CC edge table between
rounds is held as driver-side Arrow only BELOW ``_CC_SINK_THRESHOLD``
post-dedup edges (same contract as the near-dup pair lists: orders of
magnitude smaller than the corpus); above it the driver form
auto-delegates to ``connected_components_write``, whose star rounds
chain through committed exchange sinks exactly like
``pagerank_write`` — equality across the switch boundary is pinned in
tests/test_graphops.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from website_indexer_ray.state.exchange import hash_exchange
from website_indexer_ray.util import agg_named, collect_table_blocks

_I64 = pa.int64()

# --- connected components (large-star / small-star) ------------------

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _edge_sig(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """Order-insensitive multiset signature of an edge list (count +
    64-bit checksum) — the convergence test between star rounds."""
    ua = a.astype(np.uint64)
    ub = b.astype(np.uint64)
    ha = (ua ^ (ua >> np.uint64(33))) * _MIX_A
    hb = (ub ^ (ub >> np.uint64(29))) * _MIX_B
    h = ha ^ (hb + _MIX_A + (ha << np.uint64(6)) + (ha >> np.uint64(2)))
    return len(a), int(h.sum(dtype=np.uint64))


def _dedup_edges(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if not len(a):
        return a, b
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return a[keep], b[keep]


def _group_min(k: np.ndarray, w: np.ndarray):
    """Rows sorted by k: per-group min(w ∪ {k}) broadcast back to rows.
    Returns (m_per_row, k_first_per_group, m_per_group)."""
    bounds = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    gmin = np.minimum.reduceat(w, bounds)
    kf = k[bounds]
    m = np.minimum(gmin, kf)
    lens = np.diff(np.r_[bounds, len(k)])
    return np.repeat(m, lens), kf, m


def _large_star_body(t: pa.Table) -> pa.Table:
    """Partition body: for each key node u, link every strictly-larger
    neighbor to min(N(u) ∪ {u})."""
    k = t.column("k").to_numpy(zero_copy_only=False)
    w = t.column("w").to_numpy(zero_copy_only=False)
    order = np.lexsort((w, k))
    k, w = k[order], w[order]
    m_rows, _, _ = _group_min(k, w)
    mask = w > k
    a, b = _dedup_edges(w[mask], m_rows[mask])
    return pa.table({"a": pa.array(a, type=_I64), "b": pa.array(b, type=_I64)})


def _small_star_body(t: pa.Table) -> pa.Table:
    """Partition body: key node u holds only strictly-smaller
    neighbors; link them (and u) to the group minimum."""
    k = t.column("k").to_numpy(zero_copy_only=False)
    w = t.column("w").to_numpy(zero_copy_only=False)
    order = np.lexsort((w, k))
    k, w = k[order], w[order]
    m_rows, kf, m_group = _group_min(k, w)
    mask = w != m_rows
    a = np.concatenate([w[mask], kf])
    b = np.concatenate([m_rows[mask], m_group])
    a, b = _dedup_edges(a, b)
    return pa.table({"a": pa.array(a, type=_I64), "b": pa.array(b, type=_I64)})


def _route_edges(a: np.ndarray, b: np.ndarray, large: bool, n_reducers: int):
    """Edge list → routed (k, w) Dataset for one star round, split
    into blocks so routing parallelizes."""
    if large:
        k = np.concatenate([a, b])
        w = np.concatenate([b, a])
    else:
        k = np.maximum(a, b)
        w = np.minimum(a, b)
    tbl = pa.table({"k": pa.array(k, type=_I64), "w": pa.array(w, type=_I64)})
    step = max(65_536, -(-len(k) // max(1, n_reducers)))
    parts = [tbl.slice(i, step) for i in range(0, max(1, len(k)), step)]
    return ray.data.from_arrow(parts)


def _empty_cc() -> pa.Table:
    return pa.table(
        {"node": pa.array([], type=_I64), "component": pa.array([], type=_I64)}
    )


# Above this many post-dedup edges the driver form delegates to the
# sink-chained ``connected_components_write`` (the adaptive pattern
# exact_dedup uses), so the inter-round edge table never grows
# driver-side past ~2 int64 columns × threshold ≈ 160 MB.
_CC_SINK_THRESHOLD = 10_000_000


def connected_components(
    edges: pa.Table,
    a_col: str = "a",
    b_col: str = "b",
    n_reducers: int = 8,
    max_rounds: int = 64,
    sink_threshold: int = _CC_SINK_THRESHOLD,
) -> pa.Table:
    """Connected components of an undirected int64 edge list →
    (node, component) where component = min node id of the component.
    Every node incident to a non-self-loop edge appears exactly once
    (pure self-loop nodes are dropped with their edges).

    Alternates large-star / small-star exchanges until the edge set is
    stable; at the fixpoint every component is a star rooted at its
    minimum node (Kiveris et al. 2014, Thm 1-3).  Above
    ``sink_threshold`` post-dedup edges the rounds chain through
    committed parquet sinks (``connected_components_write``) instead
    of driver-resident arrays; only the O(nodes) result returns."""
    a = edges.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
    b = edges.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
    loop = a != b
    a, b = _dedup_edges(a[loop], b[loop])
    if not len(a):
        return _empty_cc()
    if len(a) > sink_threshold:
        import tempfile

        with tempfile.TemporaryDirectory(prefix="wir_cc_") as td:
            out_ds = connected_components_write(
                _from_arrow_split(
                    pa.table(
                        {"a": pa.array(a, type=_I64), "b": pa.array(b, type=_I64)}
                    ),
                    n_reducers,
                ),
                td,
                n_reducers=n_reducers,
                max_rounds=max_rounds,
            )
            parts = collect_table_blocks(out_ds)
            tbl = pa.concat_tables(parts) if parts else _empty_cc()
        order = pc.sort_indices(tbl, sort_keys=[("node", "ascending")])
        return tbl.take(order).combine_chunks()
    prev_a = prev_b = None
    for _ in range(max_rounds):
        out = hash_exchange(
            _route_edges(a, b, True, n_reducers), "k", _large_star_body, n_reducers
        )
        la = out.column("a").to_numpy(zero_copy_only=False)
        lb = out.column("b").to_numpy(zero_copy_only=False)
        out = hash_exchange(
            _route_edges(la, lb, False, n_reducers), "k", _small_star_body, n_reducers
        )
        a, b = _dedup_edges(
            out.column("a").to_numpy(zero_copy_only=False),
            out.column("b").to_numpy(zero_copy_only=False),
        )
        # exact fixpoint test: both arrays are canonical after
        # _dedup_edges (lexsorted, unique), so np.array_equal is the
        # true edge-set comparison — a checksum collision can't
        # terminate early.  The streaming signature remains only in
        # connected_components_write, where exact comparison would be
        # O(edges) on the driver.
        if (
            prev_a is not None
            and np.array_equal(a, prev_a)
            and np.array_equal(b, prev_b)
        ):
            break
        prev_a, prev_b = a, b
    else:  # pragma: no cover - O(log n) bound makes this unreachable
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    roots = np.setdiff1d(np.unique(b), a)
    node = np.concatenate([a, roots])
    comp = np.concatenate([b, roots])
    order = np.argsort(node, kind="stable")
    return pa.table(
        {
            "node": pa.array(node[order], type=_I64),
            "component": pa.array(comp[order], type=_I64),
        }
    )


def connected_components_write(
    edges_ds,
    out_dir: str,
    n_reducers: int = 8,
    max_rounds: int = 64,
):
    """Sink form of ``connected_components`` for edge sets too big for
    the driver: every star round lands in its own committed parquet
    dir under ``out_dir`` and the next round STREAMS from it; the
    convergence signature (count + orderless checksum) is a tiny
    streaming aggregate per round, so nothing O(edges) ever
    materializes driver-side.  A killed run resumes at the last
    committed round (same ``_SUCCESS`` protocol as ``pagerank_write``).
    Input: a Dataset with NON-NEGATIVE int64 columns (a, b) — the
    root-resolution exchange uses -1 as the parent-role sentinel.
    One out_dir == one (input, params) run (the crawl-checkpoint
    contract): resuming with different parameters raises; a changed
    INPUT needs a fresh dir (input identity is not fingerprinted,
    same as ``pagerank_write``).  Returns the final (node, component)
    Dataset reading the committed result."""
    import json
    import os

    from website_indexer_ray.state.exchange import sink_committed

    params = {"n_reducers": n_reducers, "max_rounds": max_rounds}
    meta_path = os.path.join(out_dir, "meta.json")
    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if {k: meta.get(k) for k in params} != params:
            raise ValueError(
                f"connected_components_write resume with different "
                f"parameters: committed {meta} vs requested {params}; "
                f"use a fresh out_dir"
            )
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, meta_path)

    def _round_in(ds):
        """Large-star routed input: both directions, self-loops
        dropped."""

        def build(b: pa.Table) -> pa.Table:
            a = b.column("a").to_numpy(zero_copy_only=False)
            w = b.column("b").to_numpy(zero_copy_only=False)
            loop = a != w
            a, w = a[loop], w[loop]
            k = np.concatenate([a, w])
            v = np.concatenate([w, a])
            return pa.table(
                {"k": pa.array(k, type=_I64), "w": pa.array(v, type=_I64)}
            )

        return ds.map_batches(build, batch_format="pyarrow")

    def _sig_of(ds) -> tuple[int, int]:
        def part(b: pa.Table) -> pa.Table:
            n, s = _edge_sig(
                b.column("a").to_numpy(zero_copy_only=False),
                b.column("b").to_numpy(zero_copy_only=False),
            )
            return pa.table(
                {"n": pa.array([n], type=_I64), "s": pa.array([s % (2**63)], type=_I64)}
            )

        tot_n, tot_s = 0, 0
        for batch in ds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            tot_n += sum(batch.column("n").to_pylist())
            tot_s = (tot_s + sum(batch.column("s").to_pylist())) % (2**63)
        return tot_n, tot_s

    edge_schema = pa.schema([("a", _I64), ("b", _I64)])
    sig_path = os.path.join(out_dir, "round_sigs.json")
    os.makedirs(out_dir, exist_ok=True)
    sigs: dict[str, list] = {}
    if os.path.exists(sig_path):
        with open(sig_path) as f:
            sigs = json.load(f)

    cur = edges_ds
    prev_sig = None
    final_round = None
    for i in range(max_rounds):
        rd_dir = os.path.join(out_dir, f"round-{i}")
        if not sink_committed(rd_dir):
            ldir = os.path.join(out_dir, f"round-{i}-large")
            if not sink_committed(ldir):
                hash_exchange(
                    _round_in(cur), "k", _large_star_body, n_reducers,
                    sink_dir=ldir,
                )
            hash_exchange(
                _read_sink(ldir, edge_schema).map_batches(
                    lambda b: pa.table(
                        {
                            "k": pc.max_element_wise(b.column("a"), b.column("b")),
                            "w": pc.min_element_wise(b.column("a"), b.column("b")),
                        }
                    ),
                    batch_format="pyarrow",
                ),
                "k",
                _small_star_body,
                n_reducers,
                sink_dir=rd_dir,
            )
        cur = _read_sink(rd_dir, edge_schema)
        key = f"round-{i}"
        if key not in sigs:
            sigs[key] = list(_sig_of(cur))
            tmp = sig_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(sigs, f)
            os.replace(tmp, sig_path)
        sig = tuple(sigs[key])
        if sig == prev_sig:
            final_round = i
            break
        prev_sig = sig
    else:  # pragma: no cover - O(log n) bound
        raise RuntimeError(f"no fixpoint in {max_rounds} rounds")

    # stars -> (node, component): children are (a -> b); roots (parents
    # that are nobody's child) map to themselves — resolved per
    # partition by one node-keyed exchange, never a driver set-diff.
    out_final = os.path.join(out_dir, "components")
    if not sink_committed(out_final):
        def emit_roles(b: pa.Table) -> pa.Table:
            a = b.column("a")
            bb = b.column("b")
            n = b.num_rows
            return pa.table(
                {
                    "key": pa.concat_arrays(
                        [a.combine_chunks(), bb.combine_chunks()]
                    ),
                    "node": pa.concat_arrays(
                        [a.combine_chunks(), bb.combine_chunks()]
                    ),
                    "comp": pa.concat_arrays(
                        [
                            bb.combine_chunks(),
                            pa.array([-1] * n, type=_I64),
                        ]
                    ),
                }
            )

        def resolve_roles(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            comp = t.column("comp").to_numpy(zero_copy_only=False)
            order = np.lexsort((comp, node))
            node, comp = node[order], comp[order]
            bounds = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
            # per node: child rows carry comp >= 0 (a appears once as a
            # child at the fixpoint); root-only nodes have max comp -1
            gmax = np.maximum.reduceat(comp, bounds)
            nodes = node[bounds]
            out_comp = np.where(gmax < 0, nodes, gmax)
            return pa.table(
                {
                    "node": pa.array(nodes, type=_I64),
                    "component": pa.array(out_comp, type=_I64),
                }
            )

        hash_exchange(
            _read_sink(os.path.join(out_dir, f"round-{final_round}"), edge_schema)
            .map_batches(emit_roles, batch_format="pyarrow"),
            "key",
            resolve_roles,
            n_reducers,
            sink_dir=out_final,
        )
    return _read_sink(
        out_final, pa.schema([("node", _I64), ("component", _I64)])
    )


def _chain_body(t: pa.Table) -> pa.Table:
    """Partition body: per group, chain the sorted member ids as
    consecutive edges (a path graph).  The chain construction makes
    the downstream oracle trivial (min per group) while forcing the
    CC ALGORITHM to do real multi-hop work — a group of k members is
    a path needing O(log k) star rounds, not a clique the first round
    would collapse.

    The 63-bit ``gkey`` only ROUTES; group identity is the exact
    ``gstr`` string shipped alongside it (the crawl_diff pattern:
    hash routes, strings compare), so a gkey collision between two
    distinct groups cannot merge their components."""
    h = t.column("gkey").to_numpy(zero_copy_only=False)
    g = np.asarray(t.column("gstr").to_pylist(), dtype=object)
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((d, g, h))
    h, g, d = h[order], g[order], d[order]
    same = (h[1:] == h[:-1]) & (g[1:] == g[:-1])
    return pa.table(
        {
            "a": pa.array(d[:-1][same], type=_I64),
            "b": pa.array(d[1:][same], type=_I64),
        }
    )


def _cc_over_group_chains(ds, n_reducers: int) -> pa.Table:
    """(doc_id, gkey) Dataset → CC over the per-group chain edges →
    (doc_id, component_id), one row per doc in a group of size ≥ 2."""
    chains = hash_exchange(ds, "gkey", _chain_body, n_reducers)
    if chains is None:
        return pa.table(
            {"doc_id": pa.array([], type=_I64), "component_id": pa.array([], type=_I64)}
        )
    comp = connected_components(chains, n_reducers=n_reducers)
    return comp.rename_columns(["doc_id", "component_id"])


def cc_dup_groups(sf_dir: str, n_reducers: int = 8) -> pa.Table:
    """Exact-duplicate groups of the documents table as connected
    components: docs sharing normalized text are chained, and CC
    recovers component = min(doc_id) per duplicate group.  Only
    (doc_id, text_hash) rows shuffle; text never leaves the scan."""
    from website_indexer_ray.pipelines.textops import (
        _content_hash64,
        normalize_text,
        read_documents,
    )

    def hash_batch(batch: pa.Table) -> pa.Table:
        # gkey routes; the normalized text itself is the exact group
        # identity (gstr) compared after routing, so a 63-bit hash
        # collision cannot merge distinct duplicate groups.  Duplicate
        # texts DO ride the exchange here — this driver form trades
        # slimness for hash-exactness; the scale path for duplicate
        # grouping is textops.exact_dedup (hash rows only).
        norm = [normalize_text(t) for t in batch.column("text").to_pylist()]
        hashes = [_content_hash64(t) & 0x7FFFFFFFFFFFFFFF for t in norm]
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "gkey": pa.array(hashes, type=_I64),
                "gstr": pa.array(norm, type=pa.string()),
            }
        )

    routed = read_documents(sf_dir).map_batches(hash_batch, batch_format="pyarrow")
    return _cc_over_group_chains(routed, n_reducers)


def cc_source_groups(sf_dir: str, n_reducers: int = 8) -> pa.Table:
    """Connected components over docs chained by (source, lang):
    component_id = min(doc_id) among same-source-same-language docs.
    A ~25-member group is a 25-node path, so the star rounds do real
    multi-hop propagation while the oracle is a plain window min —
    the exactly-checkable driver form of ``connected_components``."""
    import json

    from website_indexer_ray.pipelines.textops import _content_hash64, read_documents

    def hash_batch(batch: pa.Table) -> pa.Table:
        # JSON-encode the key tuple so NULL and the literal string
        # "None" stay distinct groups, matching SQL PARTITION BY; the
        # JSON string ships as the exact group identity (gstr) and the
        # hash only routes (collision-proof grouping, ADVICE r3)
        gstr = [
            json.dumps([s, g])
            for s, g in zip(
                batch.column("source").to_pylist(), batch.column("lang").to_pylist()
            )
        ]
        keys = [_content_hash64(s) & 0x7FFFFFFFFFFFFFFF for s in gstr]
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), _I64),
                "gkey": pa.array(keys, type=_I64),
                "gstr": pa.array(gstr, type=pa.string()),
            }
        )

    routed = read_documents(
        sf_dir, columns=["doc_id", "source", "lang"]
    ).map_batches(hash_batch, batch_format="pyarrow")
    return _cc_over_group_chains(routed, n_reducers)


# --- PageRank (integer-exact damped power iteration) -----------------

_HASH_MASK = 0x7FFFFFFFFFFFFFFF


def _as_array(col) -> pa.Array:
    """Array | ChunkedArray → plain Array (no copy for single chunks)."""
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _keys_of(strings: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Routing keys for a string column — one vectorized numpy pass
    over the Arrow buffers (util.hash_strings64), no per-row Python.
    Keys only ROUTE; every consumer compares the strings exactly."""
    from website_indexer_ray.util import hash_strings64

    return pa.array(hash_strings64(strings), type=_I64)


def _tag_graph(batch: pa.Table) -> pa.Table:
    """Page rows → tagged union routed by h(dst) so each partition can
    semi-join link targets against the crawled-page set: kind 0 = node
    (crawled page url, routed by h(url)); kind 1 = edge candidate.
    Fully vectorized: list_flatten/list_parent_indices build the edge
    candidates and the keys hash through the Arrow string buffers —
    this body runs on every page×link row of the scan, so no per-row
    Python (the repo's vectorized-partition-body convention)."""
    pages = batch.filter(pc.equal(batch.column("record_type"), "page"))
    urls = pages.column("url").combine_chunks()
    links = pages.column("links").combine_chunks()
    flat = pc.list_flatten(links)
    esrc = urls.take(pc.list_parent_indices(links))
    n_nodes, n_edges = len(urls), len(flat)
    return pa.table(
        {
            "kind": pa.array(
                np.r_[np.zeros(n_nodes, np.int64), np.ones(n_edges, np.int64)]
            ),
            "src": pa.concat_arrays([urls, _as_array(esrc)]),
            "dst": pa.concat_arrays(
                [pa.array([""] * n_nodes, type=pa.string()), flat]
            ),
            "key": pa.concat_arrays(
                [_keys_of(urls), _keys_of(flat)]
            ),
        }
    )


def _graph_body(t: pa.Table) -> pa.Table:
    """Partition body: keep edge candidates whose dst IS a crawled
    page (string-exact semi-join — the int key only routes, so hash
    collisions cannot corrupt the graph), re-key surviving edges by
    h(src) for the iteration exchanges (preserving the routing key,
    which is exactly h(dst), as ``dst_key`` so no iteration ever
    re-hashes), and pass node rows through."""
    nodes = t.filter(pc.equal(t.column("kind"), 0))
    nodes = nodes.append_column("dst_key", pa.array([0] * nodes.num_rows, type=_I64))
    edges = t.filter(pc.equal(t.column("kind"), 1))
    node_set = nodes.select(["src"]).rename_columns(["node_url"])
    kept = edges.join(node_set, keys=["dst"], right_keys=["node_url"], join_type="inner")
    kept = kept.append_column("dst_key", kept.column("key"))
    kept = kept.set_column(
        kept.schema.get_field_index("key"),
        "key",
        _keys_of(kept.column("src")),
    )
    cols = ["kind", "src", "dst", "key", "dst_key"]
    return pa.concat_tables([nodes.select(cols), kept.select(cols)])


def _contrib_body(damping_pct: int):
    def body(t: pa.Table) -> pa.Table:
        ranks = t.filter(pc.equal(t.column("kind"), 0)).select(["url", "pr"])
        ranks = ranks.rename_columns(["r_url", "pr"])
        edges = t.filter(pc.equal(t.column("kind"), 1)).select(
            ["url", "dst", "dst_key"]
        )
        if not edges.num_rows:
            return pa.table(
                {
                    "key": pa.array([], type=_I64),
                    "url": pa.array([], type=pa.string()),
                    "c": pa.array([], type=_I64),
                }
            )
        deg = agg_named(
            edges.select(["url", "dst"]), "url", [("dst", "count")], ["url", "outdeg"]
        )
        e = edges.join(deg, keys=["url"]).join(ranks, keys=["url"], right_keys=["r_url"])
        pr = e.column("pr").to_numpy(zero_copy_only=False)
        od = e.column("outdeg").to_numpy(zero_copy_only=False)
        contrib = (pr * damping_pct) // (100 * od)
        return pa.table(
            {
                "key": e.column("dst_key"),
                "url": e.column("dst"),
                "c": pa.array(contrib, type=_I64),
            }
        )

    return body


def _sum_body(base: int):
    def body(t: pa.Table) -> pa.Table:
        nodes = t.filter(pc.equal(t.column("kind"), 0)).select(["url", "key"])
        contribs = t.filter(pc.equal(t.column("kind"), 1)).select(["url", "c"])
        sums = agg_named(contribs, "url", [("c", "sum")], ["s_url", "s"])
        out = nodes.join(sums, keys=["url"], right_keys=["s_url"], join_type="left outer")
        s = pc.fill_null(pc.cast(out.column("s"), _I64), 0)
        return pa.table(
            {
                "url": out.column("url"),
                "key": out.column("key"),
                "pr": pc.add(s, pa.scalar(base, type=_I64)),
            }
        )

    return body


def _from_arrow_split(tbl: pa.Table, n_blocks: int):
    step = max(4096, -(-tbl.num_rows // max(1, n_blocks)))
    parts = [tbl.slice(i, step) for i in range(0, max(1, tbl.num_rows), step)]
    return ray.data.from_arrow(parts)


def _empty_pr() -> pa.Table:
    return pa.table(
        {"url": pa.array([], type=pa.string()), "pr": pa.array([], type=_I64)}
    )


def build_link_graph(records_ds, n_reducers: int = 8) -> pa.Table | None:
    """One semi-join exchange: page records → the tagged link graph
    (node rows + link-target-verified edge rows, _GRAPH_SCHEMA).
    Build once and pass as ``graph=`` to both ``pagerank`` and
    ``triangle_count`` when querying several graph ops over the same
    checkpoint — the graph build is their shared first stage (ADVICE
    r3).  Returns None for an empty graph."""
    return hash_exchange(
        records_ds.map_batches(_tag_graph, batch_format="pyarrow"),
        "key",
        _graph_body,
        n_reducers,
    )


def pagerank(
    records_ds,
    iterations: int = 5,
    n_reducers: int = 8,
    scale: int = 10**12,
    damping_pct: int = 85,
    graph: pa.Table | None = None,
    init_ranks: pa.Table | None = None,
) -> pa.Table:
    """PageRank over the crawled-page link graph → (url, pr) sorted by
    url, in exact integer micro-rank units: r0 = scale//N;
    r_{i+1}(v) = ((100-d)·scale)//(100·N) + Σ_{u→v} (r_i(u)·d)//(100·outdeg(u)).
    All floor divisions, so the result is hash-identical to the SQL
    oracle regardless of summation order.  Dangling-node mass is
    dropped (the standard no-redistribution variant) to keep the
    semantics exactly SQL-expressible.

    ``records_ds`` is the crawl checkpoint Dataset pruned to
    (record_type, url, links).  Graph build = one exchange (semi-join
    link targets against the page set, strings compared exactly —
    int keys only route); each iteration = two exchanges (rank×edge
    join co-partitioned by src where outdeg is the co-located group
    size; contribution sum by dst).  Table mode holds the slim
    (url, pr) vector on the driver for the query contract;
    ``pagerank_write`` is the sink form where every stage lands in a
    committed parquet checkpoint instead."""
    if graph is None:
        graph = build_link_graph(records_ds, n_reducers)
    if graph is None:
        return _empty_pr()
    nodes = graph.filter(pc.equal(graph.column("kind"), 0)).select(["src", "key"])
    nodes = nodes.rename_columns(["url", "key"])
    edges = graph.filter(pc.equal(graph.column("kind"), 1)).select(
        ["src", "dst", "key", "dst_key"]
    )
    n = nodes.num_rows
    if not n:
        return _empty_pr()
    base = ((100 - damping_pct) * scale) // (100 * n)
    if init_ranks is None:
        ranks = pa.table(
            {
                "url": nodes.column("url"),
                "key": nodes.column("key"),
                "pr": pa.array([scale // n] * n, type=_I64),
            }
        )
    else:
        # Warm start (incremental maintenance after a recrawl): power
        # iteration is memoryless, so k iterations from a previous
        # run's ranks EXACTLY equal (prev_iterations + k) cold
        # iterations on an unchanged graph (pinned in pytest) — and on
        # a slightly-changed graph they converge from the old ranks
        # instead of from uniform. Nodes absent from init_ranks
        # (pages added by the recrawl) start at the uniform scale//N.
        joined = nodes.join(
            init_ranks.select(["url", "pr"]).rename_columns(["i_url", "i_pr"]),
            keys=["url"],
            right_keys=["i_url"],
            join_type="left outer",
        )
        ranks = pa.table(
            {
                "url": joined.column("url"),
                "key": joined.column("key"),
                "pr": pc.fill_null(
                    pc.cast(joined.column("i_pr"), _I64), scale // n
                ),
            }
        )
    empty_str = pa.nulls(0, pa.string())
    for _ in range(iterations):
        routed1 = pa.concat_tables(
            [
                pa.table(
                    {
                        "key": edges.column("key"),
                        "kind": pa.array([1] * edges.num_rows, type=_I64),
                        "url": edges.column("src"),
                        "dst": edges.column("dst"),
                        "dst_key": edges.column("dst_key"),
                        "pr": pa.array([0] * edges.num_rows, type=_I64),
                    }
                ),
                pa.table(
                    {
                        "key": ranks.column("key"),
                        "kind": pa.array([0] * ranks.num_rows, type=_I64),
                        "url": ranks.column("url"),
                        "dst": pa.array([""] * ranks.num_rows, type=pa.string()),
                        "dst_key": pa.array([0] * ranks.num_rows, type=_I64),
                        "pr": ranks.column("pr"),
                    }
                ),
            ]
        )
        contribs = hash_exchange(
            _from_arrow_split(routed1, n_reducers),
            "key",
            _contrib_body(damping_pct),
            n_reducers,
        )
        if contribs is None:
            contribs = pa.table(
                {"key": pa.array([], type=_I64), "url": empty_str, "c": pa.array([], type=_I64)}
            )
        routed2 = pa.concat_tables(
            [
                pa.table(
                    {
                        "key": contribs.column("key"),
                        "kind": pa.array([1] * contribs.num_rows, type=_I64),
                        "url": contribs.column("url"),
                        "c": contribs.column("c"),
                    }
                ),
                pa.table(
                    {
                        "key": nodes.column("key"),
                        "kind": pa.array([0] * nodes.num_rows, type=_I64),
                        "url": nodes.column("url"),
                        "c": pa.array([0] * nodes.num_rows, type=_I64),
                    }
                ),
            ]
        )
        ranks = hash_exchange(
            _from_arrow_split(routed2, n_reducers), "key", _sum_body(base), n_reducers
        )
    out = ranks.select(["url", "pr"])
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


# --- triangle counting (degree-ordered wedges, staged exchanges) -----

_UND_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])
_DEG_SCHEMA = pa.schema([("node", pa.string()), ("deg", _I64)])
_WEDGE_SCHEMA = pa.schema(
    [
        ("key", _I64),
        ("a", pa.string()),
        ("b", pa.string()),
        ("corner", pa.string()),
        ("kind", _I64),
    ]
)
_CORNER_SCHEMA = pa.schema([("key", _I64), ("corner", pa.string())])
_TRI_SCHEMA = pa.schema([("url", pa.string()), ("n_triangles", _I64)])


def _pair_key_of(a, b) -> pa.Array:
    """Routing key of an (a, b) url pair — vectorized join + hash."""
    return _keys_of(pc.binary_join_element_wise(a, b, "\x1f"))


def _edge_pair_rows(b: pa.Table) -> pa.Table:
    """Graph rows → undirected edge candidates routed by h(a␟b):
    (min, max) string order, self-loops dropped."""
    e = b.filter(pc.equal(b.column("kind"), 1))
    src = e.column("src").combine_chunks()
    dst = e.column("dst").combine_chunks()
    lo = pc.if_else(pc.less(src, dst), src, dst)
    hi = pc.if_else(pc.less(src, dst), dst, src)
    t = pa.table({"a": lo, "b": hi}).filter(pc.not_equal(lo, hi))
    return t.append_column("pair_key", _pair_key_of(t.column("a"), t.column("b")))


def _und_dedup_body(t: pa.Table) -> pa.Table:
    """Partition body: distinct undirected edges — Arrow sort +
    adjacent-equality run keep-first (a pair's rows are partition-
    exclusive by routing, so per-partition distinct is global)."""
    t = t.select(["a", "b"])
    n = t.num_rows
    if n < 2:
        return t
    t = t.take(
        pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
    ).combine_chunks()
    a, b = t.column("a"), t.column("b")
    eq = pc.and_(
        pc.equal(a.slice(1), a.slice(0, n - 1)),
        pc.equal(b.slice(1), b.slice(0, n - 1)),
    ).to_numpy(zero_copy_only=False)
    return t.filter(pa.array(np.r_[True, ~eq]))


def _adj_rows(b: pa.Table) -> pa.Table:
    """Deduped und edges → both-direction adjacency rows routed by
    h(node)."""
    a = b.column("a").combine_chunks()
    bb = b.column("b").combine_chunks()
    node = pa.concat_arrays([a, bb])
    return pa.table(
        {
            "node": node,
            "nbr": pa.concat_arrays([bb, a]),
            "node_key": _keys_of(node),
        }
    )


def _deg_body(t: pa.Table) -> pa.Table:
    """Partition body: per-node degree — global, because a node's
    adjacency rows are partition-exclusive and edges are pre-deduped."""
    if not t.num_rows:
        return _DEG_SCHEMA.empty_table()
    return agg_named(
        t.select(["node", "nbr"]), "node", [("nbr", "count")], ["node", "deg"]
    )


def _deg_lookup_ref(deg_tbl: pa.Table):
    """Degree lookup broadcast as (sorted int64 hash keys, degs) numpy
    arrays probed via np.searchsorted — never a Python dict (SURVEY
    §4.3: broadcast lookup sides as Arrow/numpy, never Python
    containers; a dict of 10⁹ urls re-deserializes as tens of GB per
    worker).  If two urls ever collided on the 63-bit key, both would
    read the same deterministic (min) deg value — harmless, because
    degree is only the ORDERING heuristic: the (deg, url) total order
    stays strict and globally consistent, so counts remain exact."""
    from website_indexer_ray.util import hash_strings64

    keys = hash_strings64(deg_tbl.column("node"))
    degs = deg_tbl.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((degs, keys))
    k, d = keys[order], degs[order]
    first = np.r_[True, k[1:] != k[:-1]] if len(k) else np.zeros(0, dtype=bool)
    return ray.put((k[first], d[first]))


def _wedge_body(deg_ref):
    """Partition body factory: vectorized degree-ordered wedge
    emission — higher-neighbor mask via the broadcast degree arrays,
    per-node pair enumeration with repeat/arange index algebra, Arrow
    take for the string gathers.  No per-row Python."""

    def body(t: pa.Table) -> pa.Table:
        from website_indexer_ray.util import cached_get, hash_strings64

        if not t.num_rows:
            return _WEDGE_SCHEMA.empty_table()
        degk, degv = cached_get(deg_ref)
        node = t.column("node").combine_chunks()
        nbr = t.column("nbr").combine_chunks()
        nk = t.column("node_key").to_numpy(zero_copy_only=False)
        du = degv[np.searchsorted(degk, nk)]
        dv = degv[np.searchsorted(degk, hash_strings64(nbr))]
        sgt = pc.greater(nbr, node).to_numpy(zero_copy_only=False)
        hi_mask = (dv > du) | ((dv == du) & sgt)
        sub = pa.table({"node": node, "nbr": nbr}).filter(pa.array(hi_mask))
        n = sub.num_rows
        if n < 2:
            return _WEDGE_SCHEMA.empty_table()
        sub = sub.take(
            pc.sort_indices(
                sub, sort_keys=[("node", "ascending"), ("nbr", "ascending")]
            )
        ).combine_chunks()
        snode = sub.column("node")
        snbr = sub.column("nbr")
        new = np.r_[
            True,
            ~pc.equal(snode.slice(1), snode.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            ),
        ]
        bounds = np.flatnonzero(new)
        lens = np.diff(np.r_[bounds, n])
        ends = np.repeat(bounds + lens, lens)  # group end (excl) per row
        row = np.arange(n)
        cnt = ends - row - 1  # pairs where this row is the first element
        total = int(cnt.sum())
        if not total:
            return _WEDGE_SCHEMA.empty_table()
        first = np.repeat(row, cnt)
        excl = np.repeat(np.cumsum(cnt) - cnt, cnt)
        second = first + 1 + (np.arange(total) - excl)
        aa = snbr.take(pa.array(first, type=_I64))
        bb = snbr.take(pa.array(second, type=_I64))
        return pa.table(
            {
                "key": _pair_key_of(aa, bb),
                "a": aa,
                "b": bb,
                "corner": snode.take(pa.array(first, type=_I64)),
                "kind": pa.array(np.ones(total, dtype=np.int64)),
            }
        )

    return body


def _edge_match_rows(b: pa.Table) -> pa.Table:
    """Und edges → kind-0 rows for the wedge/edge match exchange."""
    a = b.column("a").combine_chunks()
    bb = b.column("b").combine_chunks()
    return pa.table(
        {
            "key": _pair_key_of(a, bb),
            "a": a,
            "b": bb,
            "corner": pa.array([""] * len(a), type=pa.string()),
            "kind": pa.array(np.zeros(len(a), dtype=np.int64)),
        }
    )


def _match_body(t: pa.Table) -> pa.Table:
    """Partition body: wedges (kind 1) ⋈ edges (kind 0) on the EXACT
    (a, b) strings — the int key only routes.  Each match = one
    triangle credited to its three corners, re-keyed by h(corner) for
    the count exchange."""
    e = t.filter(pc.equal(t.column("kind"), 0)).select(["a", "b"])
    w = t.filter(pc.equal(t.column("kind"), 1))
    if not e.num_rows or not w.num_rows:
        return _CORNER_SCHEMA.empty_table()
    m = w.join(e, keys=["a", "b"], join_type="inner")
    corners = pa.concat_arrays(
        [
            m.column("corner").combine_chunks(),
            m.column("a").combine_chunks(),
            m.column("b").combine_chunks(),
        ]
    )
    return pa.table({"key": _keys_of(corners), "corner": corners})


def _corner_count_body(t: pa.Table) -> pa.Table:
    if not t.num_rows:
        return _TRI_SCHEMA.empty_table()
    return agg_named(
        t.select(["corner"]), "corner", [("corner", "count")], ["url", "n_triangles"]
    )


def _triangle_stages(records_ds, n_reducers: int, out_dir: str | None = None,
                     graph: pa.Table | None = None):
    """Shared stage chain for both triangle forms: graph semi-join →
    undirected dedup → degree count → wedge emission → edge match →
    per-corner count, every stage a keyed exchange.  With ``out_dir``
    each stage lands in a committed parquet sink and the next STREAMS
    from it (nothing O(edges) driver-side; resume at the last
    committed stage); without, exchanges return in-memory tables (the
    driver form for query-contract graphs).  The only driver-resident
    object either way is the slim (node, deg) table, which must exist
    in full to broadcast the degree lookup.  Returns (counts_ds,
    counts_tbl) — counts_tbl is None in sink mode."""
    import os

    from website_indexer_ray.state.exchange import sink_committed

    def stage(name, routed, key, body, schema):
        if out_dir is None:
            tbl = hash_exchange(routed, key, body, n_reducers)
            if tbl is None:
                tbl = schema.empty_table()
            return _from_arrow_split(tbl, n_reducers), tbl
        d = os.path.join(out_dir, name)
        if not sink_committed(d):
            hash_exchange(routed, key, body, n_reducers, sink_dir=d)
        return _read_sink(d, schema), None

    if graph is not None and out_dir is None:
        # precomputed shared graph (build_link_graph) — skip the
        # semi-join exchange
        graph_ds = _from_arrow_split(graph, n_reducers)
    else:
        graph_ds, _ = stage(
            "graph",
            records_ds.map_batches(_tag_graph, batch_format="pyarrow"),
            "key",
            _graph_body,
            _GRAPH_SCHEMA,
        )
    und_ds, _ = stage(
        "und",
        graph_ds.map_batches(_edge_pair_rows, batch_format="pyarrow"),
        "pair_key",
        _und_dedup_body,
        _UND_SCHEMA,
    )
    deg_ds, deg_tbl = stage(
        "deg",
        und_ds.map_batches(_adj_rows, batch_format="pyarrow"),
        "node_key",
        _deg_body,
        _DEG_SCHEMA,
    )
    if deg_tbl is None:
        parts = collect_table_blocks(deg_ds)
        deg_tbl = pa.concat_tables(parts) if parts else _DEG_SCHEMA.empty_table()
    if not deg_tbl.num_rows:
        empty = _TRI_SCHEMA.empty_table()
        return ray.data.from_arrow(empty), empty
    deg_ref = _deg_lookup_ref(deg_tbl)
    wedges_ds, _ = stage(
        "wedges",
        und_ds.map_batches(_adj_rows, batch_format="pyarrow"),
        "node_key",
        _wedge_body(deg_ref),
        _WEDGE_SCHEMA,
    )
    corners_ds, _ = stage(
        "corners",
        wedges_ds.union(
            und_ds.map_batches(_edge_match_rows, batch_format="pyarrow")
        ),
        "key",
        _match_body,
        _CORNER_SCHEMA,
    )
    return stage("counts", corners_ds, "key", _corner_count_body, _TRI_SCHEMA)


def triangle_count(
    records_ds,
    n_reducers: int = 8,
    per_node: bool = False,
    graph: pa.Table | None = None,
) -> pa.Table:
    """Triangles in the undirected crawled-page link graph — the
    degree-ordered node-iterator (Schank 2007 / the standard MapReduce
    form): every node emits wedges only among its HIGHER-ordered
    neighbors (order = (degree, url)), bounding total wedge volume by
    O(m^1.5) regardless of hot hubs, and one pair-keyed exchange
    matches wedges against the edge set (string-exact — int keys only
    route).  Returns one row (n_triangles) or per-node counts
    (per_node=True; each triangle credited to all three corners).

    Driver form for query-contract graphs: exchanges return in-memory
    tables between stages, but every BODY is the same vectorized code
    as the sink form and only the slim per-corner counts + (node, deg)
    tables land on the driver.  ``triangle_count_write`` is the scale
    form (committed parquet sinks between stages)."""
    _, counts_tbl = _triangle_stages(records_ds, n_reducers, graph=graph)
    if per_node:
        return counts_tbl.take(
            pc.sort_indices(counts_tbl, sort_keys=[("url", "ascending")])
        )
    s = pc.sum(counts_tbl.column("n_triangles")).as_py() if counts_tbl.num_rows else 0
    return pa.table({"n_triangles": pa.array([(s or 0) // 3], type=_I64)})


def triangle_count_write(records_ds, out_dir: str, n_reducers: int = 8):
    """Sink form of ``triangle_count`` (the ``pagerank_write``
    pattern): graph build, undirected-edge dedup, degree count, wedge
    emission, edge match and per-corner counts each land in a
    committed parquet dir under ``out_dir``; the next stage streams
    from the previous sink, so nothing O(edges) or O(wedges) ever
    materializes driver-side — only the slim (node, deg) table, which
    any wedge order needs in full to broadcast.  A killed run resumes
    at the last committed stage.  Returns the per-node counts as a
    (url, n_triangles) Dataset."""
    import json
    import os

    params = {"n_reducers": n_reducers}
    meta_path = os.path.join(out_dir, "meta.json")
    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if {k: meta.get(k) for k in params} != params:
            raise ValueError(
                f"triangle_count_write resume with different parameters: "
                f"committed {meta} vs requested {params}; use a fresh out_dir"
            )
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, meta_path)
    counts_ds, _ = _triangle_stages(records_ds, n_reducers, out_dir=out_dir)
    return counts_ds


def _read_sink(sink_dir: str, schema: pa.Schema):
    """Committed exchange sink → Dataset (empty-with-schema when the
    exchange produced no rows — only a ``_SUCCESS`` manifest)."""
    import glob as _glob
    import os

    files = sorted(_glob.glob(os.path.join(sink_dir, "*.parquet")))
    if not files:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.read_parquet(files)


_GRAPH_SCHEMA = pa.schema(
    [
        ("kind", _I64),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("key", _I64),
        ("dst_key", _I64),
    ]
)
_CONTRIB_SCHEMA = pa.schema([("key", _I64), ("url", pa.string()), ("c", _I64)])
_RANK_SCHEMA = pa.schema([("url", pa.string()), ("key", _I64), ("pr", _I64)])


def pagerank_write(
    records_ds,
    out_dir: str,
    iterations: int = 5,
    n_reducers: int = 8,
    scale: int = 10**12,
    damping_pct: int = 85,
):
    """Sink form of ``pagerank`` for graphs whose rank vector cannot
    live on the driver: every stage (graph build, each iteration's
    contribution and rank exchanges) lands in its own committed
    parquet dir under ``out_dir``, and the next stage STREAMS from it
    — nothing O(nodes) or O(edges) ever materializes driver-side.
    A killed run resumes at the last committed stage (the crawl
    checkpoints' ``_SUCCESS`` protocol), and a finished k-iteration
    run is a valid prefix for a later (k+j)-iteration call.  Returns
    the final ranks as a url-keyed Dataset (url, pr)."""
    import json
    import os

    from website_indexer_ray.state.exchange import sink_committed

    graph_dir = os.path.join(out_dir, "graph")
    if not sink_committed(graph_dir):
        hash_exchange(
            records_ds.map_batches(_tag_graph, batch_format="pyarrow"),
            "key",
            _graph_body,
            n_reducers,
            sink_dir=graph_dir,
        )

    def _nodes_ds():
        ds = _read_sink(graph_dir, _GRAPH_SCHEMA)
        return ds.map_batches(
            lambda b: b.filter(pc.equal(b.column("kind"), 0)),
            batch_format="pyarrow",
        )

    # Commit the run parameters with the node count: resume reuses
    # committed stages, so resuming with DIFFERENT parameters would
    # silently mix damping factors / scales across iterations.  (Same
    # contract as the crawl checkpoints: one out_dir == one (input,
    # params) run; re-parameterize into a fresh dir.)
    params = {"scale": scale, "damping_pct": damping_pct, "n_reducers": n_reducers}
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if {k: meta.get(k) for k in params} != params:
            raise ValueError(
                f"pagerank_write resume with different parameters: committed "
                f"{meta} vs requested {params}; use a fresh out_dir"
            )
        n = meta["n_nodes"]
    else:
        n = _nodes_ds().count()
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_nodes": n, **params}, f)
        os.replace(tmp, meta_path)  # atomic: a crash never leaves a torn file
    if not n:
        return ray.data.from_arrow(
            pa.schema([("url", pa.string()), ("pr", _I64)]).empty_table()
        )
    base = ((100 - damping_pct) * scale) // (100 * n)
    r0 = scale // n

    from website_indexer_ray.util import committed_parquet_write

    ranks_dir = os.path.join(out_dir, "ranks-0")

    def _init_ranks(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("src"),
                "key": b.column("key"),
                "pr": pa.array([r0] * b.num_rows, type=_I64),
            }
        )

    committed_parquet_write(
        _nodes_ds().map_batches(_init_ranks, batch_format="pyarrow"), ranks_dir
    )

    def _edge_rows(b: pa.Table) -> pa.Table:
        e = b.filter(pc.equal(b.column("kind"), 1))
        return pa.table(
            {
                "key": e.column("key"),
                "kind": pa.array([1] * e.num_rows, type=_I64),
                "url": e.column("src"),
                "dst": e.column("dst"),
                "dst_key": e.column("dst_key"),
                "pr": pa.array([0] * e.num_rows, type=_I64),
            }
        )

    def _rank_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("key"),
                "kind": pa.array([0] * b.num_rows, type=_I64),
                "url": b.column("url"),
                "dst": pa.array([""] * b.num_rows, type=pa.string()),
                "dst_key": pa.array([0] * b.num_rows, type=_I64),
                "pr": b.column("pr"),
            }
        )

    def _contrib_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("key"),
                "kind": pa.array([1] * b.num_rows, type=_I64),
                "url": b.column("url"),
                "c": b.column("c"),
            }
        )

    def _node_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("key"),
                "kind": pa.array([0] * b.num_rows, type=_I64),
                "url": b.column("src"),
                "c": pa.array([0] * b.num_rows, type=_I64),
            }
        )

    prev_ranks = ranks_dir
    for i in range(1, iterations + 1):
        contrib_dir = os.path.join(out_dir, f"contrib-{i}")
        if not sink_committed(contrib_dir):
            routed = (
                _read_sink(graph_dir, _GRAPH_SCHEMA)
                .map_batches(_edge_rows, batch_format="pyarrow")
                .union(
                    _read_sink(prev_ranks, _RANK_SCHEMA).map_batches(
                        _rank_rows, batch_format="pyarrow"
                    )
                )
            )
            hash_exchange(
                routed, "key", _contrib_body(damping_pct), n_reducers,
                sink_dir=contrib_dir,
            )
        rank_dir = os.path.join(out_dir, f"ranks-{i}")
        if not sink_committed(rank_dir):
            routed = (
                _read_sink(contrib_dir, _CONTRIB_SCHEMA)
                .map_batches(_contrib_rows, batch_format="pyarrow")
                .union(_nodes_ds().map_batches(_node_rows, batch_format="pyarrow"))
            )
            hash_exchange(
                routed, "key", _sum_body(base), n_reducers, sink_dir=rank_dir
            )
        prev_ranks = rank_dir
    return _read_sink(prev_ranks, _RANK_SCHEMA).map_batches(
        lambda b: b.select(["url", "pr"]), batch_format="pyarrow"
    )
