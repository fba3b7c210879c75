"""Graph operators (pipelines/graphops.py): distributed connected
components (large-star/small-star exchange rounds) and integer-exact
PageRank, checked against a sequential union-find, a pure-Python
power-iteration reference, and the same DuckDB oracles the driver
gate runs."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from website_indexer_ray.pipelines import graphops

SF_DIR = "/root/testdata/sf0.001"


def _uf_components(edges):
    """Sequential union-find: node -> min id of its component, over
    nodes incident to at least one non-self-loop edge."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


def _edges_table(a, b):
    return pa.table(
        {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
    )


class TestConnectedComponents:
    @pytest.mark.parametrize("n,m,seed", [(100, 60, 0), (200, 150, 1), (500, 480, 2), (50, 200, 3)])
    def test_matches_union_find_on_random_graphs(self, n, m, seed):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        expected = _uf_components(zip(a.tolist(), b.tolist()))
        out = graphops.connected_components(_edges_table(a, b))
        got = dict(zip(out["node"].to_pylist(), out["component"].to_pylist()))
        assert got == expected

    def test_path_graph_logarithmic_rounds(self):
        # a 2000-node path: min-label propagation would need 2000
        # rounds; star rounds converge within the 64-round bound.
        k = 2000
        out = graphops.connected_components(
            _edges_table(np.arange(k - 1), np.arange(1, k))
        )
        assert out["node"].to_pylist() == list(range(k))
        assert out["component"].to_pylist() == [0] * k

    def test_star_graph_hot_hub(self):
        # every edge shares the hub: the hub's whole adjacency lands in
        # one partition (documented worst case) and must still resolve
        k = 10_000
        out = graphops.connected_components(
            _edges_table(np.zeros(k, dtype=np.int64), np.arange(1, k + 1))
        )
        assert out.num_rows == k + 1
        assert set(out["component"].to_pylist()) == {0}

    def test_self_loops_and_duplicates_ignored(self):
        out = graphops.connected_components(
            _edges_table([5, 5, 1, 2, 2], [5, 5, 2, 1, 1])
        )
        assert out["node"].to_pylist() == [1, 2]
        assert out["component"].to_pylist() == [1, 1]

    def test_empty(self):
        out = graphops.connected_components(_edges_table([], []))
        assert out.num_rows == 0
        assert out.schema.names == ["node", "component"]


class TestConnectedComponentsWrite:
    def _collect(self, ds):
        tbl = pa.concat_tables(
            [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
        )
        return sorted(zip(tbl["node"].to_pylist(), tbl["component"].to_pylist()))

    def test_sink_form_matches_table_mode_and_resumes(self, tmp_path):
        import os

        rng = np.random.default_rng(11)
        a = rng.integers(0, 300, 500).astype(np.int64)
        b = rng.integers(0, 300, 500).astype(np.int64)
        tbl = _edges_table(a, b)
        expected = graphops.connected_components(tbl)
        exp = list(
            zip(expected["node"].to_pylist(), expected["component"].to_pylist())
        )
        out = str(tmp_path / "cc")
        ds = ray.data.from_arrow([tbl.slice(i, 100) for i in range(0, 500, 100)])
        got = graphops.connected_components_write(ds, out)
        assert self._collect(got) == exp
        # committed rounds are reused: uncommit ONLY the final
        # components stage and re-run — round dirs keep their mtimes
        os.remove(os.path.join(out, "components", "_SUCCESS"))
        stamp = os.path.getmtime(os.path.join(out, "round-0", "_SUCCESS"))
        got2 = graphops.connected_components_write(ds, out)
        assert self._collect(got2) == exp
        assert os.path.getmtime(os.path.join(out, "round-0", "_SUCCESS")) == stamp
        # resume with different parameters must refuse, not silently
        # serve the previous run's components
        with pytest.raises(ValueError, match="different parameters"):
            graphops.connected_components_write(ds, out, n_reducers=4)


class TestGraphProperties:
    """Hypothesis property tests: the distributed algorithms equal
    their sequential references on arbitrary small graphs (shrinking
    finds minimal counterexamples if the star rounds / wedge logic
    ever regress)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    edges_strategy = st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=60,
    )

    @settings(max_examples=25, deadline=None)
    @given(edges_strategy)
    def test_cc_equals_union_find(self, edges):
        a = np.array([e[0] for e in edges], dtype=np.int64)
        b = np.array([e[1] for e in edges], dtype=np.int64)
        out = graphops.connected_components(_edges_table(a, b), n_reducers=4)
        got = dict(zip(out["node"].to_pylist(), out["component"].to_pylist()))
        assert got == _uf_components(edges)

    @settings(max_examples=25, deadline=None)
    @given(edges_strategy)
    def test_triangles_equal_bruteforce(self, edges):
        urls = [f"u{i}" for i in range(31)]
        adj: dict[int, set] = {}
        und = set()
        for x, y in edges:
            if x == y:
                continue
            und.add((min(x, y), max(x, y)))
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        expected = sum(
            1
            for (x, y) in und
            for z in range(31)
            if z > y and (y, z) in und and (x, z) in und
        )
        rows = [
            ("page", urls[i], [urls[j] for j in sorted(adj.get(i, ()))])
            for i in range(31)
        ]
        tbl = pa.table(
            {
                "record_type": [r[0] for r in rows],
                "url": [r[1] for r in rows],
                "links": pa.array(
                    [r[2] for r in rows], type=pa.list_(pa.string())
                ),
            }
        )
        out = graphops.triangle_count(ray.data.from_arrow(tbl), n_reducers=4)
        assert out["n_triangles"].to_pylist() == [expected]


class TestCCGroupQueries:
    def test_cc_dup_groups_planted(self, tmp_path):
        # plant two duplicate groups (sizes 4 and 3, whitespace/case
        # variants of the same normalized text) among unique docs
        texts = {
            0: "The quick brown fox",
            1: "the  quick brown FOX ",  # dup of 0
            2: "something else entirely",
            3: "THE QUICK  BROWN FOX",  # dup of 0
            4: "unique document four",
            5: "  the quick brown fox",  # dup of 0
            6: "repeated paragraph here",
            7: "Repeated  Paragraph HERE",  # dup of 6
            8: "repeated paragraph here ",  # dup of 6
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(sorted(texts), type=pa.int64()),
                    "text": [texts[k] for k in sorted(texts)],
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = graphops.cc_dup_groups(str(tmp_path))
        got = dict(zip(out["doc_id"].to_pylist(), out["component_id"].to_pylist()))
        assert got == {0: 0, 1: 0, 3: 0, 5: 0, 6: 6, 7: 6, 8: 6}

    def test_cc_source_groups_matches_oracle(self):
        out = graphops.cc_source_groups(SF_DIR)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        gold = con.execute(
            """
            SELECT doc_id,
                   CAST(MIN(doc_id) OVER (PARTITION BY source, lang)
                        AS BIGINT) AS component_id
            FROM documents
            QUALIFY COUNT(*) OVER (PARTITION BY source, lang) > 1
            ORDER BY doc_id
            """
        ).fetch_arrow_table()
        assert out.num_rows == gold.num_rows > 0
        assert out["doc_id"].to_pylist() == gold["doc_id"].to_pylist()
        assert out["component_id"].to_pylist() == gold["component_id"].to_pylist()


def test_near_dedup_distributed_cc_equals_union_find():
    """The star-round CC and the driver union-find label components
    identically (min doc_id), so the near-dup keep list is the same
    through either path."""
    from website_indexer_ray.pipelines import textops

    def ids(ds):
        return sorted(
            i
            for b in ds.iter_batches(batch_format="pyarrow")
            for i in b["doc_id"].to_pylist()
        )

    uf = ids(textops.near_dedup_keep_ds(SF_DIR))
    cc = ids(textops.near_dedup_keep_ds(SF_DIR, distributed_cc=True))
    assert uf == cc and len(uf) > 0


def _records_table():
    """Tiny crawl-records-shaped table: A→B,C + external X (dropped);
    B→C; C→A (a cycle); D dangling; one non-page row."""
    rows = [
        ("page", "A", ["B", "C", "X"]),
        ("page", "B", ["C"]),
        ("page", "C", ["A"]),
        ("page", "D", []),
        ("error", "E", []),
    ]
    return pa.table(
        {
            "record_type": [r[0] for r in rows],
            "url": [r[1] for r in rows],
            "links": pa.array([r[2] for r in rows], type=pa.list_(pa.string())),
        }
    )


def _pagerank_reference(nodes, edges, iterations=5, scale=10**12, d=85):
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    base = ((100 - d) * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        nr = {v: base for v in nodes}
        for s, t in edges:
            nr[t] += (r[s] * d) // (100 * outdeg[s])
        r = nr
    return r


class TestPagerank:
    def test_matches_reference_and_handles_dangling(self):
        got = graphops.pagerank(ray.data.from_arrow(_records_table()), iterations=5)
        expected = _pagerank_reference(
            ["A", "B", "C", "D"], [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")]
        )
        assert dict(zip(got["url"].to_pylist(), got["pr"].to_pylist())) == expected
        # sorted by url, ints, dangling D present with base-only mass
        assert got["url"].to_pylist() == ["A", "B", "C", "D"]
        assert got["pr"].to_pylist()[3] == 37_500_000_000

    def test_matches_sql_oracle(self, tmp_path):
        # the exact SQL the driver oracle runs (unrolled CTEs), over
        # the same records parquet
        import __ray_entry__ as e

        path = tmp_path / "records.parquet"
        pq.write_table(_records_table(), path)
        got = graphops.pagerank(ray.data.from_arrow(_records_table()), iterations=5)
        gold = duckdb.connect().execute(
            e._pagerank_sql(f"read_parquet('{path}')")
        ).fetch_arrow_table()
        assert got["url"].to_pylist() == gold["url"].to_pylist()
        assert got["pr"].to_pylist() == gold["pr"].to_pylist()

    def test_mass_conservation_bound(self):
        # total integer mass never exceeds scale (floor division only
        # ever loses mass) and never drops below the base floor
        got = graphops.pagerank(ray.data.from_arrow(_records_table()), iterations=3)
        total = sum(got["pr"].to_pylist())
        assert total <= 10**12
        assert min(got["pr"].to_pylist()) >= ((100 - 85) * 10**12) // (100 * 4)

    def test_empty_input(self):
        empty = _records_table().slice(4, 1)  # only the error row
        got = graphops.pagerank(ray.data.from_arrow(empty))
        assert got.num_rows == 0
        assert got.schema.names == ["url", "pr"]


class TestTriangleCount:
    def _rec(self, rows):
        return pa.table(
            {
                "record_type": [r[0] for r in rows],
                "url": [r[1] for r in rows],
                "links": pa.array(
                    [r[2] for r in rows], type=pa.list_(pa.string())
                ),
            }
        )

    def test_known_graphs(self):
        k4 = self._rec(
            [("page", u, [v for v in "ABCD" if v != u]) for u in "ABCD"]
        )
        out = graphops.triangle_count(ray.data.from_arrow(k4))
        assert out["n_triangles"].to_pylist() == [4]
        per = graphops.triangle_count(ray.data.from_arrow(k4), per_node=True)
        assert per["n_triangles"].to_pylist() == [3, 3, 3, 3]
        star = self._rec(
            [("page", "H", ["A", "B", "C"])]
            + [("page", u, []) for u in "ABC"]
        )
        assert graphops.triangle_count(ray.data.from_arrow(star))[
            "n_triangles"
        ].to_pylist() == [0]

    def test_direction_and_duplicates_collapse(self):
        # A->B and B->A is ONE undirected edge; duplicate links ignored
        g = self._rec(
            [
                ("page", "A", ["B", "B", "C"]),
                ("page", "B", ["A", "C"]),
                ("page", "C", ["A"]),
            ]
        )
        out = graphops.triangle_count(ray.data.from_arrow(g))
        assert out["n_triangles"].to_pylist() == [1]

    def test_empty(self):
        g = self._rec([("error", "E", [])])
        assert graphops.triangle_count(ray.data.from_arrow(g))[
            "n_triangles"
        ].to_pylist() == [0]


class TestTriangleCountWrite:
    def _random_graph(self, n=60, m=220, seed=7):
        rng = np.random.default_rng(seed)
        urls = [f"https://t.example/p{i}" for i in range(n)]
        links = [set() for _ in range(n)]
        for _ in range(m):
            x, y = rng.integers(0, n, size=2)
            if x != y:
                links[x].add(urls[y])
        return pa.table(
            {
                "record_type": ["page"] * n,
                "url": urls,
                "links": pa.array(
                    [sorted(l) for l in links], type=pa.list_(pa.string())
                ),
            }
        )

    def _collect(self, ds):
        tbl = pa.concat_tables(
            [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
        )
        return tbl.take(
            pa.compute.sort_indices(tbl, sort_keys=[("url", "ascending")])
        )

    def test_sink_form_matches_table_mode_and_resumes(self, tmp_path):
        g = self._random_graph()
        expected = graphops.triangle_count(
            ray.data.from_arrow(g), n_reducers=4, per_node=True
        )
        out = self._collect(
            graphops.triangle_count_write(
                ray.data.from_arrow(g), str(tmp_path / "tri"), n_reducers=4
            )
        )
        assert out.to_pydict() == expected.to_pydict()
        # resume: nuke the final counts sink; earlier committed stages
        # must be reused and the result identical
        import shutil

        shutil.rmtree(tmp_path / "tri" / "counts")
        out2 = self._collect(
            graphops.triangle_count_write(
                ray.data.from_arrow(g), str(tmp_path / "tri"), n_reducers=4
            )
        )
        assert out2.to_pydict() == expected.to_pydict()

    def test_resume_with_different_params_refuses(self, tmp_path):
        g = self._random_graph(n=10, m=20)
        graphops.triangle_count_write(
            ray.data.from_arrow(g), str(tmp_path / "t"), n_reducers=4
        )
        with pytest.raises(ValueError, match="different parameters"):
            graphops.triangle_count_write(
                ray.data.from_arrow(g), str(tmp_path / "t"), n_reducers=2
            )


class TestPagerankWarmStart:
    def _ds(self):
        urls = [f"https://w.example/{i}" for i in range(15)]
        links = [
            [urls[(i + 1) % 15], urls[(i * 7 + 2) % 15]] for i in range(15)
        ]
        return ray.data.from_arrow(
            pa.table(
                {
                    "record_type": ["page"] * 15,
                    "url": urls,
                    "links": pa.array(links, type=pa.list_(pa.string())),
                }
            )
        )

    def test_warm_k_equals_cold_longer(self):
        """Power iteration is memoryless: 2 warm iterations from the
        5-iteration ranks are BIT-identical to 7 cold iterations —
        the exactness contract for incremental rank maintenance after
        a recrawl."""
        cold5 = graphops.pagerank(self._ds(), iterations=5, n_reducers=4)
        warm = graphops.pagerank(
            self._ds(), iterations=2, n_reducers=4, init_ranks=cold5
        )
        cold7 = graphops.pagerank(self._ds(), iterations=7, n_reducers=4)
        assert warm.to_pydict() == cold7.to_pydict()

    def test_new_nodes_start_uniform(self):
        """Nodes missing from init_ranks (recrawl-added pages) start
        at the uniform rank — a partial init table is accepted."""
        cold = graphops.pagerank(self._ds(), iterations=3, n_reducers=4)
        partial_init = cold.slice(0, 5)
        out = graphops.pagerank(
            self._ds(), iterations=1, n_reducers=4, init_ranks=partial_init
        )
        assert out.num_rows == cold.num_rows  # every node still ranked
        assert sorted(out.column("url").to_pylist()) == sorted(
            cold.column("url").to_pylist()
        )


class TestSharedGraphBuild:
    def test_shared_graph_equals_independent_builds(self):
        """build_link_graph passed to both ops must give bit-identical
        results to each op building its own graph."""
        urls = [f"https://g.example/{i}" for i in range(12)]
        links = [
            [urls[(i + 1) % 12], urls[(i + 2) % 12], urls[(i * 5) % 12]]
            for i in range(12)
        ]
        tbl = pa.table(
            {
                "record_type": ["page"] * 12,
                "url": urls,
                "links": pa.array(links, type=pa.list_(pa.string())),
            }
        )
        ds = ray.data.from_arrow(tbl)
        graph = graphops.build_link_graph(ds, n_reducers=4)
        assert graph is not None
        pr_shared = graphops.pagerank(None, n_reducers=4, graph=graph)
        pr_own = graphops.pagerank(ray.data.from_arrow(tbl), n_reducers=4)
        assert pr_shared.to_pydict() == pr_own.to_pydict()
        tri_shared = graphops.triangle_count(
            None, n_reducers=4, per_node=True, graph=graph
        )
        tri_own = graphops.triangle_count(
            ray.data.from_arrow(tbl), n_reducers=4, per_node=True
        )
        assert tri_shared.to_pydict() == tri_own.to_pydict()


class TestCCSinkAutoSwitch:
    def test_equality_across_the_switch_boundary(self):
        """The driver form and the auto-switched sink form must agree
        bit-for-bit on the same graph (threshold forced to 0 edges)."""
        rng = np.random.default_rng(11)
        a = rng.integers(0, 500, size=800)
        b = rng.integers(0, 500, size=800)
        tbl = _edges_table(a, b)
        driver = graphops.connected_components(tbl, n_reducers=4)
        switched = graphops.connected_components(
            tbl, n_reducers=4, sink_threshold=0
        )
        assert switched.to_pydict() == driver.to_pydict()


class TestPagerankWrite:
    def _collect(self, ds):
        tbl = pa.concat_tables(
            [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
        )
        return sorted(zip(tbl["url"].to_pylist(), tbl["pr"].to_pylist()))

    def test_sink_form_matches_table_mode(self, tmp_path):
        table_mode = graphops.pagerank(
            ray.data.from_arrow(_records_table()), iterations=3
        )
        sink_mode = graphops.pagerank_write(
            ray.data.from_arrow(_records_table()), str(tmp_path / "pr"), iterations=3
        )
        expected = list(
            zip(table_mode["url"].to_pylist(), table_mode["pr"].to_pylist())
        )
        assert self._collect(sink_mode) == expected

    def test_resume_with_different_params_refuses(self, tmp_path):
        out = str(tmp_path / "pr")
        graphops.pagerank_write(
            ray.data.from_arrow(_records_table()), out, iterations=1
        )
        with pytest.raises(ValueError, match="different parameters"):
            graphops.pagerank_write(
                ray.data.from_arrow(_records_table()),
                out,
                iterations=2,
                damping_pct=50,
            )

    def test_resume_extends_iteration_prefix_and_recovers_crash(self, tmp_path):
        import os

        out = str(tmp_path / "pr")
        graphops.pagerank_write(
            ray.data.from_arrow(_records_table()), out, iterations=2
        )
        # the 2-iteration run is a committed prefix: stage dirs for
        # iterations 1-2 must not be recomputed by the 4-iteration call
        stamp = os.path.getmtime(
            os.path.join(out, "ranks-2", "_SUCCESS")
        )
        # simulate a crash in a LATER stage by pre-creating a dirty,
        # uncommitted contrib-3 (no _SUCCESS): the resume must redo it
        os.makedirs(os.path.join(out, "contrib-3"), exist_ok=True)
        with open(os.path.join(out, "contrib-3", "part-99999.parquet"), "w") as f:
            f.write("garbage")
        got = graphops.pagerank_write(
            ray.data.from_arrow(_records_table()), out, iterations=4
        )
        assert os.path.getmtime(os.path.join(out, "ranks-2", "_SUCCESS")) == stamp
        fresh = graphops.pagerank(ray.data.from_arrow(_records_table()), iterations=4)
        assert self._collect(got) == list(
            zip(fresh["url"].to_pylist(), fresh["pr"].to_pylist())
        )
