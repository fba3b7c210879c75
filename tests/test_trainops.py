"""Training-data operators (textops / annops / multimodal /
relational) against DuckDB oracles and recall/structural invariants,
at sf0.001 so the whole module stays fast.

Mirrors the driver's correctness protocol: row count + column names +
values vs the equivalent SQL where one exists; approximate operators
(LSH variants) are checked for recall against their exact baselines.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def assert_matches_sql(table: pa.Table, con, sql: str):
    gold = con.execute(sql).fetch_arrow_table()
    assert table.num_rows == gold.num_rows
    assert sorted(table.schema.names) == sorted(gold.schema.names)
    for name in table.schema.names:
        mine = table.column(name).to_pylist()
        theirs = gold.column(name).to_pylist()
        assert mine == theirs, name


class TestTextOps:
    def test_exact_dedup(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        out = textops.exact_dedup(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT MIN(doc_id) AS doc_id FROM documents
               GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
               ORDER BY doc_id""",
        )

    def test_token_count(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        out = textops.token_count(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT doc_id,
                      length(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tokens
               FROM documents ORDER BY doc_id""",
        )

    def test_quality_score_monotonic(self, ray_session):
        from website_indexer_ray.pipelines import textops

        out = textops.quality_score(SF_DIR)
        assert out.num_rows > 0
        n_chars = out.column("n_chars").to_pylist()
        n_words = out.column("n_words").to_pylist()
        assert all(c >= w for c, w in zip(n_chars, n_words))
        assert all(0 <= p <= 1000 for p in out.column("stop_permille").to_pylist())

    def test_lang_id_shape(self, ray_session):
        from website_indexer_ray.pipelines import textops

        out = textops.lang_id(SF_DIR)
        langs = set(out.column("lang_pred").to_pylist())
        assert langs <= {"en", "es", "de", "fr", "und"}
        assert out.num_rows == 500

    def test_fingerprint_deterministic(self, ray_session):
        from website_indexer_ray.pipelines import textops

        a = textops.fingerprint(SF_DIR)
        b = textops.fingerprint(SF_DIR)
        assert a.equals(b)
        assert all(n >= 0 for n in a.column("n_fingerprints").to_pylist())

    def test_fingerprint_matches_winnowing_loop(self, ray_session, tmp_path):
        """The vectorized form's algebraic identities (count =
        ceil(grams/window), min over picks = global min) pinned
        against the literal strided-window winnowing loop using the
        SAME gram hash, on whitespace-messy docs."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import textops
        from website_indexer_ray.util import hash_strings64

        texts = [
            "",
            "   \t\n ",
            "one",
            "one two three four",  # fewer tokens than k
            "the quick  brown\tfox jumps over the lazy dog again",
            "  lead and trail  ",
            ("w" + " w".join(str(i % 7) for i in range(40))),
            "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            tmp_path / "documents.parquet",
        )
        k, window = 5, 4
        got = textops.fingerprint(str(tmp_path), k=k, window=window)

        for doc_id, t in enumerate(texts):
            toks = t.split()
            grams = [
                " ".join(toks[i : i + k])
                for i in range(max(0, len(toks) - k + 1))
            ]
            if grams:
                h = hash_strings64(pa.array(grams)).tolist()
                picks = {
                    min(
                        range(i, min(i + window, len(h))),
                        key=lambda j: h[j],
                    )
                    for i in range(0, len(h), window)
                }
                fps = sorted(h[j] for j in picks)
                want_n, want_min = len(fps), fps[0]
            else:
                want_n, want_min = 0, 0
            row = got.filter(
                pc.equal(got.column("doc_id"), pa.scalar(doc_id, pa.int64()))
            )
            assert row.column("n_fingerprints")[0].as_py() == want_n, doc_id
            assert row.column("min_fingerprint")[0].as_py() == want_min, doc_id

    def test_minhash_recall_vs_exact(self, ray_session):
        """Planted near-dups must surface through the LSH bands."""
        from website_indexer_ray.pipelines import textops

        base = [
            f"the quick brown fox jumps over the lazy dog variant {i} "
            "with some shared trailing content that is identical across docs"
            for i in range(10)
        ]
        texts = base + [t + " tiny suffix change" for t in base[:5]]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        pairs = textops.minhash_lsh_pairs("", jaccard_threshold=0.5, documents=docs)
        found = set(
            zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist())
        )
        for i in range(5):
            assert (i, 10 + i) in found, f"planted near-dup {i} missed"

    def test_paragraph_dedup(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        out = textops.paragraph_dedup(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """WITH p AS (
                 SELECT doc_id, unnest(string_split(text, '. ')) AS para
                 FROM documents
               ), d AS (SELECT para, COUNT(*) AS c FROM p GROUP BY para)
               SELECT p.doc_id, COUNT(*) AS n_paragraphs,
                      CAST(SUM(CASE WHEN d.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_dup_paragraphs
               FROM p JOIN d USING (para)
               GROUP BY p.doc_id ORDER BY p.doc_id""",
        )

    def test_near_dedup_keep(self, ray_session):
        """Planted duplicate chains collapse to one kept doc per
        component (the min doc_id), uniques survive."""
        import pyarrow as pa

        from website_indexer_ray.pipelines import textops

        base = (
            "the quick brown fox jumps over the lazy dog with lots of "
            "shared content that makes these documents near duplicates"
        )
        texts = [
            base,                      # 0: kept (component root)
            base + " tiny suffix",     # 1: dup of 0
            base + " other suffix",    # 2: dup of 0/1 (chain)
            "completely different words about finance reports and data "
            "pipelines nothing shared here at all with the fox story",  # 3
        ]
        docs = pa.table(
            {
                "doc_id": pa.array(range(4), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        kept = textops.near_dedup_keep("", jaccard_threshold=0.5, documents=docs)
        assert kept.column("doc_id").to_pylist() == [0, 3]

    def test_write_forms_match_table_forms(self, ray_session, tmp_path):
        """Sink variants stream to partitioned parquet with no driver
        concat; re-reading the checkpoint dir must reproduce the
        table form exactly — for a map-only op (token_count) and a
        double-exchange op (paragraph_dedup)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import textops

        sf = "/root/testdata/sf0.001"

        def read_sorted(d):
            import glob

            files = sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))
            t = pa.concat_tables(
                [pq.read_table(f) for f in files]
            ).combine_chunks()
            return t.take(
                pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
            ).combine_chunks()

        textops.token_count_write(sf, str(tmp_path / "tc"))
        assert read_sorted(tmp_path / "tc").equals(
            textops.token_count(sf).combine_chunks()
        )

        textops.paragraph_dedup_write(sf, str(tmp_path / "pd"))
        assert read_sorted(tmp_path / "pd").equals(
            textops.paragraph_dedup(sf).combine_chunks()
        )

    def test_paragraph_dedup_write_resumes_from_manifests(
        self, ray_session, tmp_path, monkeypatch
    ):
        """Both sink exchanges commit _SUCCESS; a re-run skips every
        committed stage (never re-reads the documents), and a fully
        committed out_dir returns immediately."""
        from website_indexer_ray.pipelines import textops

        sf = "/root/testdata/sf0.001"
        out = str(tmp_path / "pd")
        expected = textops.paragraph_dedup(sf)
        textops.paragraph_dedup_write(sf, out)
        assert (tmp_path / "pd" / "_SUCCESS").exists()

        def boom(*a, **k):
            raise AssertionError("source re-read on resume")

        monkeypatch.setattr(textops, "_paragraph_exploded", boom)
        # fully committed -> immediate no-op
        textops.paragraph_dedup_write(sf, out)
        # staging committed but final stage lost -> only stage 2 re-runs
        import os
        import shutil

        shutil.rmtree(out)
        textops.paragraph_dedup_write(sf, out)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        import glob

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        got = pa.concat_tables(
            [pq.read_table(f) for f in sorted(glob.glob(f"{out}/part-*.parquet"))]
        )
        got = got.take(pc.sort_indices(got, sort_keys=[("doc_id", "ascending")]))
        assert got.combine_chunks().equals(expected.combine_chunks())

    def test_committed_parquet_write_resume_and_stale_clear(
        self, ray_session, tmp_path
    ):
        """The map-only sink forms share one commit protocol: a
        committed dir is a no-op on re-run, and a dirty dir from a
        crashed attempt (parquet parts, no _SUCCESS) is cleared before
        the write — Ray's write_parquet appends UUID-named files, so a
        stale part would otherwise double-count rows."""
        import glob as _glob
        import os

        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import textops
        from website_indexer_ray.util import committed_parquet_write

        sf = "/root/testdata/sf0.001"
        out = str(tmp_path / "tc")
        expected = textops.token_count(sf)

        # simulate a crashed earlier attempt: a bogus part, no _SUCCESS
        os.makedirs(out)
        pq.write_table(expected.slice(0, 3), os.path.join(out, "stale.parquet"))
        assert committed_parquet_write(textops._token_count_mapped(sf), out)
        files = sorted(_glob.glob(f"{out}/**/*.parquet", recursive=True))
        assert not any(f.endswith("stale.parquet") for f in files)
        total = sum(pq.read_metadata(f).num_rows for f in files)
        assert total == expected.num_rows
        assert os.path.exists(os.path.join(out, "_SUCCESS"))

        # committed dir -> no-op, even with a poisoned dataset
        class Boom:
            def write_parquet(self, *_a, **_k):
                raise AssertionError("re-wrote a committed dir")

        assert not committed_parquet_write(Boom(), out)

    def test_re2_kernel_counts_match_python_re(self, ray_session):
        """The vectorized counting trio uses Arrow's RE2 kernels; pin
        kernel counts == Python re.findall counts for every pattern on
        the real test corpus (guards the RE2-vs-re \\w/\\b divergence
        on whatever characters the corpus actually contains)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import textops

        texts = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        ).column("text")
        for py_re, pat in [
            (textops._TOKEN_RE, textops._TOKEN_PAT),
            (textops._WORD_RE, textops._WORD_PAT),
            (textops._PUNCT_RE, textops._PUNCT_PAT),
            (textops._STOP_RE, textops._STOP_PAT),
        ]:
            kernel = pc.count_substring_regex(texts, pat).to_pylist()
            python = [len(py_re.findall(t)) for t in texts.to_pylist()]
            assert kernel == python, pat

    def test_token_count_table_matches_python_counter(self, ray_session):
        """_token_count_table (numpy run-detection over the lowered
        UTF-8 buffer — the vectorized scan body for vocab/BPE/CMS
        token work) must produce EXACTLY the Counter(re.findall)
        per-batch counts it replaced: pinned on the real corpus plus
        an adversarial batch (unicode, empties, nulls, nonzero array
        offset)."""
        import re
        from collections import Counter

        import pyarrow as pa
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines.textops import _token_count_table

        token_re = re.compile(r"[a-z0-9]+")

        def exact(col) -> dict:
            c: Counter = Counter()
            for t in col.to_pylist():
                if t is not None:
                    c.update(token_re.findall(t.lower()))
            return dict(c)

        def got(col) -> dict:
            out = _token_count_table(col)
            return dict(
                zip(out.column("token").to_pylist(), out.column("n").to_pylist())
            )

        corpus = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        ).column("text")
        assert got(corpus) == exact(corpus)

        edge = pa.array(
            ["", None, "Héllo WORLD 42!", "a" * 300, "ümlaut ÉTÉ straße",
             "日本語 abc123 def", "x", "7seven7", "..--..", "A1b2C3"],
            type=pa.string(),
        )
        assert got(pa.chunked_array([edge])) == exact(edge)
        # nonzero offset (sliced array) must not shift the buffer view
        sl = edge.slice(2, 6)
        assert got(pa.chunked_array([sl])) == exact(sl)
        # token runs adjacent to document boundaries must not merge
        adj = pa.array(["abc", "def", "", "ghi"], type=pa.string())
        assert got(pa.chunked_array([adj])) == {"abc": 1, "def": 1, "ghi": 1}

    def test_lang_id_stage_matches_per_doc_form(self, ray_session):
        """The vectorized LangIdStage (is_in + bincount over _token_runs
        with the [a-z'] class) must reproduce the per-doc Python form
        exactly: same argmax tie-break (lex-smallest language), same
        'und' rules, same integer confidence."""
        import re

        import pyarrow as pa

        from website_indexer_ray.pipelines.textops import (
            _LANG_PROFILES,
            LangIdStage,
        )

        word_re = re.compile(r"[a-zA-Z']+")

        def per_doc(t: str) -> tuple[str, int]:
            words = word_re.findall(t.lower())
            if not words:
                return "und", 0
            profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
            scores = {
                lang: sum(w in prof for w in words)
                for lang, prof in profiles.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            return (best if scores[best] else "und",
                    (1000 * scores[best]) // len(words))

        texts = [
            "",                                  # no words
            "zzz qqq xxx",                       # words, all scores 0
            "the cat and the dog",               # en
            "el que la y de en un",              # es
            "der die und das ist",               # de
            "le la les de et un",                # fr
            "de la",                             # es/fr tie -> lex-smallest
            "it's the user's choice",            # apostrophes
            "LE LA LES DE",                      # case folding
            "日本語 the of 中文",                 # unicode separators
        ]
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        out = LangIdStage()(batch)
        for i, t in enumerate(texts):
            want = per_doc(t)
            got = (
                out.column("lang_pred")[i].as_py(),
                out.column("conf_permille")[i].as_py(),
            )
            assert got == want, (i, t, got, want)

    def test_near_dedup_keep_ds_matches_table_form(self, ray_session):
        """The streaming dataset form (broadcast drop-set + map_batches
        filter, nothing O(corpus) on the driver) returns exactly the
        same kept set as the table-returning driver form."""
        from website_indexer_ray.pipelines import textops

        sf = "/root/testdata/sf0.001"
        tbl = textops.near_dedup_keep(sf)
        ds = textops.near_dedup_keep_ds(sf)
        got = sorted(
            v for b in ds.iter_batches(batch_format="pyarrow")
            for v in b.column("doc_id").to_pylist()
        )
        assert got == tbl.column("doc_id").to_pylist()

    def test_per_doc_sink_forms_equal_table_forms(self, ray_session, tmp_path):
        """Every O(corpus)-output per-doc op gets a committed-parquet
        sink; the round-5 additions (fingerprint, bpe_token_count,
        repetition_stats, decontaminate) must land exactly the table
        form's rows."""
        import pyarrow.compute as pc_
        import pyarrow.dataset as pads

        from website_indexer_ray.pipelines import corpusops, textops

        sf = "/root/testdata/sf0.001"
        for name, table_fn, write_fn in [
            ("fp", textops.fingerprint, textops.fingerprint_write),
            ("bpe", textops.bpe_token_count, textops.bpe_token_count_write),
            ("rep", corpusops.repetition_stats,
             corpusops.repetition_stats_write),
            ("dec", corpusops.decontaminate, corpusops.decontaminate_write),
        ]:
            expected = table_fn(sf)
            out = str(tmp_path / name)
            write_fn(sf, out)
            got = pads.dataset(out, format="parquet").to_table()
            got = got.select(expected.schema.names).take(
                pc_.sort_indices(got, sort_keys=[("doc_id", "ascending")])
            )
            assert got.equals(expected.cast(got.schema)), name

    def test_signature_stages_batching_independent(self, ray_session):
        """MinHash band rows and SimHash signatures must not depend on
        how documents are batched (a partition-dependent signature
        would make LSH pairs nondeterministic under Ray's block
        planning): stage(full table) == concat(stage(slices))."""
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines.textops import (
            MinHashStage,
            SimHashStage,
        )

        tbl = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        )
        for stage in (MinHashStage(), SimHashStage()):
            whole = stage(tbl)
            parts = pa.concat_tables(
                [stage(tbl.slice(i, 7)) for i in range(0, tbl.num_rows, 7)]
            )
            key = whole.schema.names
            import pyarrow.compute as pc_

            order_w = pc_.sort_indices(
                whole, sort_keys=[(c, "ascending") for c in key]
            )
            order_p = pc_.sort_indices(
                parts, sort_keys=[(c, "ascending") for c in key]
            )
            assert whole.take(order_w).equals(
                parts.take(order_p).cast(whole.schema)
            ), type(stage).__name__

    def test_simhash_pairs_hamming(self, ray_session):
        from website_indexer_ray.pipelines import textops

        texts = ["alpha beta gamma delta epsilon zeta"] * 3 + [
            "totally different content words here now"
        ]
        docs = pa.table(
            {"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()), "text": pa.array(texts)}
        )
        pairs = textops.simhash_pairs("", max_hamming=3, documents=docs)
        found = set(
            zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist())
        )
        assert {(0, 1), (0, 2), (1, 2)} <= found
        assert all(b != 3 for _a, b in found)


class TestAnnOps:
    def test_knn_bruteforce_matches_sql(self, ray_session, con):
        from website_indexer_ray.pipelines import annops

        out = annops.knn_bruteforce(SF_DIR, k=5, n_queries=3)
        assert_matches_sql(
            out,
            con,
            """WITH q AS (
                 SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                 ORDER BY vec_id LIMIT 3
               ), sims AS (
                 SELECT q.query_id, e.vec_id AS neighbor_id,
                        list_cosine_similarity(q.qe, e.embedding) AS sim
                 FROM q, embeddings e WHERE e.vec_id != q.query_id
               )
               SELECT query_id, neighbor_id, rank FROM (
                 SELECT query_id, neighbor_id,
                        ROW_NUMBER() OVER (
                            PARTITION BY query_id ORDER BY sim DESC, neighbor_id
                        ) AS rank FROM sims
               ) WHERE rank <= 5 ORDER BY query_id, rank""",
        )

    def test_knn_lsh_recall(self, ray_session, tmp_path):
        """On clustered vectors (true neighbors at cosine ~0.95+, the
        regime LSH is built for) the bucketed search must recover most
        of the exact top-k; sf embeddings are near-orthogonal noise
        where any sublinear method legitimately degrades."""
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import annops

        rng = np.random.default_rng(3)
        centers = rng.standard_normal((10, 64))
        vecs = np.concatenate(
            [c + 0.08 * rng.standard_normal((20, 64)) for c in centers]
        )
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array([i // 20 for i in range(len(vecs))], type=pa.int32()),
            }
        )
        d = tmp_path / "planted"
        d.mkdir()
        pq.write_table(tbl, str(d / "embeddings.parquet"))

        exact = annops.knn_bruteforce(str(d), k=10, n_queries=5)
        approx = annops.knn_lsh(str(d), k=10, n_queries=5)

        def topk(t):
            out = {}
            for q, n in zip(
                t.column("query_id").to_pylist(), t.column("neighbor_id").to_pylist()
            ):
                out.setdefault(q, set()).add(n)
            return out

        e, a = topk(exact), topk(approx)
        recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
        assert np.mean(recalls) >= 0.8, recalls

    def test_knn_ivf_recall(self, ray_session):
        """IVF with n_probe clusters must recover most of the exact
        top-k on the sf embeddings (clusters exist via the label
        structure)."""
        from website_indexer_ray.pipelines import annops

        exact = annops.knn_bruteforce(SF_DIR, k=10, n_queries=5)
        approx = annops.knn_ivf(SF_DIR, k=10, n_queries=5, n_probe=6)

        def topk(t):
            out = {}
            for q, n in zip(
                t.column("query_id").to_pylist(), t.column("neighbor_id").to_pylist()
            ):
                out.setdefault(q, set()).add(n)
            return out

        e, a = topk(exact), topk(approx)
        recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
        assert np.mean(recalls) >= 0.5, recalls

    def test_knn_ivfpq_recall_and_compression(self, ray_session):
        """IVF-PQ (compressed 8-byte codes + exact rerank of the
        candidate tail) must match plain IVF's recall bar, and the
        encode stage must emit m bytes per vector — the 100-TB
        property the operator exists for."""
        import ray as _ray

        from website_indexer_ray.pipelines import annops

        exact = annops.knn_bruteforce(SF_DIR, k=10, n_queries=5)
        approx = annops.knn_ivfpq(SF_DIR, k=10, n_queries=5)

        def topk(t):
            out = {}
            for q, n in zip(
                t.column("query_id").to_pylist(), t.column("neighbor_id").to_pylist()
            ):
                out.setdefault(q, set()).add(n)
            return out

        e, a = topk(exact), topk(approx)
        recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
        assert np.mean(recalls) >= 0.5, recalls
        # ranks are exact-rerank-ordered: rank 1 must be each query's
        # best EXACT-cosine candidate among the returned set — check
        # shape and determinism instead of floats: a second run is
        # bit-identical (seeded k-means + deterministic encode)
        again = annops.knn_ivfpq(SF_DIR, k=10, n_queries=5)
        assert again.to_pydict() == approx.to_pydict()

        # compression: the encode stage emits fixed 8-byte codes
        import pyarrow.parquet as _pq

        sample = annops._sample_matrix(SF_DIR)
        cents = annops._kmeans(sample, 4)
        books = annops._train_pq(sample, cents, 8, 32, 5)
        stage = annops.PqEncodeStage((cents, books))
        tbl = _pq.read_table(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).slice(0, 32)
        enc = stage(tbl)
        assert enc.schema.field("codes").type == pa.binary(8)
        codes = annops._codes_matrix(enc.column("codes"), 8)
        assert codes.shape == (32, 8)
        assert codes.max() < 32  # codeword ids within the book
        # sliced (offset) FixedSizeBinary arrays decode the same rows
        sliced = annops._codes_matrix(enc.column("codes").combine_chunks().slice(5), 8)
        assert np.array_equal(sliced, codes[5:])

    def test_text_embed_and_knn(self, ray_session, tmp_path):
        """Feature-hashed text embeddings: identical texts → identical
        vectors, unit norm, deterministic; the sink form equals the
        table form; text_knn returns dense 1..k ranks per query and is
        deterministic end to end."""
        import glob as _glob

        from website_indexer_ray.pipelines import annops

        # planted duplicates → identical embeddings (and a disjoint
        # text → a different one)
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": [
                    "the quick brown fox",
                    "  THE  quick   brown fox ",  # normalizes identically
                    "completely different words entirely",
                ],
            }
        )
        emb = annops._embed_text_batch(batch, 64)
        v = [np.asarray(e, dtype=np.float32) for e in emb.column("embedding").to_pylist()]
        assert np.array_equal(v[0], v[1])
        assert not np.array_equal(v[0], v[2])
        for x in v:
            assert abs(float(np.linalg.norm(x)) - 1.0) < 1e-5

        a = annops.text_embed(SF_DIR)
        b = annops.text_embed(SF_DIR)
        assert a.equals(b)

        out_dir = str(tmp_path / "emb")
        annops.text_embed_write(SF_DIR, out_dir)
        files = sorted(_glob.glob(f"{out_dir}/*.parquet"))
        import pyarrow.parquet as _pq

        sink = pa.concat_tables([_pq.read_table(f) for f in files])
        sink = sink.take(
            pa.compute.sort_indices(sink, sort_keys=[("doc_id", "ascending")])
        )
        assert sink.to_pydict() == a.to_pydict()

        knn = annops.text_knn(SF_DIR, k=5, n_queries=3)
        assert knn.num_rows == 15
        by_q = {}
        for q, r in zip(
            knn.column("query_id").to_pylist(), knn.column("rank").to_pylist()
        ):
            by_q.setdefault(q, []).append(r)
        assert all(sorted(rs) == list(range(1, 6)) for rs in by_q.values())
        assert knn.to_pydict() == annops.text_knn(SF_DIR, k=5, n_queries=3).to_pydict()

    def test_embedding_dedup_matches_sql(self, ray_session, con):
        from website_indexer_ray.pipelines import annops

        out = annops.embedding_dedup_pairs(SF_DIR, threshold=0.4)
        assert_matches_sql(
            out,
            con,
            """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
               FROM embeddings a, embeddings b
               WHERE a.vec_id < b.vec_id
                 AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
               ORDER BY vec_a, vec_b""",
        )


class TestMultimodal:
    def test_media_features_deterministic(self, ray_session, con):
        from website_indexer_ray.pipelines import multimodal

        out = multimodal.media_features(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT doc_id,
                      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                      1 + CAST(octet_length(encode(text)) AS BIGINT) // 512 AS n_frames
               FROM documents ORDER BY doc_id""",
        )

    def test_real_codecs_png_features(self):
        """use_real_codecs=True is a REAL path for PNG (stdlib codec):
        pixel-statistics features; non-PNG payloads still raise."""
        import numpy as np

        from website_indexer_ray.functions.png import encode_png
        from website_indexer_ray.pipelines.multimodal import (
            FEATURE_DIM,
            MediaFeatureStage,
        )

        stage = MediaFeatureStage(use_real_codecs=True)
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(12, 7, 3), dtype=np.uint8)
        payload = encode_png(img)
        batch = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "payload": pa.array([payload], type=pa.large_binary()),
                "n_bytes": pa.array([len(payload)], type=pa.int64()),
            }
        )
        out = stage(batch)
        feat = out.column("feature").to_pylist()[0]
        assert len(feat) == FEATURE_DIM
        assert feat[:3] == [12.0, 7.0, 3.0]
        assert abs(feat[3] - img.mean()) < 1e-3
        bad = batch.set_column(
            1, "payload", pa.array([b"not a png"], type=pa.large_binary())
        )
        with pytest.raises(NotImplementedError):
            stage(bad)

    def test_media_write_forms(self, ray_session, tmp_path):
        """Sink forms stream payload-bearing rows to parquet with no
        driver concat; the slim projection re-read from the sink
        equals the table form, and thumbnail payload bytes are
        actually present in the files."""
        import glob

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import multimodal

        multimodal.media_features_write(SF_DIR, str(tmp_path / "mf"))
        files = sorted(glob.glob(f"{tmp_path}/mf/*.parquet"))
        got = pa.concat_tables(
            [pq.read_table(f, columns=["doc_id", "n_bytes", "n_frames"]) for f in files]
        )
        got = got.take(
            pc.sort_indices(got, sort_keys=[("doc_id", "ascending")])
        ).combine_chunks()
        assert got.equals(multimodal.media_features(SF_DIR).combine_chunks())

        multimodal.media_thumbnails_write(SF_DIR, str(tmp_path / "th"))
        tfiles = sorted(glob.glob(f"{tmp_path}/th/*.parquet"))
        thumbs = pa.concat_tables([pq.read_table(f) for f in tfiles])
        assert "thumb" in thumbs.schema.names  # payload bytes in the sink
        slim = thumbs.select(["doc_id", "n_bytes", "thumb_bytes"])
        slim = slim.take(
            pc.sort_indices(slim, sort_keys=[("doc_id", "ascending")])
        ).combine_chunks()
        assert slim.equals(multimodal.media_thumbnails(SF_DIR).combine_chunks())


class TestRelational:
    def test_agg_lineitem(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.agg_lineitem(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT l_returnflag, l_linestatus,
                      CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                      CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
                      CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                          * CAST(ROUND((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_revenue_c4,
                      COUNT(*) AS n_rows
               FROM lineitem GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""",
        )

    def test_window_counts(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.window_counts(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT date_trunc('hour', ts) AS window_start, event_type,
                      CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
                      COUNT(*) AS n
               FROM events GROUP BY window_start, event_type
               ORDER BY window_start, event_type""",
        )

    def test_top_users_per_window(self, ray_session, con):
        """Exact windowed heavy hitters: per-batch partial counts →
        window-keyed exchange → vectorized per-window top-k; hash-
        exact vs the ROW_NUMBER oracle including tie-breaks."""
        from website_indexer_ray.pipelines import relational

        out = relational.top_users_per_window(SF_DIR, k=3)
        assert_matches_sql(
            out,
            con,
            """SELECT window_start, user_id, n FROM (
                   SELECT date_trunc('hour', ts) AS window_start, user_id,
                          CAST(COUNT(*) AS BIGINT) AS n,
                          ROW_NUMBER() OVER (
                              PARTITION BY date_trunc('hour', ts)
                              ORDER BY COUNT(*) DESC, user_id) AS rn
                   FROM events GROUP BY 1, 2)
               WHERE rn <= 3
               ORDER BY window_start, n DESC, user_id""",
        )

    def test_cumulative_revenue(self, ray_session, con):
        """Running-total window function (SUM OVER PARTITION BY ...
        ORDER BY): per-customer cumulative integer-cent order totals,
        resolved per exchange partition in one lexsort + offset-cumsum
        pass — hash-exact vs the SQL window oracle."""
        from website_indexer_ray.pipelines import relational

        out = relational.cumulative_revenue(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT o_orderkey, o_custkey,
                      CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
                          PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) AS BIGINT) AS cum_price_c
               FROM orders ORDER BY o_orderkey""",
        )

    def test_revenue_rollup(self, ray_session, con):
        """ROLLUP / GROUPING SETS class: finest-level partials in one
        streaming pass, subtotal levels derived from the tiny base
        aggregate; 'ALL' markers keep the hash NULL-free."""
        from website_indexer_ray.pipelines import relational

        out = relational.revenue_rollup(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                      COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                      CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                          AS BIGINT) AS sum_price_c,
                      COUNT(*) AS n
               FROM orders
               GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
               ORDER BY 1, 2""",
        )

    def test_asof_last_order(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.asof_last_order(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT e.event_id,
                      COALESCE((
                        SELECT max(o_orderkey) FROM orders o
                        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                          AND o.o_orderdate = (
                            SELECT max(o_orderdate) FROM orders o2
                            WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
                      ), -1) AS last_orderkey
               FROM events e ORDER BY event_id""",
        )

    def test_sessionize(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.sessionize(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """WITH d AS (
                 SELECT user_id,
                        CASE WHEN lag(ts) OVER w IS NULL
                                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                             THEN 1 ELSE 0 END AS new_s
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
               )
               SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
                      COUNT(*) AS n_events
               FROM d GROUP BY user_id ORDER BY user_id""",
        )

    def test_hll_within_error_bound(self, ray_session, con):
        """HyperLogLog at p=12 has ~1.6% std error; assert every
        per-type estimate lands within 5% of the exact count."""
        from website_indexer_ray.pipelines import relational

        approx = relational.approx_distinct_users(SF_DIR)
        exact = dict(
            con.execute(
                "SELECT event_type, COUNT(DISTINCT user_id) FROM events "
                "GROUP BY event_type"
            ).fetchall()
        )
        for etype, est in zip(
            approx.column("event_type").to_pylist(),
            approx.column("approx_distinct").to_pylist(),
        ):
            true = exact[etype]
            assert abs(est - true) <= max(3, 0.05 * true), (etype, est, true)

    def test_filter_chain(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.filter_chain_events(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT event_id, user_id FROM events
               WHERE event_type IN ('click', 'purchase') AND value > 50.0
                 AND regexp_matches(props, '"k": [0-9]*[02468]}')
               ORDER BY event_id""",
        )

    def test_match_set_sink_forms_equal_table_forms(self, ray_session, tmp_path):
        """The streaming _write sinks for the two match-set demo
        queries (output O(matches) — unbounded for common predicates
        at scale) must land exactly the table form's rows, and a rerun
        over the committed dir must be a no-op."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        from website_indexer_ray.pipelines import relational

        for name, table_fn, write_fn in [
            ("filter", relational.filter_chain_events,
             relational.filter_chain_events_write),
            ("search", relational.search_docs_text,
             relational.search_docs_text_write),
        ]:
            expected = table_fn(SF_DIR)
            out = str(tmp_path / name)
            write_fn(SF_DIR, out)
            got = pads.dataset(out, format="parquet").to_table()
            key = expected.schema.names[0]
            got = got.select(expected.schema.names).take(
                pc.sort_indices(got, sort_keys=[(key, "ascending")])
            )
            assert got.equals(expected.cast(got.schema)), name
            write_fn(SF_DIR, out)  # committed dir -> no-op
            again = pads.dataset(out, format="parquet").to_table()
            assert again.num_rows == expected.num_rows, name


class TestMultimodalStages:
    """Frame-sample and resize stages: real Ray-side plumbing, stubbed
    codecs (NotImplementedError when real decode is requested)."""

    def test_frame_sample_shapes(self, ray_session):
        from website_indexer_ray.pipelines import multimodal

        out = multimodal.media_frame_sample(SF_DIR, stride=512, max_frames=8)
        assert out.schema.names == ["doc_id", "frame_idx", "frame_offset"]
        rows = out.to_pylist()
        assert all(r["frame_offset"] == r["frame_idx"] * 512 for r in rows)
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        for idxs in by_doc.values():
            assert idxs == list(range(len(idxs)))  # dense per-doc 0..k
            assert len(idxs) <= 8

    def test_thumbnails_bounded(self, ray_session):
        from website_indexer_ray.pipelines import multimodal

        out = multimodal.media_thumbnails(SF_DIR, max_bytes=256)
        rows = out.to_pylist()
        assert all(r["thumb_bytes"] <= 256 for r in rows)
        assert all(r["thumb_bytes"] <= r["n_bytes"] for r in rows)

    def test_real_codecs_apng_frame_sample(self):
        """use_real_codecs=True frame sampling is a REAL path for
        APNG: every frame_stride-th decoded frame, capped; non-APNG
        payloads (video) still raise."""
        import numpy as np

        from website_indexer_ray.functions.png import (
            decode_apng_frames,
            encode_apng,
        )
        from website_indexer_ray.pipelines.multimodal import FrameSampleStage

        rng = np.random.default_rng(21)
        frames = [
            rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
            for _ in range(10)
        ]
        payload = encode_apng(frames)
        got = decode_apng_frames(payload)
        assert len(got) == 10
        assert all(np.array_equal(a, b) for a, b in zip(got, frames))

        stage = FrameSampleStage(
            use_real_codecs=True, frame_stride=3, max_frames=3
        )
        batch = pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "payload": pa.array([payload], type=pa.large_binary()),
                "n_bytes": pa.array([len(payload)], type=pa.int64()),
            }
        )
        out = stage(batch)
        assert out.column("frame_idx").to_pylist() == [0, 1, 2]
        assert out.column("frame_offset").to_pylist() == [0, 3, 6]
        bad = batch.set_column(
            1, "payload", pa.array([b"\x00video"], type=pa.large_binary())
        )
        with pytest.raises(NotImplementedError):
            stage(bad)

    def test_real_codecs_wav_features(self):
        """WAV payloads decode through the stdlib wave module: a
        synthesized sine gives the right rate/duration/RMS/ZCR."""
        import io
        import wave

        import numpy as np

        from website_indexer_ray.pipelines.multimodal import MediaFeatureStage

        rate, secs, freq = 8000, 1, 440
        t = np.arange(rate * secs) / rate
        samples = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples.tobytes())
        payload = buf.getvalue()

        stage = MediaFeatureStage(use_real_codecs=True)
        feat = stage._real_decode(payload)
        n_ch, srate, n, dur, rms, zcr, lo, hi = [float(x) for x in feat]
        assert (n_ch, srate, n) == (1.0, 8000.0, 8000.0)
        assert abs(dur - 1.0) < 1e-6
        assert abs(rms - 0.5 / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)
        # a 440 Hz sine crosses zero ~2*440 times/s
        assert abs(zcr - 2 * freq / rate) < 0.01
        assert lo < -0.45 and hi > 0.45

    def test_apng_envelope_refusals(self):
        """Sub-region / composited APNGs and non-APNG stills are
        refused explicitly, never mis-decoded."""
        import struct

        import numpy as np

        from website_indexer_ray.functions import png

        still = png.encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
        assert not png.is_apng(still)
        with pytest.raises(ValueError, match="acTL"):
            png.decode_apng_frames(still)
        # craft an APNG whose fcTL is a sub-region → refused
        frames = [np.zeros((4, 4, 3), dtype=np.uint8)] * 2
        data = png.encode_apng(frames)
        bad_fctl = png._chunk(
            b"fcTL", struct.pack(">IIIIIHHBB", 0, 2, 2, 1, 1, 1, 10, 0, 0)
        )
        good_fctl = png._chunk(
            b"fcTL", struct.pack(">IIIIIHHBB", 0, 4, 4, 0, 0, 1, 10, 0, 0)
        )
        assert good_fctl in data
        with pytest.raises(NotImplementedError, match="full-frame"):
            png.decode_apng_frames(data.replace(good_fctl, bad_fctl, 1))

    def test_real_codecs_png_resize(self):
        """Real PNG thumbnail path: decode → nearest-neighbor
        downsample → re-encoded PNG that decodes to the expected
        dimensions and sampled pixels."""
        import numpy as np

        from website_indexer_ray.functions.png import decode_png, encode_png
        from website_indexer_ray.pipelines.multimodal import MediaResizeStage

        stage = MediaResizeStage(use_real_codecs=True, max_dim=8)
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(32, 16, 3), dtype=np.uint8)
        thumb = stage._resize(encode_png(img))
        px = decode_png(thumb)
        assert px.shape == (8, 4, 3)
        assert np.array_equal(px[0, 0], img[0, 0])  # nearest-neighbor anchor
        with pytest.raises(NotImplementedError):
            stage._resize(b"JFIF...")


class TestPngCodec:
    """Stdlib-only PNG codec (functions/png.py): encode→decode round
    trip across channel counts, and a spec-conformance decode of a
    hand-filtered stream exercising all five filter types."""

    def test_round_trip_all_channel_counts(self):
        import numpy as np

        from website_indexer_ray.functions import png

        rng = np.random.default_rng(3)
        for ch in (1, 2, 3, 4):
            img = rng.integers(0, 256, size=(9, 5, ch), dtype=np.uint8)
            out = png.decode_png(png.encode_png(img))
            assert np.array_equal(out, img), f"channels={ch}"

    def test_grayscale_2d_input(self):
        import numpy as np

        from website_indexer_ray.functions import png

        img = np.arange(24, dtype=np.uint8).reshape(6, 4)
        out = png.decode_png(png.encode_png(img))
        assert np.array_equal(out[:, :, 0], img)

    def test_all_filter_types_decode_per_spec(self):
        """Hand-build scanlines with filters 0-4 and check decode
        against a straightforward per-pixel spec implementation."""
        import struct
        import zlib

        import numpy as np

        from website_indexer_ray.functions import png

        rng = np.random.default_rng(11)
        h, w, ch = 5, 6, 3
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.int32)

        # filter each row with type y % 5 per the PNG spec
        recon = img.astype(np.int32)
        lines = []
        for y in range(h):
            f = y % 5
            row = recon[y]
            prev = recon[y - 1] if y else np.zeros((w, ch), dtype=np.int32)
            filt = np.zeros((w, ch), dtype=np.int32)
            for x in range(w):
                a = row[x - 1] if x else np.zeros(ch, dtype=np.int32)
                b = prev[x]
                c = prev[x - 1] if x else np.zeros(ch, dtype=np.int32)
                if f == 0:
                    filt[x] = row[x]
                elif f == 1:
                    filt[x] = (row[x] - a) % 256
                elif f == 2:
                    filt[x] = (row[x] - b) % 256
                elif f == 3:
                    filt[x] = (row[x] - ((a + b) // 2)) % 256
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa_ <= pb_) & (pa_ <= pc_),
                        a,
                        np.where(pb_ <= pc_, b, c),
                    )
                    filt[x] = (row[x] - pred) % 256
            lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            png.SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + png._chunk(b"IEND", b"")
        )
        out = png.decode_png(data)
        assert np.array_equal(out, img.astype(np.uint8))

    def test_unsupported_formats_refused(self):
        import struct

        import pytest as _pytest

        from website_indexer_ray.functions import png

        with _pytest.raises(ValueError):
            png.decode_png(b"GIF89a")
        ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        data = png.SIGNATURE + png._chunk(b"IHDR", ihdr16)
        with _pytest.raises(NotImplementedError):
            png.decode_png(data)


class TestExchangeOpsEmptyInput:
    """Exchange-based ops on an empty documents table: no partitions
    ever materialize, and every op returns its empty schema rather
    than raising."""

    @pytest.fixture(scope="class")
    def empty_docs(self):
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )

    def test_minhash_empty(self, ray_session, empty_docs):
        from website_indexer_ray.pipelines import textops

        out = textops.minhash_lsh_pairs("", documents=empty_docs)
        assert out.num_rows == 0
        assert out.schema.names == ["doc_a", "doc_b", "jaccard_permille"]

    def test_simhash_empty(self, ray_session, empty_docs):
        from website_indexer_ray.pipelines import textops

        out = textops.simhash_pairs("", documents=empty_docs)
        assert out.num_rows == 0
        assert out.schema.names == ["doc_a", "doc_b", "hamming"]

    def test_near_dedup_empty(self, ray_session, empty_docs):
        from website_indexer_ray.pipelines import textops

        out = textops.near_dedup_keep("", documents=empty_docs)
        assert out.num_rows == 0


class TestEmbeddingDedupLsh:
    """The LSH scale path for embedding near-dup: candidates from
    random-hyperplane buckets (actor exchange), exact-cosine verify —
    precision 1.0 by construction (subset of the exact pairs), recall
    bounded below."""

    def test_recall_and_precision(self, ray_session):
        from website_indexer_ray.pipelines import annops

        exact = annops.embedding_dedup_pairs(SF_DIR)
        lsh = annops.embedding_dedup_lsh(SF_DIR)
        E = set(zip(exact.column("vec_a").to_pylist(),
                    exact.column("vec_b").to_pylist()))
        L = set(zip(lsh.column("vec_a").to_pylist(),
                    lsh.column("vec_b").to_pylist()))
        assert L <= E  # exact verify ⇒ no false positives
        if E:
            assert len(E & L) / len(E) >= 0.7


class TestDupSpanRemoval:
    """ExactSubstr-style duplicated-span removal (Lee et al. 2021):
    corpus-wide duplicated token runs ≥ k are excised from every
    occurrence except the first. Planted-duplicate semantics pinned
    exactly; untouched docs must come back byte-identical."""

    def _corpus(self):
        passage = " ".join(f"tok{i}" for i in range(30))
        return passage, pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    [
                        "unique alpha beta " + passage + " gamma delta",
                        "other start words here " + passage + " tail words",
                        passage,
                        "completely unrelated text with no duplicated runs",
                    ]
                ),
            }
        )

    def test_planted_duplicate_excision(self, ray_session):
        from website_indexer_ray.pipelines import textops

        passage, docs = self._corpus()
        stats = textops.dup_span_removal("", k=15, documents=docs)
        assert stats.to_pydict() == {
            "doc_id": [2, 3],
            "n_spans": [1, 1],
            "n_tokens_removed": [30, 30],
        }
        out = {
            r["doc_id"]: r["text"]
            for r in textops.dup_span_removal_ds("", k=15, documents=docs).take_all()
        }
        # First occurrence (lowest doc_id) and untouched docs: byte-identical.
        assert out[1] == docs.column("text")[0].as_py()
        assert out[4] == docs.column("text")[3].as_py()
        # Later occurrences: the whole duplicated run is gone, the
        # surrounding unique text survives.
        assert "tok0" not in out[2] and "tok29" not in out[2]
        assert out[2] == "other start words here tail words"
        assert out[3] == ""

    def test_case_insensitive_match_preserves_original_case(self, ray_session):
        from website_indexer_ray.pipelines import textops

        passage, _ = self._corpus()
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(
                    ["PRE " + passage.upper() + " POST", "x " + passage + " y"]
                ),
            }
        )
        out = {
            r["doc_id"]: r["text"]
            for r in textops.dup_span_removal_ds("", k=15, documents=docs).take_all()
        }
        # Matching is lowercased, so the upper-case first occurrence
        # anchors the run and keeps its ORIGINAL casing.
        assert out[1] == "PRE " + passage.upper() + " POST"
        assert out[2] == "x y"

    def test_whitespace_outside_spans_preserved(self, ray_session):
        """Excision is a byte-precise deletion: newlines/tabs/spacing
        outside the excised ranges survive untouched in affected docs."""
        from website_indexer_ray.pipelines import textops

        passage, _ = self._corpus()
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "first paragraph\n\nsecond\tparagraph " + passage,
                        "intro line\n\n" + passage + "\n\nclosing  para  here",
                    ]
                ),
            }
        )
        out = {
            r["doc_id"]: r["text"]
            for r in textops.dup_span_removal_ds("", k=15, documents=docs).take_all()
        }
        # first occurrence byte-identical
        assert out[1] == docs.column("text")[0].as_py()
        # doc 2: the passage is gone, every byte around it unchanged
        assert out[2] == "intro line\n\nclosing  para  here"

    def test_no_duplicates_is_identity(self, ray_session):
        from website_indexer_ray.pipelines import textops

        docs = pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "text": pa.array(["a b c d e f g h i j k l m n o p q"]),
            }
        )
        assert textops.dup_span_removal("", k=15, documents=docs).num_rows == 0
        out = textops.dup_span_removal_ds("", k=15, documents=docs).take_all()
        assert out[0]["text"] == docs.column("text")[0].as_py()


class TestSemanticDedup:
    """SemDeDup (Abbas et al. 2023): k-means clusters → in-cluster
    exact-cosine keep-the-first. Dropped ⊆ the exact global dropped
    set (precision 1.0 — every in-cluster hit is a real ≥-threshold
    pair), recall bounded below; everything is seeded so both are
    deterministic."""

    def test_dropped_subset_and_recall(self, ray_session):
        from website_indexer_ray.pipelines import annops

        exact = annops.embedding_dedup_pairs(SF_DIR)
        # Global keep-the-first analog: a vector is droppable iff it is
        # the HIGHER side of some exact pair (pairs are a < b).
        exact_dropped = set(exact.column("vec_b").to_pylist())
        sem = set(
            annops.semantic_dedup_dropped(SF_DIR, n_clusters=4)
            .column("vec_id")
            .to_pylist()
        )
        assert sem <= exact_dropped
        if exact_dropped:
            assert len(sem & exact_dropped) / len(exact_dropped) >= 0.5

    def test_kept_is_complement_of_dropped(self, ray_session):
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import annops

        all_ids = set(
            pq.read_table(
                f"{SF_DIR}/embeddings.parquet", columns=["vec_id"]
            )
            .column("vec_id")
            .to_pylist()
        )
        dropped = set(
            annops.semantic_dedup_dropped(SF_DIR).column("vec_id").to_pylist()
        )
        kept_tbl = annops.semantic_dedup(SF_DIR)
        kept = kept_tbl.column("vec_id").to_pylist()
        assert kept == sorted(kept)  # applied form is sorted
        assert set(kept) == all_ids - dropped

    def test_cluster_cap_sentinel(self, ray_session, caplog):
        """Force a 1-member cap: every multi-member cluster overflows,
        nothing is examined, so nothing is dropped — and the overflow
        is surfaced as a logged warning, never silent."""
        import logging

        from website_indexer_ray.pipelines import annops

        with caplog.at_level(
            logging.WARNING, logger="website_indexer_ray.pipelines.annops"
        ):
            out = annops.semantic_dedup_dropped(SF_DIR, n_clusters=4, cluster_cap=1)
        assert out.num_rows == 0
        assert any("kept unexamined" in r.getMessage() for r in caplog.records)


class TestHashJoins:
    """Big-big hash join through the keyed exchange (the join class
    the reference never needs): lineitem ⨝ orders on orderkey, plus
    the broadcast-small-sides + hash-partition-big-sides combination
    (revenue by customer nation)."""

    def test_priority_revenue(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.priority_revenue(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT o_orderpriority,
                      CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                          * CAST(ROUND((1-l_discount)*100) AS BIGINT)) AS BIGINT)
                          AS revenue_c4
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        )

    def test_revenue_by_nation(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.revenue_by_nation(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT n_name,
                      CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                          * CAST(ROUND((1-l_discount)*100) AS BIGINT)) AS BIGINT)
                          AS revenue_c4
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name ORDER BY n_name""",
        )


class TestRangeJoin:
    def test_orders_in_trailing_window(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        out = relational.range_join_orders(SF_DIR)
        assert_matches_sql(
            out,
            con,
            """SELECT e.event_id,
                      CAST((SELECT COUNT(*) FROM orders o
                            WHERE o.o_custkey = e.user_id
                              AND o.o_orderdate > e.ts - INTERVAL 30 DAY
                              AND o.o_orderdate <= e.ts) AS BIGINT) AS n_orders
               FROM events e ORDER BY event_id""",
        )


class TestCountMinTopTokens:
    """Count-Min heavy hitters vs the exact vocabulary: estimates
    never underestimate (CMS property), and the approximate top-k
    substantially overlaps the exact top-k."""

    def test_overestimate_and_overlap(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        approx = textops.approx_top_tokens(SF_DIR, k=20)
        exact = textops.vocab_top_tokens(SF_DIR, k=20)
        true_counts = dict(
            con.execute(
                """SELECT token, CAST(COUNT(*) AS BIGINT) FROM (
                     SELECT unnest(regexp_extract_all(lower(text),
                         '[a-z0-9]+')) AS token FROM documents)
                   GROUP BY token"""
            ).fetchall()
        )
        for tok, est in zip(
            approx.column("token").to_pylist(), approx.column("est_n").to_pylist()
        ):
            assert est >= true_counts.get(tok, 0)  # CMS never undercounts
        A = set(approx.column("token").to_pylist())
        E = set(exact.column("token").to_pylist())
        assert len(A & E) / len(E) >= 0.8


class TestLengthFilter:
    def test_matches_sql_and_bounds(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        out = textops.length_filter(SF_DIR, min_tokens=20, max_tokens=1000)
        assert_matches_sql(
            out,
            con,
            r"""SELECT doc_id FROM documents
                WHERE length(regexp_extract_all(text, '\w+|[^\w\s]'))
                      BETWEEN 20 AND 1000
                ORDER BY doc_id""",
        )
        # tight bounds actually filter
        narrow = textops.length_filter(SF_DIR, min_tokens=0, max_tokens=5)
        assert narrow.num_rows < out.num_rows


class TestSnapshotDedup:
    """Incremental dedup of a new shard (doc_id % 4 == 0) against the
    snapshot side — Bloom prefilter must stay invisible in the output
    (exact under false positives, both verify paths)."""

    SQL = """
        WITH norm AS (
          SELECT doc_id,
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
          FROM documents
        )
        SELECT n.doc_id FROM norm n
        WHERE n.doc_id % 4 = 0
          AND NOT EXISTS (
            SELECT 1 FROM norm s WHERE s.doc_id % 4 <> 0 AND s.nt = n.nt
          )
        ORDER BY doc_id
    """

    def test_oracle(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        assert_matches_sql(textops.snapshot_dedup(SF_DIR), con, self.SQL)

    def test_verify_paths_agree(self, ray_session, con):
        """A deliberately tiny Bloom (massive fpr) through BOTH verify
        paths (broadcast and exchange anti-join) must still be exact."""
        from website_indexer_ray.pipelines import textops

        gold = con.execute(self.SQL).fetch_arrow_table()
        broad = textops.snapshot_dedup(SF_DIR, bloom_bits=1 << 10, n_probes=2)
        exch = textops.snapshot_dedup(
            SF_DIR, bloom_bits=1 << 10, n_probes=2, verify_broadcast_max=0
        )
        assert broad.column("doc_id").to_pylist() == gold.column("doc_id").to_pylist()
        assert exch.column("doc_id").to_pylist() == gold.column("doc_id").to_pylist()

    def test_planted_and_sink(self, ray_session, tmp_path):
        """Cross-shard dup (whitespace/case variant) drops; intra-shard
        dup keeps; sink form writes the same ids under _SUCCESS."""
        import glob
        import os

        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import textops

        rows = [
            (1, "The Quick   Brown Fox"),          # snapshot
            (2, "some unique snapshot text"),      # snapshot
            (3, "another snapshot doc"),           # snapshot
            (4, "the quick brown fox"),            # new: dup of 1 → drop
            (8, "brand new document"),             # new: keep
            (12, "also brand new"),                # new: keep
            (16, "also brand new"),                # new: intra-shard dup → keep
        ]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = textops.snapshot_dedup(str(d))
        assert out.column("doc_id").to_pylist() == [8, 12, 16]

        sink = tmp_path / "out"
        textops.snapshot_dedup_write(str(d), str(sink))
        assert os.path.exists(sink / "_SUCCESS")
        got = pa.concat_tables(
            [pq.read_table(f) for f in glob.glob(f"{sink}/*.parquet")]
        )
        assert sorted(got.column("doc_id").to_pylist()) == [8, 12, 16]


class TestTopTermsPerDoc:
    SQL = """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, term
        ), df AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM tok GROUP BY term
        )
        SELECT doc_id, term, tf, df FROM (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rn
          FROM tf JOIN df USING (term))
        WHERE rn <= 3
        ORDER BY doc_id, term
    """

    def test_oracle(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        assert_matches_sql(textops.top_terms_per_doc(SF_DIR), con, self.SQL)

    def test_rank_semantics(self, ray_session, tmp_path):
        """tf wins first; global rarity (df asc) breaks tf ties; term
        breaks both. Unicode/punct are separators; empty docs vanish."""
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import textops

        d = tmp_path / "sf"
        d.mkdir()
        rows = [
            (1, "apple apple banana cherry"),   # tf: apple 2; banana/cherry tie
            (2, "banana banana banana!"),        # makes banana common (df=2)
            (3, "café—cherry"),                  # unicode splits; cherry df=2
            (4, ""),                             # no rows
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = textops.top_terms_per_doc(str(d), k=2)
        got = list(
            zip(
                out.column("doc_id").to_pylist(),
                out.column("term").to_pylist(),
            )
        )
        # doc 1: apple tops on tf=2; banana/cherry tie on tf AND df
        # (both appear in 2 docs) → term asc picks banana second
        assert [t for doc, t in got if doc == 1] == ["apple", "banana"]
        assert all(doc != 4 for doc, _ in got)
        # doc 3: caf + cherry are its only terms
        d3 = sorted(t for doc, t in got if doc == 3)
        assert d3 == ["caf", "cherry"]


class TestDocLengthQuantiles:
    SQL = """
        SELECT q, n_chars FROM (
          SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn,
                 COUNT(*) OVER () AS n
          FROM documents) t,
          (VALUES (25),(50),(75),(95),(99)) AS qs(q)
        WHERE rn = CAST(ceil(q * n / 100.0) AS BIGINT)
        ORDER BY q
    """

    def test_oracle(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        assert_matches_sql(textops.doc_length_quantiles(SF_DIR), con, self.SQL)

    def test_rank_exact_on_tiny_multiset(self, ray_session, tmp_path):
        """Duplicates and exact rank boundaries: 10 docs of lengths
        [1..5, 5,5,5, 9, 9] — p50 = rank 5 = 5, p99 = rank 10 = 9."""
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import textops

        lens = [1, 2, 3, 4, 5, 5, 5, 5, 9, 9]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(lens)), type=pa.int64()),
                    "text": pa.array(["x" * n for n in lens]),
                    "n_chars": pa.array(lens, type=pa.int64()),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = {r["q"]: r["n_chars"] for r in textops.doc_length_quantiles(str(d)).to_pylist()}
        assert out == {25: 3, 50: 5, 75: 5, 95: 9, 99: 9}


class TestStreamingWindowCounts:
    """Watermark-driven streaming window aggregate (state/streaming.py):
    with an ordered source it must EQUAL the batch window_counts (and
    its SQL oracle); with disorder beyond allowed_lateness, late events
    are counted+dropped, never folded into finalized windows; windows
    finalize incrementally while the stream runs."""

    def test_equals_batch_aggregate(self, ray_session, con):
        from website_indexer_ray.pipelines import relational

        s = relational.streaming_window_counts(SF_DIR)
        b = relational.window_counts(SF_DIR)
        assert s.to_pydict() == b.to_pydict()
        assert_matches_sql(
            s,
            con,
            """SELECT date_trunc('hour', ts) AS window_start, event_type,
                      CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
                      COUNT(*) AS n
               FROM events GROUP BY window_start, event_type
               ORDER BY window_start, event_type""",
        )

    def _shuffled_batches(self, batch_size=256):
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["ts", "event_type", "value"]
        )
        perm = np.random.default_rng(7).permutation(tbl.num_rows)
        tbl = tbl.take(pa.array(perm))
        return tbl, [
            tbl.slice(i, batch_size) for i in range(0, tbl.num_rows, batch_size)
        ]

    def test_late_events_counted_not_folded(self, ray_session):
        from website_indexer_ray.state.streaming import run_windowed_stream

        tbl, batches = self._shuffled_batches()
        out, n_late = run_windowed_stream(
            batches, window_us=3600 * 1_000_000, lateness_us=0
        )
        assert n_late > 0  # a fully shuffled stream must drop some
        # accounting is exact: every event either landed or is late
        assert sum(out.column("n").to_pylist()) + n_late == tbl.num_rows

    def test_generous_lateness_recovers_exactness(self, ray_session):
        from website_indexer_ray.pipelines import relational
        from website_indexer_ray.state.streaming import run_windowed_stream

        _tbl, batches = self._shuffled_batches()
        # lateness >= the stream's full time span bounds any disorder
        out, n_late = run_windowed_stream(
            batches,
            window_us=3600 * 1_000_000,
            lateness_us=10**18,
        )
        assert n_late == 0
        assert out.to_pydict() == relational.window_counts(SF_DIR).to_pydict()

    def test_incremental_emission(self, ray_session):
        import pyarrow.parquet as pq

        from website_indexer_ray.state.streaming import run_windowed_stream

        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["ts", "event_type", "value"]
        )
        tbl = tbl.take(pa.compute.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
        batches = [tbl.slice(i, 64) for i in range(0, tbl.num_rows, 64)]
        emissions = []
        out, _ = run_windowed_stream(
            batches,
            window_us=3600 * 1_000_000,
            lateness_us=0,
            poll_every=2,
            on_emit=lambda rows: emissions.append(len(rows)),
        )
        # windows finalized while the stream was still running
        assert sum(emissions) > 0
        assert sum(emissions) < out.num_rows  # and more followed later


class TestStreamingDistinctUsers:
    """Streaming per-window HLL distinct (sketch × streaming
    composition): bounded error vs exact per-window COUNT(DISTINCT),
    order-invariance (register max is commutative/idempotent), exact
    late-event accounting."""

    def _exact(self):
        import duckdb
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["ts", "event_type", "user_id"]
        )
        con = duckdb.connect()
        con.register("e", tbl)
        return {
            (w, t): n
            for w, t, n in con.execute(
                """SELECT date_trunc('hour', ts), event_type,
                          COUNT(DISTINCT user_id)
                   FROM e GROUP BY 1, 2"""
            ).fetchall()
        }

    def test_error_bound_vs_exact(self, ray_session):
        from website_indexer_ray.pipelines import relational

        out = relational.streaming_distinct_users(SF_DIR)
        exact = self._exact()
        assert out.num_rows == len(exact)
        errs = []
        for w, t, est in zip(
            out.column("window_start").to_pylist(),
            out.column("event_type").to_pylist(),
            out.column("approx_distinct").to_pylist(),
        ):
            true = exact[(w, t)]
            errs.append(abs(est - true) / max(true, 1))
        assert float(np.mean(errs)) <= 0.05, (np.mean(errs), max(errs))

    def _batches(self, order_seed=None, batch_size=256):
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["ts", "event_type", "user_id"]
        )
        if order_seed is None:
            tbl = tbl.take(
                pa.compute.sort_indices(tbl, sort_keys=[("ts", "ascending")])
            )
        else:
            perm = np.random.default_rng(order_seed).permutation(tbl.num_rows)
            tbl = tbl.take(pa.array(perm))
        return tbl, [
            tbl.slice(i, batch_size) for i in range(0, tbl.num_rows, batch_size)
        ]

    def test_shuffled_with_generous_lateness_is_identical(self, ray_session):
        """HLL merge is order-insensitive: a fully shuffled stream
        under lateness bounding all disorder gives BIT-IDENTICAL
        estimates to the ordered one."""
        from website_indexer_ray.state.streaming import run_distinct_stream

        _t, ordered = self._batches()
        a, late_a = run_distinct_stream(
            ordered, window_us=3600 * 1_000_000, lateness_us=10**18
        )
        _t, shuffled = self._batches(order_seed=13)
        b, late_b = run_distinct_stream(
            shuffled, window_us=3600 * 1_000_000, lateness_us=10**18
        )
        assert late_a == late_b == 0
        assert a.to_pydict() == b.to_pydict()

    def test_late_partials_counted(self, ray_session):
        from website_indexer_ray.state.streaming import run_distinct_stream

        tbl, shuffled = self._batches(order_seed=13)
        out, n_late = run_distinct_stream(
            shuffled, window_us=3600 * 1_000_000, lateness_us=0
        )
        assert n_late > 0  # shuffled stream at zero lateness drops some
        assert n_late < tbl.num_rows

    def test_incremental_emission(self, ray_session):
        from website_indexer_ray.state.streaming import run_distinct_stream

        _t, ordered = self._batches(batch_size=64)
        emissions = []
        out, _ = run_distinct_stream(
            ordered,
            window_us=3600 * 1_000_000,
            lateness_us=0,
            poll_every=2,
            on_emit=lambda rows: emissions.append(len(rows)),
        )
        assert sum(emissions) > 0
        assert sum(emissions) < out.num_rows


class TestApproxQuantiles:
    """Mergeable centroid-digest quantiles: every estimate's RANK in
    the exact sorted column must sit within the digest's error bound
    of the requested rank."""

    def test_rank_error_bounded(self, ray_session):
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import relational

        qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        out = relational.approx_quantiles(SF_DIR, qs=qs, max_centroids=256)
        exact = np.sort(
            pq.read_table(f"{SF_DIR}/events.parquet", columns=["value"])
            .column("value")
            .to_numpy(zero_copy_only=False)
        )
        n = len(exact)
        # widest centroid ≈ batch_rows / max_centroids; at sf0.001 the
        # whole table is a handful of blocks — allow 2 chunk widths
        tol = max(2, 2 * n // 256)
        for q, est in zip(
            out.column("q").to_pylist(), out.column("value_est").to_pylist()
        ):
            rank = np.searchsorted(exact, est)
            assert abs(rank - q * n) <= tol, (q, est, rank, q * n, tol)

    def test_deterministic(self, ray_session):
        from website_indexer_ray.pipelines import relational

        a = relational.approx_quantiles(SF_DIR)
        b = relational.approx_quantiles(SF_DIR)
        assert a.equals(b)

    def test_grouped_rank_error_bounded(self, ray_session):
        """Per-event_type digests: every estimate's rank within its
        group's exact sorted values sits inside the digest bound."""
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import relational

        qs = (0.25, 0.5, 0.9)
        out = relational.approx_quantiles_by_type(
            SF_DIR, qs=qs, max_centroids=256
        )
        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
        )
        by_type = {}
        for t, v in zip(
            tbl.column("event_type").to_pylist(),
            tbl.column("value").to_pylist(),
        ):
            by_type.setdefault(t, []).append(v)
        assert set(out.column("event_type").to_pylist()) == set(by_type)
        for t, q, est in zip(
            out.column("event_type").to_pylist(),
            out.column("q").to_pylist(),
            out.column("value_est").to_pylist(),
        ):
            exact = np.sort(np.asarray(by_type[t]))
            n = len(exact)
            tol = max(2, 2 * n // 256)
            rank = np.searchsorted(exact, est)
            assert abs(rank - q * n) <= tol, (t, q, est, rank, q * n, tol)
        again = relational.approx_quantiles_by_type(
            SF_DIR, qs=qs, max_centroids=256
        )
        assert again.equals(out)


class TestStreamingSessionize:
    """Streaming gap-session windows: buffered reordering within the
    lateness horizon is EXACT, so both an ordered source and a
    shuffled source under generous lateness must equal the batch
    sessionize; with zero lateness a shuffled stream drops late events
    with exact accounting."""

    def test_equals_batch(self, ray_session):
        from website_indexer_ray.pipelines import relational

        s = relational.streaming_sessionize(SF_DIR)
        b = relational.sessionize(SF_DIR)
        assert s.to_pydict() == b.to_pydict()

    def _shuffled_batches(self, batch_size=256):
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["user_id", "ts"]
        )
        perm = np.random.default_rng(11).permutation(tbl.num_rows)
        tbl = tbl.take(pa.array(perm))
        return tbl, [
            tbl.slice(i, batch_size) for i in range(0, tbl.num_rows, batch_size)
        ]

    def test_shuffled_with_generous_lateness_is_exact(self, ray_session):
        from website_indexer_ray.pipelines import relational
        from website_indexer_ray.state.streaming import run_sessionized_stream

        _tbl, batches = self._shuffled_batches()
        out, n_late = run_sessionized_stream(
            batches, gap_us=30 * 60_000_000, lateness_us=10**18
        )
        assert n_late == 0
        assert out.to_pydict() == relational.sessionize(SF_DIR).to_pydict()

    def test_shuffled_zero_lateness_counts_late(self, ray_session):
        from website_indexer_ray.state.streaming import run_sessionized_stream

        tbl, batches = self._shuffled_batches()
        out, n_late = run_sessionized_stream(
            batches, gap_us=30 * 60_000_000, lateness_us=0
        )
        assert n_late > 0
        assert sum(out.column("n_events").to_pylist()) + n_late == tbl.num_rows

    def test_buffer_drains_with_watermark(self, ray_session):
        """With bounded lateness the buffer holds only the disorder
        horizon, not the whole stream — state is O(recent), evidence
        for the bounded-state claim."""
        import pyarrow.parquet as pq
        import ray as _ray

        from website_indexer_ray.state.streaming import SessionShard

        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["user_id", "ts"]
        )
        tbl = tbl.take(pa.compute.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
        shard = SessionShard.remote(30 * 60_000_000, 0)
        users = tbl.column("user_id").to_numpy(zero_copy_only=False)
        tss = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        half = len(users) // 2
        _ray.get(shard.add.remote(users[:half], tss[:half], int(tss[:half].max())))
        processed, buffered = _ray.get(shard.progress.remote())
        assert processed == half  # watermark == max ts ⇒ all ripe
        assert buffered == 0


class TestStreamingCheckpoint:
    """Shard snapshot/restore: kill the actors mid-stream, restore
    into fresh ones, finish the stream — the result must be identical
    to an uninterrupted run (the crawl engine's resume discipline,
    extended to the streaming family)."""

    def _event_batches(self, batch_size=128):
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_type", "value"]
        )
        tbl = tbl.take(pa.compute.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
        return [tbl.slice(i, batch_size) for i in range(0, tbl.num_rows, batch_size)]

    def test_session_shard_resume(self, ray_session):
        import ray as _ray

        from website_indexer_ray.state.streaming import SessionShard

        batches = self._event_batches()
        half = len(batches) // 2

        def drive(shard, bs):
            for b in bs:
                users = b.column("user_id").to_numpy(zero_copy_only=False)
                tss = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
                _ray.get(shard.add.remote(users, tss, int(tss.max())))

        # uninterrupted reference
        ref = SessionShard.remote(30 * 60_000_000, 0)
        drive(ref, batches)
        want = sorted(_ray.get(ref.flush.remote()))

        # interrupted: snapshot at the boundary, kill, restore, resume
        a = SessionShard.remote(30 * 60_000_000, 0)
        drive(a, batches[:half])
        snap = _ray.get(a.snapshot.remote())
        _ray.kill(a)
        b = SessionShard.remote(1, 1)  # wrong params, overwritten by restore
        _ray.get(b.restore.remote(snap))
        drive(b, batches[half:])
        assert sorted(_ray.get(b.flush.remote())) == want

    def test_window_shard_resume(self, ray_session):
        import ray as _ray

        from website_indexer_ray.state.streaming import (
            WindowShard,
            _partial_by_window,
        )

        batches = self._event_batches()
        half = len(batches) // 2
        W = 3600 * 1_000_000

        def drive(shard, bs):
            for batch in bs:
                g_win, g_type, g_sum, g_n, max_ts = _partial_by_window(batch, W)
                _ray.get(shard.add.remote(g_win, g_type, g_sum, g_n, max_ts))

        ref = WindowShard.remote(W, 0)
        drive(ref, batches)
        want = sorted(_ray.get(ref.flush.remote()))

        a = WindowShard.remote(W, 0)
        drive(a, batches[:half])
        snap = _ray.get(a.snapshot.remote())
        _ray.kill(a)
        b = WindowShard.remote(1, 1)
        _ray.get(b.restore.remote(snap))
        drive(b, batches[half:])
        got = sorted(_ray.get(b.poll_finalized.remote()) + _ray.get(b.flush.remote()))
        assert got == want

    def test_distinct_shard_resume(self, ray_session):
        """HLL register state round-trips the snapshot: estimates
        after kill+restore equal an uninterrupted run exactly."""
        import ray as _ray

        from website_indexer_ray.state.streaming import (
            DistinctShard,
            _distinct_partial,
        )

        batches = [
            b.select(["ts", "event_type", "user_id"])
            for b in self._event_batches()
        ]
        half = len(batches) // 2
        W = 3600 * 1_000_000

        def drive(shard, bs):
            for batch in bs:
                g_win, g_type, g_hashes, g_n, max_ts = _distinct_partial(
                    batch, W
                )
                _ray.get(
                    shard.add.remote(g_win, g_type, g_hashes, g_n, max_ts)
                )

        ref = DistinctShard.remote(W, 0)
        drive(ref, batches)
        want = sorted(_ray.get(ref.flush.remote()))

        a = DistinctShard.remote(W, 0)
        drive(a, batches[:half])
        snap = _ray.get(a.snapshot.remote())
        _ray.kill(a)
        b = DistinctShard.remote(1, 1, p=4)  # overwritten by restore
        _ray.get(b.restore.remote(snap))
        drive(b, batches[half:])
        got = sorted(
            _ray.get(b.poll_finalized.remote()) + _ray.get(b.flush.remote())
        )
        assert got == want


class TestNewOpWriteForms:
    """Sink forms of the session's O(corpus)-output ops reproduce the
    table/ds forms exactly from their committed checkpoint dirs."""

    def _read_dir(self, d, sort_col):
        import glob

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        files = sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))
        t = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
        return t.take(pc.sort_indices(t, sort_keys=[(sort_col, "ascending")]))

    def test_cumulative_revenue_write(self, ray_session, tmp_path):
        from website_indexer_ray.pipelines import relational

        out = str(tmp_path / "cum")
        relational.cumulative_revenue_write(SF_DIR, out)
        got = self._read_dir(out, "o_orderkey")
        want = relational.cumulative_revenue(SF_DIR)
        assert got.select(want.schema.names).to_pydict() == want.to_pydict()
        relational.cumulative_revenue_write(SF_DIR, out)  # resume no-op

    def test_seq_pack_write(self, ray_session, tmp_path):
        """Sink form of sequence packing equals the table form (the
        packing table is O(docs) — at corpus scale it lands in
        per-partition parquet, never a driver concat)."""
        from website_indexer_ray.pipelines import corpusops

        out = str(tmp_path / "pack")
        corpusops.seq_pack_write(SF_DIR, out)
        got = self._read_dir(out, "doc_id")
        want = corpusops.seq_pack(SF_DIR)
        assert got.select(want.schema.names).to_pydict() == want.to_pydict()
        # committed dir short-circuits (resume)
        corpusops.seq_pack_write(SF_DIR, out)

    def test_dup_span_removal_write(self, ray_session, tmp_path):
        from website_indexer_ray.pipelines import textops

        out = str(tmp_path / "dsr")
        textops.dup_span_removal_write(SF_DIR, out)
        got = self._read_dir(out, "doc_id")
        want = textops.dup_span_removal_ds(SF_DIR).take_all()
        want_map = {r["doc_id"]: r["text"] for r in want}
        got_map = dict(
            zip(got.column("doc_id").to_pylist(), got.column("text").to_pylist())
        )
        assert got_map == want_map

    def test_semantic_dedup_write(self, ray_session, tmp_path):
        from website_indexer_ray.pipelines import annops

        out = str(tmp_path / "sem")
        annops.semantic_dedup_write(SF_DIR, out)
        got = self._read_dir(out, "vec_id")
        assert got.column("vec_id").to_pylist() == annops.semantic_dedup(
            SF_DIR
        ).column("vec_id").to_pylist()


class TestBPE:
    """BPE tokenizer training: distributed word counts + bounded
    driver merge learning; hand-computed merges pin the algorithm."""

    def _write_docs(self, tmp_path, texts):
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": texts,
                }
            ),
            tmp_path / "documents.parquet",
        )
        return str(tmp_path)

    def test_merges_hand_computed(self, tmp_path):
        from website_indexer_ray.pipelines import textops

        sf = self._write_docs(tmp_path, ["aaab aaab", "aaab"])
        m = textops.bpe_train(sf, n_merges=10)
        got = list(zip(m["left"].to_pylist(), m["right"].to_pylist()))
        # word 'aaab'x3: (a,a)=6 wins; then (aa,a)/(a,b)/(b,</w>) tie
        # at 3 -> lexicographic min (a,b); then (aa,ab) < (ab,</w>);
        # then (aaab,</w>); then no pairs remain.
        assert got == [
            ("a", "a"),
            ("a", "b"),
            ("aa", "ab"),
            ("aaab", "</w>"),
        ]

    def test_token_counts_under_learned_merges(self, tmp_path):
        from website_indexer_ray.pipelines import textops

        sf = self._write_docs(tmp_path, ["aaab aaab aaab", "aaab aab", "xy"])
        # n_merges=2 learns (a,a) at count 9, then (b,</w>) at count 5
        # (aaab contributes 4 and aab 1); greedy lowest-rank-first:
        #   aaab -> (aa, a, b</w>) = 3   aab -> (aa, b</w>) = 2
        #   xy   -> (x, y, </w>)   = 3
        tc = textops.bpe_token_count(sf, n_merges=2)
        got = dict(
            zip(tc["doc_id"].to_pylist(), tc["n_bpe_tokens"].to_pylist())
        )
        assert got == {0: 9, 1: 5, 2: 3}
        # with enough merges every word collapses to one token
        tc_full = textops.bpe_token_count(sf, n_merges=12)
        assert tc_full["n_bpe_tokens"].to_pylist() == [3, 2, 1]

    def test_deterministic_and_bounded(self):
        from website_indexer_ray.pipelines import textops

        a = textops.bpe_train(SF_DIR, n_merges=20)
        b = textops.bpe_train(SF_DIR, n_merges=20)
        assert a.equals(b)
        assert a.num_rows == 20
        tc = textops.bpe_token_count(SF_DIR, n_merges=20)
        assert tc.num_rows == 500
        counts = tc["n_bpe_tokens"].to_pylist()
        assert min(counts) > 0


class TestSimilarityJoin:
    """Set-similarity join (broadcast-small-side form) vs the exact
    token-Jaccard SQL oracle."""

    SQL = r"""
        WITH dtok AS (
          SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id,
                   unnest(string_split(lower(trim(
                       regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
            FROM documents) WHERE w <> ''
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM dtok GROUP BY doc_id),
        inter AS (
          SELECT q.doc_id AS query_id, d.doc_id AS doc_id, COUNT(*) AS i
          FROM dtok q JOIN dtok d ON q.w = d.w AND q.doc_id <> d.doc_id
          WHERE q.doc_id % 29 = 0
          GROUP BY 1, 2
        )
        SELECT i.query_id, i.doc_id,
               CAST((100 * i.i) // (sq.n + sd.n - i.i) AS BIGINT)
                   AS jaccard_pct
        FROM inter i
        JOIN sizes sq ON sq.doc_id = i.query_id
        JOIN sizes sd ON sd.doc_id = i.doc_id
        WHERE 100 * i.i >= 20 * (sq.n + sd.n - i.i)
        ORDER BY i.query_id, i.doc_id
    """

    def test_matches_sql(self, ray_session, con):
        from website_indexer_ray.pipelines import textops

        out = textops.similarity_join(SF_DIR)
        assert_matches_sql(out, con, self.SQL)

    def test_join_invariants(self, ray_session):
        from website_indexer_ray.pipelines import textops

        out = textops.similarity_join(SF_DIR, threshold_pct=35)
        q = out["query_id"].to_pylist()
        d = out["doc_id"].to_pylist()
        j = out["jaccard_pct"].to_pylist()
        assert all(x % 29 == 0 for x in q)  # query side membership
        assert all(a != b for a, b in zip(q, d))  # no self pairs
        assert out.num_rows > 0 and min(j) >= 35  # threshold honored
