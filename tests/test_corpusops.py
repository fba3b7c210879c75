"""Corpus-curation operators (pipelines/corpusops.py) against their
DuckDB oracles plus structural / synthetic-input invariants.

This module replicates the driver comparison (row count + sorted
column names + values vs the oracle_sql() entries) at sf0.001, plus
targeted unit tests on synthetic content the sf tables don't exercise
(PII hits, duplicated bigrams, planted eval contamination, packing
math, the byte-bigram LM's naive-reference parity).
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
        assert table.column(name).to_pylist() == gold.column(name).to_pylist(), name


def _docs(rows: list[tuple[int, str, str]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "source": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )


class TestDriverParity:
    """The exact gate: every corpusops query vs its oracle_sql()."""

    @pytest.mark.parametrize(
        "name",
        [
            "pii_redact",
            "repetition_stats",
            "decontaminate",
            "group_quota_sample",
            "seq_pack",
            "text_normalize",
            "source_mix_sample",
            "shuffle_shards",
        ],
    )
    def test_oracle_hash(self, ray_session, con, name):
        import __ray_entry__ as entry

        fn = entry.queries()[name]
        sql = entry.oracle_sql()[name]
        out = fn(SF_DIR)
        if not isinstance(out, pa.Table):
            out = out.to_arrow() if hasattr(out, "to_arrow") else pa.Table.from_pandas(out)
        assert_matches_sql(out, con, sql)


class TestPiiRedact:
    def test_synthetic_hits(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        docs = _docs(
            [
                (1, "mail me at a.b+c@ex-ample.org or 10.0.0.1 now", "s"),
                (2, "call 555-123-4567 or 555.123.4567 or 555 123 4567", "s"),
                (3, "no pii here", "s"),
            ]
        )
        out = corpusops.pii_redact(SF_DIR, documents=docs)
        by_id = {r["doc_id"]: r for r in out.to_pylist()}
        assert by_id[1]["text"] == "mail me at <EMAIL> or <IP> now"
        assert by_id[1]["n_emails"] == 1 and by_id[1]["n_ips"] == 1
        assert by_id[2]["text"] == "call <PHONE> or <PHONE> or <PHONE>"
        assert by_id[2]["n_phones"] == 3
        assert by_id[3]["text"] == "no pii here"
        assert by_id[3]["n_emails"] == by_id[3]["n_ips"] == by_id[3]["n_phones"] == 0


class TestRepetitionStats:
    def test_synthetic(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        docs = _docs(
            [
                (1, "a b a b a b", "s"),  # bigrams: ab ba ab ba ab
                (2, "x", "s"),  # no bigrams
                (3, "p q r", "s"),  # pq qr — all distinct
            ]
        )
        out = corpusops.repetition_stats(SF_DIR, documents=docs)
        by_id = {r["doc_id"]: r for r in out.to_pylist()}
        assert by_id[1] == {
            "doc_id": 1,
            "n_bigrams": 5,
            "n_uniq_bigrams": 2,
            "top_bigram_n": 3,
        }
        assert by_id[2]["n_bigrams"] == 0 and by_id[2]["top_bigram_n"] == 0
        assert by_id[3] == {
            "doc_id": 3,
            "n_bigrams": 2,
            "n_uniq_bigrams": 2,
            "top_bigram_n": 1,
        }


class TestDecontaminate:
    def test_planted_contamination(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        ev_text = "alpha beta gamma delta epsilon zeta"
        docs = _docs(
            [
                # doc 0 and 101 are eval docs (doc_id % 101 == 0)
                (0, ev_text, "s"),
                (101, "one two three four five six", "s"),
                # doc 1 copies an eval 5-gram verbatim
                (1, "xx alpha beta gamma delta epsilon yy", "s"),
                # doc 2 shares no 5-gram
                (2, "alpha beta gamma QQ epsilon zeta eta", "s"),
            ]
        )
        out = corpusops.decontaminate(SF_DIR, documents=docs)
        by_id = {r["doc_id"]: r for r in out.to_pylist()}
        assert set(by_id) == {1, 2}  # eval docs excluded from output
        assert by_id[1]["n_overlap"] == 1
        assert by_id[1]["n_grams"] == 3
        assert by_id[2]["n_overlap"] == 0

    def test_explicit_eval_table(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        docs = _docs([(1, "a b c d e f", "s")])
        ev = _docs([(9, "b c d e f g", "s")])
        out = corpusops.decontaminate(SF_DIR, documents=docs, eval_documents=ev)
        row = out.to_pylist()[0]
        assert row["n_grams"] == 2  # 'a b c d e', 'b c d e f'
        assert row["n_overlap"] == 1  # 'b c d e f'


class TestGroupQuotaSample:
    def test_keeps_k_smallest_per_source(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        rows = [(i, f"t{i}", f"src{i % 3}") for i in range(30)]
        out = corpusops.group_quota_sample(SF_DIR, k=4, documents=_docs(rows))
        kept = out.column("doc_id").to_pylist()
        expect = sorted(
            d for d in range(30) if sorted(x for x in range(30) if x % 3 == d % 3).index(d) < 4
        )
        assert kept == expect
        assert len(kept) == 12


    def test_colocated_sources_keep_separate_quotas(self):
        """Two sources landing in ONE partition (routing-hash
        collision / co-location) must not merge their quotas — the
        resolve body groups by the exact source string."""
        from website_indexer_ray.pipelines.corpusops import _quota_resolve

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 10, 11, 12], type=pa.int64()),
                "source": pa.array(["a", "a", "a", "b", "b", "b"]),
                "src_hash": pa.array([7, 7, 7, 7, 7, 7], type=pa.int64()),
            }
        )
        out = _quota_resolve(2, t)
        assert sorted(out.column("doc_id").to_pylist()) == [1, 2, 10, 11]


class TestTextNormalize:
    def test_synthetic(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        docs = _docs(
            [
                (1, "  Hello   WORLD\t\nfoo  ", "s"),
                (2, "already clean", "s"),
            ]
        )
        out = corpusops.text_normalize(SF_DIR, documents=docs)
        by_id = {r["doc_id"]: r for r in out.to_pylist()}
        assert by_id[1]["text"] == "hello world foo"
        assert by_id[1]["n_chars_raw"] == len("  Hello   WORLD\t\nfoo  ")
        assert by_id[1]["n_chars"] == len("hello world foo")
        assert by_id[2]["text"] == "already clean"


class TestSourceMixSample:
    def test_rate_map_and_determinism(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        rows = [(i, f"t{i}", "keepall" if i % 2 else "dropall") for i in range(40)]
        out = corpusops.source_mix_sample(
            SF_DIR, rates={"keepall": 100, "dropall": 0}, documents=_docs(rows)
        )
        kept = out.column("doc_id").to_pylist()
        assert kept == [i for i in range(40) if i % 2]
        assert set(out.column("rate").to_pylist()) == {100}
        # deterministic: second run identical
        out2 = corpusops.source_mix_sample(
            SF_DIR, rates={"keepall": 100, "dropall": 0}, documents=_docs(rows)
        )
        assert out.equals(out2)


class TestShuffleShards:
    def test_is_permutation_with_dense_positions(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        out = corpusops.shuffle_shards(SF_DIR, n_shards=4)
        ids = out.column("doc_id").to_pylist()
        assert len(ids) == len(set(ids)) == 500
        shards = np.array(out.column("shard").to_pylist())
        pos = np.array(out.column("pos").to_pylist())
        skey = np.array(out.column("skey").to_pylist())
        assert set(np.unique(shards)) <= set(range(4))
        for s in np.unique(shards):
            p = np.sort(pos[shards == s])
            assert (p == np.arange(len(p))).all()  # dense 0..n-1
            # position order follows the shuffle key order
            in_shard = np.argsort(pos[shards == s])
            assert (np.diff(skey[shards == s][in_shard]) >= 0).all()


class TestShuffleShardsWrite:
    def test_sink_files_are_pos_ordered_shards(self, ray_session, tmp_path):
        """Each sink partition file IS one shard in position order,
        and the union equals the table form."""
        import glob

        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import corpusops

        out = str(tmp_path / "shards")
        corpusops.shuffle_shards_write(SF_DIR, out, n_shards=4)
        assert (tmp_path / "shards" / "_SUCCESS").exists()
        table_form = corpusops.shuffle_shards(SF_DIR, n_shards=4)
        parts = []
        for f in sorted(glob.glob(f"{out}/part-*.parquet")):
            t = pq.read_table(f)
            shards = set(t.column("shard").to_pylist())
            assert len(shards) == 1  # one file == one shard
            pos = t.column("pos").to_pylist()
            assert pos == sorted(pos) == list(range(len(pos)))
            parts.append(t)
        merged = pa.concat_tables(parts)
        merged = merged.take(
            pa.compute.sort_indices(merged, sort_keys=[("doc_id", "ascending")])
        )
        assert merged.equals(table_form)
        # resume: a second call with _SUCCESS present is a no-op
        corpusops.shuffle_shards_write(SF_DIR, out, n_shards=4)


class TestSeqPack:
    def test_matches_naive_cumsum(self, ray_session):
        from website_indexer_ray.pipelines import corpusops
        from website_indexer_ray.pipelines.textops import token_count

        out = corpusops.seq_pack(SF_DIR, seq_len=128)
        tc = token_count(SF_DIR)
        n = dict(zip(tc.column("doc_id").to_pylist(), tc.column("n_tokens").to_pylist()))
        ids = sorted(n)
        start = 0
        expect = {}
        for d in ids:
            expect[d] = start
            start += n[d]
        got = dict(
            zip(out.column("doc_id").to_pylist(), out.column("start_tok").to_pylist())
        )
        assert got == expect
        # pack arithmetic is consistent
        for r in out.to_pylist():
            assert r["pack_first"] == r["start_tok"] // 128
            assert r["pack_offset"] == r["start_tok"] % 128
            span = max(r["n_tokens"], 1)
            assert r["pack_last"] == (r["start_tok"] + span - 1) // 128
            assert r["pack_last"] >= r["pack_first"]

    def test_stream_is_gapless(self, ray_session):
        """Consecutive docs tile the token stream with no gaps/overlaps."""
        from website_indexer_ray.pipelines import corpusops

        out = corpusops.seq_pack(SF_DIR)
        starts = np.array(out.column("start_tok").to_pylist())
        ntok = np.array(out.column("n_tokens").to_pylist())
        assert (starts[1:] == starts[:-1] + ntok[:-1]).all()
        assert starts[0] == 0


def _naive_ppl(texts: list[str]) -> list[float | None]:
    """Pure-Python reference: order-2 byte LM with add-one smoothing,
    trained on the same texts, sequential per-doc log-prob sums."""
    import math
    from collections import Counter

    bigrams: Counter = Counter()
    row: Counter = Counter()
    for t in texts:
        b = t.encode()
        for i in range(len(b) - 1):
            bigrams[(b[i], b[i + 1])] += 1
            row[b[i]] += 1
    out: list[float | None] = []
    for t in texts:
        b = t.encode()
        if len(b) < 2:
            out.append(None)
            continue
        s = 0.0
        for i in range(len(b) - 1):
            c = bigrams[(b[i], b[i + 1])]
            s += math.log2((c + 1) / (row[b[i]] + 256))
        out.append(2.0 ** (-s / (len(b) - 1)))
    return out


class TestLmPerplexity:
    DOCS = pa.table(
        {
            "doc_id": pa.array(range(7), type=pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",
                    "zzzzqqqqxxxx jjjj kkkk wwww vvvv",
                    "",  # no bytes -> null ppl
                    "a",  # one byte, no transition -> null ppl
                    "naïve café — déjà vu ünïcödé",  # multi-byte UTF-8
                    "the the the the the the the the",
                ]
            ),
        }
    )

    def test_matches_naive_reference(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        got = corpusops.lm_perplexity(SF_DIR, documents=self.DOCS)
        want = _naive_ppl(self.DOCS.column("text").to_pylist())
        assert got.column("doc_id").to_pylist() == list(range(7))
        assert got.column("n_trans").to_pylist() == [
            max(len(t.encode()) - 1, 0) for t in self.DOCS.column("text").to_pylist()
        ]
        for g, w in zip(got.column("ppl").to_pylist(), want):
            if w is None:
                assert g is None
            else:
                assert g == pytest.approx(w, rel=1e-9)
        # duplicate docs score identically; pure repetition scores as
        # far more predictable than the letter-salad doc
        ppl = got.column("ppl").to_pylist()
        assert ppl[0] == ppl[1]
        assert ppl[6] < ppl[0] < ppl[2]

    def test_score_independent_of_batching(self):
        """A doc's score depends only on its own bytes + the model:
        per-doc singleton batches reproduce the concatenated batch
        exactly (boundary transitions never leak across docs)."""
        from website_indexer_ray.pipelines import corpusops

        texts = self.DOCS.column("text")
        buf, offs = corpusops._text_bytes_offsets(texts)
        ids, n_trans = corpusops._bigram_ids(buf, offs)
        logp = np.arange(corpusops._LM_CELLS, dtype=np.float64) * 1e-6
        starts = (np.cumsum(n_trans) - n_trans)[n_trans > 0]
        sums = np.add.reduceat(logp[ids], starts)
        singles = []
        for t in texts.to_pylist():
            b1, o1 = corpusops._text_bytes_offsets(pa.array([t]))
            i1, n1 = corpusops._bigram_ids(b1, o1)
            if n1[0] > 0:
                singles.append(np.add.reduceat(logp[i1], np.array([0]))[0])
        assert np.allclose(sums, np.array(singles), rtol=0, atol=0)

    def test_sf_corpus_against_naive(self, ray_session):
        """Full sf0.001 documents table vs the naive reference."""
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import corpusops

        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        got = corpusops.lm_perplexity(SF_DIR)
        order = pa.compute.sort_indices(docs, sort_keys=[("doc_id", "ascending")])
        docs = docs.take(order)
        want = _naive_ppl(docs.column("text").to_pylist())
        assert got.num_rows == docs.num_rows
        for g, w in zip(got.column("ppl").to_pylist(), want):
            assert g == pytest.approx(w, rel=1e-9)

    def test_write_form_matches_table_form(self, ray_session, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines import corpusops

        out = str(tmp_path / "ppl")
        corpusops.lm_perplexity_write(SF_DIR, out)
        files = sorted(glob.glob(f"{out}/**/*.parquet", recursive=True))
        assert files
        merged = pa.concat_tables([pq.read_table(f) for f in files])
        merged = merged.take(
            pa.compute.sort_indices(merged, sort_keys=[("doc_id", "ascending")])
        )
        assert merged.equals(corpusops.lm_perplexity(SF_DIR))


class TestGroupTopk:
    def test_oracle(self, ray_session, con):
        from website_indexer_ray.pipelines import corpusops

        assert_matches_sql(
            corpusops.group_topk(SF_DIR),
            con,
            """SELECT doc_id FROM (
                 SELECT doc_id, row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
                 FROM documents)
               WHERE rn <= 15 ORDER BY doc_id""",
        )

    def test_ranked_selection_and_tiebreak(self, ray_session):
        """k longest per source; equal lengths break to lowest doc_id."""
        from website_indexer_ray.pipelines import corpusops

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                "source": pa.array(["a", "a", "a", "b", "b", "b"]),
                "n_chars": pa.array([10, 30, 30, 5, 5, 5], type=pa.int64()),
            }
        )
        out = corpusops.group_topk(SF_DIR, k=2, documents=docs)
        # a: 30-char docs 2,3 beat 10-char doc 1; b: all tied at 5 →
        # lowest doc_ids 4,5
        assert out.column("doc_id").to_pylist() == [2, 3, 4, 5]


class TestImportanceSample:
    """DSIR-style importance sampling (Xie et al. 2023): hashed
    unigram+bigram features, log p_target − log q_raw per occurrence,
    top-n selection. Weights are p/q importance ratios, so the
    discrimination test uses a raw corpus whose domain frequencies are
    SYMMETRIC — the target term alone must decide."""

    PHYS = (
        "quantum energy particle wave field physics electron proton "
        "momentum spectrum "
    ) * 3
    COOK = (
        "recipe butter flour sugar oven bake whisk dough salt pepper "
    ) * 3

    def _raw(self):
        return pa.table(
            {
                "doc_id": pa.array(range(10), type=pa.int64()),
                "text": pa.array(
                    [self.PHYS if i < 5 else self.COOK for i in range(10)]
                ),
            }
        )

    def _target(self):
        # target-domain vocabulary in a DIFFERENT word order (no
        # shared bigrams with the raw docs needed; unigrams decide)
        return pa.table(
            {
                "doc_id": pa.array([100, 101], type=pa.int64()),
                "text": pa.array(
                    [
                        "physics momentum spectrum quantum wave electron "
                        "energy particle",
                        "proton field quantum energy physics spectrum wave",
                    ]
                ),
            }
        )

    def test_target_domain_wins(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        out = corpusops.importance_sample(
            "", n=5, target_documents=self._target(), documents=self._raw()
        )
        assert set(out.column("doc_id").to_pylist()) == {0, 1, 2, 3, 4}
        # identical docs score identically (hash-stable integer weights)
        assert len(set(out.column("logw_micro").to_pylist())) == 1

    def test_ordering_and_determinism(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        a = corpusops.importance_sample(
            "", n=10, target_documents=self._target(), documents=self._raw()
        )
        b = corpusops.importance_sample(
            "", n=10, target_documents=self._target(), documents=self._raw()
        )
        assert a.equals(b)  # deterministic end to end
        w = a.column("logw_micro").to_pylist()
        assert w == sorted(w, reverse=True)
        # ties broken by ascending doc_id
        ids = a.column("doc_id").to_pylist()
        for i in range(1, len(ids)):
            if w[i] == w[i - 1]:
                assert ids[i] > ids[i - 1]

    def test_default_target_split_excluded(self, ray_session):
        from website_indexer_ray.pipelines import corpusops

        out = corpusops.importance_sample(SF_DIR, n=20)
        assert out.num_rows == 20
        assert all(d % 101 != 0 for d in out.column("doc_id").to_pylist())

    def test_batch_buckets_match_per_doc_form(self, ray_session):
        """The vectorized feature pass (_dsir_batch_buckets) must emit
        EXACTLY the per-doc `_dsir_buckets_of` multiset per document —
        pinned on the real corpus plus unicode/empty edges."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from website_indexer_ray.pipelines.corpusops import (
            _dsir_batch_buckets,
            _dsir_buckets_of,
        )

        m = 8192
        texts = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["text"]
        ).column("text")
        edge = pa.chunked_array(
            [pa.array(["", "Héllo 42 Héllo", "one", "a b a b a"])]
        )
        for col in (texts, edge):
            b, par = _dsir_batch_buckets(col, m)
            for i, t in enumerate(col.to_pylist()):
                want = np.sort(_dsir_buckets_of(t, m))
                got = np.sort(b[par == i])
                assert np.array_equal(got, want), i
