"""End-to-end composite curation pipeline (pipelines/curate.py):
stage results must equal composing the individual operators, output
is checkpointed + resumable, drop sets stay duplicate-sized."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from website_indexer_ray.pipelines import curate, textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    stats = curate.curate_corpus(SF, out)
    return out, stats


class TestCurate:
    def test_stage_counts_monotonic(self, curated):
        _out, stats = curated
        counts = dict(
            zip(stats.column("stage").to_pylist(),
                stats.column("n_docs").to_pylist())
        )
        assert counts["input"] >= counts["cleaned"] >= counts[
            "after_exact_dedup"
        ] >= counts["kept"]
        assert counts["kept"] > 0

    def test_kept_equals_composed_operators(self, curated):
        """kept == (length-filter ∩ lang==en) ∖ exact-dups ∖ near-dups
        computed through the standalone operators."""
        out, stats = curated
        kept_files = sorted(
            glob.glob(f"{out}/kept/documents.parquet/*.parquet")
        )
        kept_ids = sorted(
            v
            for f in kept_files
            for v in pq.read_table(f, columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )

        lf = set(textops.length_filter(SF).column("doc_id").to_pylist())
        li = textops.lang_id(SF)
        en = set(
            d
            for d, lang in zip(
                li.column("doc_id").to_pylist(),
                li.column("lang_pred").to_pylist(),
            )
            if lang == "en"
        )
        cleaned = lf & en
        dropped_exact = set(
            curate.exact_dedup_dropped(f"{out}/filtered").tolist()
        )
        pairs = textops.minhash_lsh_pairs(f"{out}/filtered")
        survivors_pairs = pairs.filter(
            pa.array(
                [
                    a not in dropped_exact and b not in dropped_exact
                    for a, b in zip(
                        pairs.column("doc_a").to_pylist(),
                        pairs.column("doc_b").to_pylist(),
                    )
                ]
            )
        )
        dropped_near = set(
            textops._dropped_from_pairs(survivors_pairs).tolist()
        )
        expected = sorted(cleaned - dropped_exact - dropped_near)
        assert kept_ids == expected

    def test_simhash_near_dup_method(self, ray_session, tmp_path):
        """near_dup_method='simhash' swaps the near-dup family; kept ==
        cleaned ∖ exact-dups ∖ simhash-near-dups via the standalone
        operators, and an unknown method is refused."""
        out = str(tmp_path / "sim")
        curate.curate_corpus(SF, out, near_dup_method="simhash")
        kept_ids = sorted(
            v
            for f in glob.glob(f"{out}/kept/documents.parquet/*.parquet")
            for v in pq.read_table(f, columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        lf = set(textops.length_filter(SF).column("doc_id").to_pylist())
        li = textops.lang_id(SF)
        en = {
            d
            for d, lang in zip(
                li.column("doc_id").to_pylist(),
                li.column("lang_pred").to_pylist(),
            )
            if lang == "en"
        }
        cleaned = lf & en
        dropped_exact = set(
            curate.exact_dedup_dropped(f"{out}/filtered").tolist()
        )
        pairs = textops.simhash_pairs(f"{out}/filtered")
        alive = pairs.filter(
            pa.array(
                [
                    a not in dropped_exact and b not in dropped_exact
                    for a, b in zip(
                        pairs.column("doc_a").to_pylist(),
                        pairs.column("doc_b").to_pylist(),
                    )
                ]
            )
        )
        dropped_near = set(textops._dropped_from_pairs(alive).tolist())
        assert kept_ids == sorted(cleaned - dropped_exact - dropped_near)
        with pytest.raises(ValueError, match="near_dup_method"):
            curate.curate_corpus(SF, str(tmp_path / "bad"), near_dup_method="x")

    def test_embedding_near_dup_method(self, ray_session, tmp_path):
        """near_dup_method='embedding': hashed-BoW vectors derived from
        the cleaned text feed the LSH-cosine pair path; kept == cleaned
        ∖ exact-dups ∖ embedding-near-dups via the standalone ops run
        over the committed embeddings sink."""
        from website_indexer_ray.pipelines.annops import embedding_dedup_lsh

        out = str(tmp_path / "emb")
        curate.curate_corpus(SF, out, near_dup_method="embedding")
        kept_ids = sorted(
            v
            for f in glob.glob(f"{out}/kept/documents.parquet/*.parquet")
            for v in pq.read_table(f, columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        lf = set(textops.length_filter(SF).column("doc_id").to_pylist())
        li = textops.lang_id(SF)
        en = {
            d
            for d, lang in zip(
                li.column("doc_id").to_pylist(),
                li.column("lang_pred").to_pylist(),
            )
            if lang == "en"
        }
        cleaned = lf & en
        dropped_exact = set(
            curate.exact_dedup_dropped(f"{out}/filtered").tolist()
        )
        pairs = embedding_dedup_lsh(f"{out}/embeddings", threshold=0.9)
        pairs = pairs.rename_columns(["doc_a", "doc_b"])
        alive = pairs.filter(
            pa.array(
                [
                    a not in dropped_exact and b not in dropped_exact
                    for a, b in zip(
                        pairs.column("doc_a").to_pylist(),
                        pairs.column("doc_b").to_pylist(),
                    )
                ]
            )
        )
        dropped_near = set(textops._dropped_from_pairs(alive).tolist())
        assert kept_ids == sorted(cleaned - dropped_exact - dropped_near)

    def test_resume_skips_committed_stages(self, curated, monkeypatch):
        """A re-run over a fully committed out_dir touches no source
        data and returns the same stats stages."""
        out, _stats = curated

        def boom(*a, **k):
            raise AssertionError("source re-read on resume")

        monkeypatch.setattr(curate, "read_documents", boom)
        stats2 = curate.curate_corpus(SF, out)
        assert "kept" in stats2.column("stage").to_pylist()

    def test_exact_dropped_is_duplicate_sized(self, ray_session, tmp_path):
        """The broadcast drop set scales with duplicate count, not
        corpus size: a corpus with 3 exact dups drops exactly the 3
        non-minimum ids."""
        docs = pa.table(
            {
                "doc_id": pa.array(range(6), type=pa.int64()),
                "text": pa.array(
                    ["same text here"] * 3   # 0,1,2 -> keep 0
                    + ["  same   TEXT here "]  # 3 normalizes equal -> drop
                    + ["unique one", "unique two"]
                ),
            }
        )
        d = tmp_path / "mini"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        dropped = curate.exact_dedup_dropped(str(d))
        assert dropped.tolist() == [1, 2, 3]


class TestCurateTrainingReady:
    """The opt-in training-readiness stages: decontamination,
    per-source quotas, PII redaction, shard assignment."""

    @pytest.fixture(scope="class")
    def full(self, ray_session, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("curated_full"))
        stats = curate.curate_corpus(
            SF,
            out,
            redact_pii=True,
            decon_max_overlap=3,
            per_source_quota=10,
            n_shards=4,
        )
        files = sorted(glob.glob(f"{out}/kept/documents.parquet/*.parquet"))
        kept = pa.concat_tables(pq.read_table(f) for f in files)
        return out, stats, kept

    def test_shard_column(self, full):
        from website_indexer_ray.pipelines.corpusops import _MIX_MULT

        _out, _stats, kept = full
        assert "shard" in kept.schema.names
        ids = np.array(kept.column("doc_id").to_pylist(), dtype=np.uint64)
        want = (ids * np.uint64(_MIX_MULT)) % np.uint64(2**32) % np.uint64(4)
        assert kept.column("shard").to_pylist() == want.astype(int).tolist()

    def test_eval_docs_excluded(self, full):
        from website_indexer_ray.pipelines.corpusops import _EVAL_MOD

        _out, _stats, kept = full
        assert all(d % _EVAL_MOD != 0 for d in kept.column("doc_id").to_pylist())

    def test_quota_enforced(self, full):
        import collections

        _out, _stats, kept = full
        by_src = collections.Counter(kept.column("source").to_pylist())
        assert by_src and max(by_src.values()) <= 10

    def test_pii_redacted(self, full):
        import re

        from website_indexer_ray.pipelines.corpusops import (
            PII_EMAIL,
            PII_IPV4,
            PII_PHONE,
        )

        _out, _stats, kept = full
        blob = " ".join(kept.column("text").to_pylist())
        for pat in (PII_EMAIL, PII_IPV4, PII_PHONE):
            assert not re.search(pat, blob)

    def test_decon_bound_holds(self, full):
        """Recompute each kept doc's eval overlap independently via
        the standalone operator machinery — all must be <= the cap."""
        import pyarrow.compute as pc

        from website_indexer_ray.pipelines.corpusops import (
            DECON_N,
            _EVAL_MOD,
            _eval_overlap_counts,
            _word_ngram_rows,
        )

        _out, _stats, kept = full
        raw = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        ev_mask = pa.array(
            [d % _EVAL_MOD == 0 for d in raw.column("doc_id").to_pylist()]
        )
        _, ev_grams, _ = _word_ngram_rows(
            raw.filter(ev_mask).column("text"), DECON_N
        )
        # overlap measured on the PRE-redaction text (redaction could
        # only break grams, never create overlap)
        raw_by_id = dict(
            zip(raw.column("doc_id").to_pylist(), raw.column("text").to_pylist())
        )
        kept_raw = pa.array(
            [raw_by_id[d] for d in kept.column("doc_id").to_pylist()]
        )
        _, overlap = _eval_overlap_counts(kept_raw, pc.unique(ev_grams), DECON_N)
        assert (overlap <= 3).all()

    def test_resume_with_options(self, full, monkeypatch):
        out, stats, _kept = full

        def boom(*a, **k):
            raise AssertionError("source re-read on resume")

        monkeypatch.setattr(curate, "read_documents", boom)
        stats2 = curate.curate_corpus(
            SF,
            out,
            redact_pii=True,
            decon_max_overlap=3,
            per_source_quota=10,
            n_shards=4,
        )
        assert "kept" in stats2.column("stage").to_pylist()

    def test_normalize_feeds_dedup(self, ray_session, tmp_path):
        """With normalize=True, case/whitespace variants of one text
        collapse in stage 1 and exact dedup then drops the twins."""
        docs = pa.table(
            {
                "doc_id": pa.array(range(3), type=pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox " * 10,
                        ("THE  quick   BROWN fox " * 10).strip() + " ",
                        "a completely different document here " * 8,
                    ]
                ),
                "source": pa.array(["s"] * 3),
            }
        )
        d = tmp_path / "mini"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        out = str(tmp_path / "out")
        curate.curate_corpus(
            str(d), out, min_tokens=5, max_tokens=10000, normalize=True
        )
        files = sorted(glob.glob(f"{out}/kept/documents.parquet/*.parquet"))
        kept = pa.concat_tables(pq.read_table(f) for f in files)
        kept_ids = sorted(kept.column("doc_id").to_pylist())
        assert 0 in kept_ids and 1 not in kept_ids
        # stage-1 output carries the normalized text
        assert all("  " not in t for t in kept.column("text").to_pylist())


class TestCuratePplGate:
    """The opt-in CCNet-style perplexity gate (max_ppl)."""

    def test_ppl_gate_equals_composed_operator(
        self, curated, tmp_path_factory
    ):
        """kept(max_ppl=t) == kept(baseline) ∩ {ppl <= t}, with ppl
        from the standalone lm_perplexity over the same cleaned
        corpus the pipeline trains its model on."""
        from website_indexer_ray.pipelines import corpusops

        base_out, _stats = curated
        base_kept = set(
            v
            for f in glob.glob(f"{base_out}/kept/documents.parquet/*.parquet")
            for v in pq.read_table(f, columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        ppl_tbl = corpusops.lm_perplexity(f"{base_out}/filtered")
        ppl = dict(
            zip(
                ppl_tbl.column("doc_id").to_pylist(),
                ppl_tbl.column("ppl").to_pylist(),
            )
        )
        thr = float(np.median([p for p in ppl.values() if p is not None]))
        out = str(tmp_path_factory.mktemp("curated_ppl"))
        stats = curate.curate_corpus(SF, out, max_ppl=thr)
        kept = sorted(
            v
            for f in glob.glob(f"{out}/kept/documents.parquet/*.parquet")
            for v in pq.read_table(f, columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        want = sorted(
            d for d in base_kept if ppl[d] is not None and ppl[d] <= thr
        )
        assert kept == want
        assert 0 < len(kept) < len(base_kept)
        counts = dict(
            zip(stats.column("stage").to_pylist(),
                stats.column("n_docs").to_pylist())
        )
        assert counts["kept"] == len(kept)


class TestCurateIncremental:
    """snapshot_dir mode: a second run's cleaned docs that already
    exist (normalized) in a prior run's kept corpus are dropped."""

    def test_snapshot_drop_and_quota_longest(self, ray_session, tmp_path):
        def write_docs(d, rows):
            d.mkdir()
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                        "text": pa.array([r[1] for r in rows]),
                        "source": pa.array([r[2] for r in rows]),
                    }
                ),
                str(d / "documents.parquet"),
            )

        en = (
            "the quick brown fox and the lazy dog walked to the market "
            "in the morning and it was a fine day for all of them there"
        )
        # run 1: one english doc that survives curation
        run1_in = tmp_path / "in1"
        write_docs(run1_in, [(1, en, "a")])
        out1 = tmp_path / "out1"
        curate.curate_corpus(str(run1_in), str(out1))
        kept1 = pa.concat_tables(
            pq.read_table(f)
            for f in glob.glob(f"{out1}/kept/documents.parquet/*.parquet")
        )
        assert kept1.column("doc_id").to_pylist() == [1]

        # run 2: doc 10 duplicates run 1's kept doc (case/ws variant) →
        # dropped by the snapshot stage; doc 11 is new → kept
        run2_in = tmp_path / "in2"
        write_docs(
            run2_in,
            [
                (10, "  THE quick   brown fox and the lazy dog walked to "
                     "the market in the morning and it was a fine day for "
                     "all of them there", "a"),
                (11, en.replace("fox", "owl").replace("dog", "cat"), "a"),
            ],
        )
        out2 = tmp_path / "out2"
        stats = curate.curate_corpus(
            str(run2_in), str(out2), snapshot_dir=str(out2.parent / "out1" / "kept")
        )
        kept2 = pa.concat_tables(
            pq.read_table(f)
            for f in glob.glob(f"{out2}/kept/documents.parquet/*.parquet")
        )
        assert kept2.column("doc_id").to_pylist() == [11]
        counts = dict(
            zip(stats.column("stage").to_pylist(), stats.column("n_docs").to_pylist())
        )
        assert counts["after_exact_dedup"] == 1  # snapshot drop counted

    def test_quota_longest_keeps_longest(self, ray_session, tmp_path):
        mk = (
            "the quick brown fox and the lazy dog walked to the market "
            "in the morning and it was a fine day "
        )
        rows = [
            (1, mk + "short tail one", "s"),
            (2, mk + "a much longer tail with many extra distinct words "
                "appended here to win the ranked quota selection", "s"),
            (3, mk + "short tail two", "s"),
        ]
        d = tmp_path / "in"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                    "source": pa.array([r[2] for r in rows]),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = tmp_path / "out"
        curate.curate_corpus(
            str(d),
            str(out),
            jaccard_threshold=0.95,  # keep the tails from near-dedup
            per_source_quota=1,
            quota_longest=True,
        )
        kept = pa.concat_tables(
            pq.read_table(f)
            for f in glob.glob(f"{out}/kept/documents.parquet/*.parquet")
        )
        assert kept.column("doc_id").to_pylist() == [2]


class TestCurateDupSpan:
    """Opt-in ExactSubstr stage (dup_span_k): duplicated token runs
    among SURVIVING docs are excised from all but the first
    occurrence during the final keep pass."""

    PASSAGE = ("alpha bravo charlie delta echo foxtrot golf hotel "
               "india juliet kilo lima")

    def _write(self, tmp_path):
        d0 = ("the cat and the dog is in a house of the king near the "
              "river " + self.PASSAGE)
        d1 = ("a bird is on the tree and the sun of morning light was "
              "warm " + self.PASSAGE)
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array([d0, d1, d0]),  # doc 2 = exact dup of 0
                "source": pa.array(["s"] * 3),
            }
        )
        d = tmp_path / "mini"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        return str(d), d0, d1

    def test_excision_and_first_occurrence_kept(self, ray_session, tmp_path):
        sf, d0, d1 = self._write(tmp_path)
        out = str(tmp_path / "out")
        stats = curate.curate_corpus(
            sf, out, min_tokens=5, max_tokens=10000, dup_span_k=10
        )
        counts = dict(
            zip(stats.column("stage").to_pylist(),
                stats.column("n_docs").to_pylist())
        )
        assert counts["dup_span_affected"] == 1
        files = sorted(glob.glob(f"{out}/kept/documents.parquet/*.parquet"))
        kept = pa.concat_tables(pq.read_table(f) for f in files)
        by_id = dict(
            zip(kept.column("doc_id").to_pylist(),
                kept.column("text").to_pylist())
        )
        assert sorted(by_id) == [0, 1]  # doc 2 exact-dup dropped
        assert by_id[0] == d0  # first occurrence byte-identical
        assert by_id[1] == d1.replace(" " + self.PASSAGE, "")
        assert "alpha" not in by_id[1]

    def test_dropped_doc_cannot_anchor_a_run(self, ray_session):
        """A dedup-dropped doc is excluded from gram emission, so a
        passage shared ONLY with dropped docs stays intact in the
        survivor."""
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "x " + TestCurateDupSpan.PASSAGE + " y",
                        "p q r " + TestCurateDupSpan.PASSAGE + " s t",
                    ]
                ),
            }
        )
        marks = textops.dup_span_marks(
            "", k=10, documents=docs, exclude_ids=np.array([1])
        )
        assert marks.num_rows == 0  # doc 2's copy is now unique
        marks_all = textops.dup_span_marks("", k=10, documents=docs)
        assert set(marks_all.column("doc_id").to_pylist()) == {2}


class TestCrawlToCurate:
    """The composed end-to-end story: crawl (interleaved-span docs
    artifact) → documents_from_crawl bridge → curate_corpus. The
    bridge output must preserve the crawl's cleaned-body text exactly
    (joined kind=='text' spans) and the whole chain must be resumable."""

    def test_bridge_then_curate(self, ray_session, tmp_path):
        from website_indexer_ray.fixtures.gen import (
            SAMPLE_START_URL,
            sample_site_corpus,
        )
        from website_indexer_ray.functions.xxh import xxh64
        from website_indexer_ray.pipelines.engine import CrawlConfig, CrawlEngine

        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(
            start_url=SAMPLE_START_URL, n_seen_shards=2,
            fetch_concurrency=2, write_docs_table=True,
        )
        crawl_out = str(tmp_path / "crawl")
        res = CrawlEngine(cfg, crawl_out).run(corpus, seeds)

        bridge_dir = curate.documents_from_crawl(crawl_out, str(tmp_path / "docs"))
        docs_files = glob.glob(f"{bridge_dir}/documents.parquet/*.parquet")
        bridged = pa.concat_tables(pq.read_table(f) for f in docs_files)
        # url rides along for provenance; curation readers prune it
        assert set(bridged.column_names) == {"doc_id", "text", "source", "url"}

        # text equals the joined kind=='text' spans, per URL
        originals = {
            r["doc_id"]: " ".join(
                s["text"] for s in r["spans"] if s["kind"] == "text"
            )
            for r in res.ray_docs().take_all()
        }
        mask63 = (1 << 63) - 1
        by_hash = dict(
            zip(bridged.column("doc_id").to_pylist(),
                bridged.column("text").to_pylist())
        )
        assert len(by_hash) == len(originals)
        for url, text in originals.items():
            assert by_hash[xxh64(url) & mask63] == text

        # the doc_map round-trips every URL
        map_files = glob.glob(f"{bridge_dir}/doc_map.parquet/*.parquet")
        dm = pa.concat_tables(pq.read_table(f) for f in map_files)
        assert set(dm.column("url").to_pylist()) == set(originals)

        # curate runs directly on the bridge output (langs widened:
        # the tiny sample pages may classify 'und')
        out = str(tmp_path / "curated")
        stats = curate.curate_corpus(
            bridge_dir, out, min_tokens=1, max_tokens=100000,
            langs=("en", "und"), n_shards=4,
        )
        counts = dict(
            zip(stats.column("stage").to_pylist(),
                stats.column("n_docs").to_pylist())
        )
        assert counts["kept"] > 0
        # bridge resume: a second call reuses committed outputs
        import website_indexer_ray.util as util

        before = sorted(glob.glob(f"{bridge_dir}/documents.parquet/*.parquet"))
        curate.documents_from_crawl(crawl_out, bridge_dir)
        after = sorted(glob.glob(f"{bridge_dir}/documents.parquet/*.parquet"))
        assert before == after


class TestDupSpanGateAnchors:
    """A doc the keep pass will drop via a PER-BATCH gate (perplexity /
    decontamination) must not anchor a duplicated run's 'first
    occurrence' — otherwise the surviving copy is excised and the
    passage vanishes from the kept corpus entirely."""

    def test_ppl_dropped_doc_cannot_anchor(self, ray_session, tmp_path):
        import numpy as np

        from website_indexer_ray.pipelines.corpusops import _lm_model, _ppl_scores

        passage = ("alpha bravo charlie delta echo foxtrot golf hotel "
                   "india juliet kilo lima")
        # DIVERSE rare transitions (repeated garbage would self-train
        # into the corpus LM and score LOW); common English repeated
        # puts the model's mass on docs 1-2's transitions
        garbage = " ".join(
            f"{chr(113 + i % 6)}{chr(118 + i % 5)}{i % 10}{chr(106 + (i * 3) % 9)}"
            for i in range(50)
        )
        # single non-repeating bodies: internal repetition would be
        # real intra-doc duplication and get (correctly) excised
        normal1 = (
            "the cat and the dog is in the house of the king and the day "
            "was warm while the men were in the halls as the sun was high "
            "over the roofs so the children ran down to the river bank "
        )
        normal2 = (
            "a man was at the door of the old farm and the rain fell on "
            "the field while the birds flew over the hill into the wood "
            "as the horse stood near the gate by the long stone wall "
        )
        texts = [
            garbage + " " + passage,      # doc 0: high-ppl anchor
            normal1 + passage,            # doc 1: normal, shares passage
            normal2 + "a completely different tail of common words here",
        ]
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(["s"] * 3),
            }
        )
        d = tmp_path / "mini"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))

        # pick max_ppl between doc 0's (high) and docs 1-2's (low)
        out1 = str(tmp_path / "probe")
        curate.curate_corpus(str(d), out1, min_tokens=1, max_tokens=10**6,
                             langs=("en", "und"))
        logp = _lm_model(f"{out1}/filtered", None)
        _, ppl = _ppl_scores(docs.column("text"), logp)
        assert ppl[0] > max(ppl[1], ppl[2])
        threshold = float((ppl[0] + max(ppl[1], ppl[2])) / 2)

        out2 = str(tmp_path / "gated")
        stats = curate.curate_corpus(
            str(d), out2, min_tokens=1, max_tokens=10**6,
            langs=("en", "und"), max_ppl=threshold, dup_span_k=10,
        )
        files = sorted(glob.glob(f"{out2}/kept/documents.parquet/*.parquet"))
        kept = pa.concat_tables(pq.read_table(f) for f in files)
        by_id = dict(
            zip(kept.column("doc_id").to_pylist(),
                kept.column("text").to_pylist())
        )
        assert sorted(by_id) == [1, 2]  # doc 0 dropped by the ppl gate
        # doc 1's copy of the passage SURVIVES: the dropped doc 0 was
        # excluded from anchoring, so the run is unique among survivors
        assert by_id[1] == texts[1]
