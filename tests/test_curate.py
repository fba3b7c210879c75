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
