"""Lance sink/source seam (sources/lance_io.py): real Lance when the
library exists, Parquet fallback with the identical Dataset contract
otherwise (this container ships no lance package)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from website_indexer_ray.sources import lance_io


@pytest.fixture()
def small_ds():
    return ray.data.from_arrow(
        pa.table({"url": ["a", "b", "c"], "n": [1, 2, 3]})
    )


class TestLanceSeam:
    def test_roundtrip_whatever_format(self, small_ds, tmp_path):
        info = lance_io.write_records(small_ds, str(tmp_path / "records"))
        assert info["format"] == ("lance" if lance_io.lance_available() else "parquet")
        back = lance_io.read_records(info["path"])
        rows = sorted(back.take_all(), key=lambda r: r["url"])
        assert [r["url"] for r in rows] == ["a", "b", "c"]
        assert [r["n"] for r in rows] == [1, 2, 3]

    def test_column_pruning(self, small_ds, tmp_path):
        info = lance_io.write_records(small_ds, str(tmp_path / "records"))
        back = lance_io.read_records(info["path"], columns=["url"])
        assert set(back.schema().names) == {"url"}

    @pytest.mark.skipif(
        lance_io.lance_available(), reason="only meaningful without lance"
    )
    def test_lance_checkpoint_without_library_raises(self, tmp_path):
        d = tmp_path / "records.lance"
        d.mkdir()
        with pytest.raises(RuntimeError, match="lance"):
            lance_io.read_records(str(d))

    @pytest.mark.skipif(
        not lance_io.lance_available(), reason="lance not installed here"
    )
    def test_real_lance_write(self, small_ds, tmp_path):
        info = lance_io.write_records(small_ds, str(tmp_path / "records"))
        assert info["format"] == "lance"

    @pytest.mark.skipif(
        not lance_io.lance_available(), reason="lance not installed here"
    )
    def test_lance_roundtrip_matches_parquet_fallback(
        self, small_ds, tmp_path, monkeypatch
    ):
        """CONTRACT: when the lance package IS present, the seam's
        Lance write/read must return byte-identical rows to the
        Parquet fallback — the engine and query layers never branch on
        format, so any divergence (schema coercion, row order
        guarantees, column pruning behavior) is a seam bug. Skipped in
        this container (no lance); fails loudly wherever lance exists."""
        lance_info = lance_io.write_records(small_ds, str(tmp_path / "l"))
        assert lance_info["format"] == "lance"
        monkeypatch.setattr(lance_io, "HAVE_LANCE", False)
        pq_info = lance_io.write_records(small_ds, str(tmp_path / "p"))
        assert pq_info["format"] == "parquet"
        via_pq = sorted(
            lance_io.read_records(pq_info["path"]).take_all(),
            key=lambda r: r["url"],
        )
        monkeypatch.setattr(lance_io, "HAVE_LANCE", True)
        via_lance = sorted(
            lance_io.read_records(lance_info["path"]).take_all(),
            key=lambda r: r["url"],
        )
        assert via_lance == via_pq
        # pruned reads agree too
        lp = lance_io.read_records(lance_info["path"], columns=["url"])
        pp = lance_io.read_records(pq_info["path"], columns=["url"])
        assert lp.schema().names == pp.schema().names
        assert sorted(r["url"] for r in lp.take_all()) == sorted(
            r["url"] for r in pp.take_all()
        )
