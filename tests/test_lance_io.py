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
