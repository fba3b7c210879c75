"""Lance table sink/source for the crawl checkpoints.

BASELINE.json's input_hint mandates Lance tables for the interleaved
docs/records surface. The ``lance`` / ``pylance`` package is NOT
installed in this container (verified import failure; no network to
install), so this module is the honest seam: when lance is importable
it writes/reads real Lance datasets (``lance.write_dataset`` /
``ray.data.read_lance``); otherwise it falls back to the Parquet
layout that carries the identical resumability contract (one
directory per generation, ``_SUCCESS`` manifests — see
pipelines/engine.py) and reports which format it used.

The function surface is format-agnostic on purpose: callers pass a
Dataset + directory and get back {"format": "lance"|"parquet",
"path": ...}; ``read_records`` returns a ray.data.Dataset either way,
so the engine and query layers never branch on the format.
"""

from __future__ import annotations

import glob
import os

try:  # pragma: no cover - not installed in this container
    import lance

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

import ray.data


def lance_available() -> bool:
    return HAVE_LANCE


def write_records(ds: "ray.data.Dataset", out_dir: str) -> dict:
    """Persist a records Dataset as a Lance dataset (when the library
    exists) or partitioned Parquet (fallback). Streaming either way —
    blocks flow from the executor to the writer without driver
    materialization."""
    if HAVE_LANCE:
        path = out_dir if out_dir.endswith(".lance") else f"{out_dir}.lance"
        # Ray's native Lance writer (ray.data.Dataset.write_lance) —
        # max_rows_per_file keeps fragments resumable/compactable.
        ds.write_lance(path)
        return {"format": "lance", "path": path}
    ds.write_parquet(out_dir)
    return {"format": "parquet", "path": out_dir}


def read_records(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Dataset over a checkpoint written by ``write_records`` —
    format-sniffed, column-pruned at the read."""
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        if not HAVE_LANCE:
            raise RuntimeError(
                "checkpoint at %s is a Lance dataset but the lance "
                "package is not installed" % path
            )
        return ray.data.read_lance(path, columns=columns)
    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return ray.data.read_parquet(files or path, columns=columns)
