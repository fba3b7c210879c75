"""Crawl-run management — the ``manage_crawls`` command equivalents
(/root/reference/crawler/management/commands/manage_crawls.py:14-69)
over a root directory of crawl checkpoint dirs.

Each crawl output dir carries its ``crawl.json`` lifecycle record
(Started/Finished/Failed + config + failure_message — mirrors
crawler/models.py:19-52). ``clean`` keeps the newest K finished and K
failed crawls and drops non-latest in-progress ones, exactly the
reference's retention rule (manage_crawls.py:41-62).
"""

from __future__ import annotations

import json
import os
import shutil


def _load(root: str) -> list[dict]:
    out = []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name, "crawl.json")
        if os.path.exists(path):
            with open(path) as f:
                rec = json.load(f)
            rec["_dir"] = os.path.join(root, name)
            rec["_name"] = name
            out.append(rec)
    return out


def list_crawls(root: str) -> list[dict]:
    """Newest first (Crawl.Meta.ordering = ["-started"],
    models.py:30-31); dir names sort chronologically by convention."""
    return sorted(_load(root), key=lambda r: r["_name"], reverse=True)


def latest_finished(root: str):
    """The crawl every viewer query is implicitly scoped to — the most
    recent Finished crawl (the reference's default manager,
    crawler/models.py:55-64). Returns a CrawlResult or None."""
    from website_indexer_ray.pipelines.engine import CrawlResult

    for rec in list_crawls(root):
        if rec["status"] == "Finished":
            return CrawlResult(rec["_dir"], rec.get("crawl_id", rec["_name"]))
    return None


def delete_crawl(root: str, name: str, dry_run: bool = False) -> bool:
    """Delete one crawl and all its rows (FK CASCADE equivalent,
    models.py:68-70)."""
    path = os.path.join(root, name)
    if not os.path.exists(os.path.join(path, "crawl.json")):
        raise KeyError(name)
    if not dry_run:
        shutil.rmtree(path)
    return True


def compact_crawl(out_dir: str, target_partitions: int | None = None) -> dict:
    """Compact a finished crawl's per-generation records checkpoint
    into a consolidated ``records-compact/`` directory — at 10¹⁰-URL
    scale a crawl leaves thousands of generations × shards of small
    files, and every downstream read pays the per-file open cost.

    Streaming: the generations are read as one Dataset and written
    back re-blocked (no driver materialization); the compacted copy is
    committed via a ``_SUCCESS`` manifest and the per-generation dirs
    are then dropped. ``CrawlResult`` readers prefer the compacted
    layout when its manifest exists, so a crawl interrupted
    mid-compaction keeps serving from the untouched per-generation
    checkpoint (atomic swap semantics without a rename barrier).
    """
    import glob as _glob

    import ray
    import ray.data

    from website_indexer_ray.pipelines.engine import CrawlResult

    result = CrawlResult(out_dir)
    paths = sorted(
        _glob.glob(os.path.join(out_dir, "records", "gen=*", "*.parquet"))
    )
    if not paths:
        raise FileNotFoundError(f"no records checkpoint under {out_dir}")
    compact_dir = os.path.join(out_dir, "records-compact")
    shutil.rmtree(compact_dir, ignore_errors=True)
    ds = ray.data.read_parquet(paths)
    n_rows = ds.count()
    if target_partitions:
        ds = ds.repartition(target_partitions)
    ds.write_parquet(compact_dir)
    with open(os.path.join(compact_dir, "_SUCCESS"), "w") as f:
        json.dump({"n_rows": n_rows, "n_source_files": len(paths)}, f)
    for d in _glob.glob(os.path.join(out_dir, "records", "gen=*")):
        for p in _glob.glob(os.path.join(d, "*.parquet")):
            os.remove(p)  # keep the _SUCCESS lineage manifests
    n_files = len(_glob.glob(os.path.join(compact_dir, "*.parquet")))
    return {
        "n_rows": n_rows,
        "n_source_files": len(paths),
        "n_compacted_files": n_files,
    }


def clean_crawls(root: str, keep: int = 1, dry_run: bool = False) -> list[str]:
    """Retention: drop non-latest Started crawls and all but the
    newest ``keep`` per completed status (manage_crawls.py:41-62)."""
    crawls = list_crawls(root)
    if not crawls:
        return []
    to_delete: list[str] = []

    started = [c for c in crawls if c["status"] == "Started"]
    # newest overall crawl is exempt (manage_crawls.py:44-46)
    latest_name = crawls[0]["_name"]
    to_delete += [c["_name"] for c in started if c["_name"] != latest_name]

    for status in ("Finished", "Failed"):
        group = [c for c in crawls if c["status"] == status]
        to_delete += [c["_name"] for c in group[keep:]]

    if not dry_run:
        for name in to_delete:
            shutil.rmtree(os.path.join(root, name))
    return sorted(to_delete)
