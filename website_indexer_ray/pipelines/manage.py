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
