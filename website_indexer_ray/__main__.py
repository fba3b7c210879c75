"""CLI entrypoint — the `manage.py crawl` / viewer / `manage_crawls`
surface of the reference (U2, /root/reference/crawler/management/
commands/crawl.py:7-15) as a `ray job submit`-able module:

  python -m website_indexer_ray crawl --start-url URL --corpus C.parquet \
      [--seeds S.parquet] [--out DIR] [--max-pages N] [--depth D] \
      [--politeness-wait 0.5] [--random-wait] [--respect-robots]
  python -m website_indexer_ray query --out DIR --search-type title --q foo \
      [--format json|csv] [--page N]
  python -m website_indexer_ray manage {list,delete,clean} --root DIR [...]

This module owns the Ray session (guarded init — under `ray job
submit` the cluster is already up); the library never calls ray.init.
The corpus parquet is the fetch seam: at test/bench scale fetching is
a lookup into it, and a network fetcher drops in behind the same
interface (stages/fetch.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_ready():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")


# wpull exit-status classes (ArchiveTeam wpull v2.0.1 errors.py:40-63):
# 4 network_failure, 5 ssl_verification_error, 6 authentication_failure,
# 7 protocol_error, 8 server_error. The reference downgrades these to 0
# because per-URL network errors are EXPECTED during a crawl and must
# not fail downstream processing (crawler/wpull/plugin.py:283-304).
_DOWNGRADED_EXIT_CODES = frozenset({4, 5, 6, 7, 8})


def map_exit_status(exit_code: int) -> int:
    """plugin.py:283-304 — network-class failures exit 0."""
    return 0 if exit_code in _DOWNGRADED_EXIT_CODES else exit_code


def _classify_crawl_exception(exc: BaseException) -> int:
    """Map an engine exception onto the wpull exit-status classes so
    map_exit_status applies to our failures the same way."""
    import socket
    import ssl

    if isinstance(exc, ssl.SSLError):
        return 5
    if isinstance(
        exc, (ConnectionError, socket.gaierror, socket.timeout, TimeoutError)
    ):
        return 4
    if isinstance(exc, OSError):
        return 3  # file I/O — wpull keeps this one nonzero
    return 1  # generic error — NOT downgraded


def cmd_crawl(args) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from website_indexer_ray.config import CrawlConfig
    from website_indexer_ray.pipelines.engine import CrawlEngine
    from website_indexer_ray.schemas import SEEDS_SCHEMA

    _ray_ready()
    # No --corpus ⇒ real-network crawl (HttpFetcher behind the same
    # fetch seam, stages/httpfetch.py).
    corpus = pq.read_table(args.corpus) if args.corpus else None
    if args.seeds:
        seeds = pq.read_table(args.seeds)
    else:
        seeds = pa.Table.from_pylist(
            [{"url": args.start_url, "seed_batch": 0}], schema=SEEDS_SCHEMA
        )
    cfg = CrawlConfig(
        start_url=args.start_url,
        max_pages=args.max_pages,
        depth=args.depth,
        politeness_wait=args.politeness_wait,
        random_wait=args.random_wait,
        respect_robots=args.respect_robots,
        n_seen_shards=args.seen_shards,
        fetch_concurrency=args.fetch_concurrency,
        write_docs_table=args.docs_table,
    )
    try:
        result = CrawlEngine(cfg, args.out, crawl_id=args.crawl_id).run(
            corpus, seeds, resume=args.resume
        )
    except Exception as exc:
        code = map_exit_status(_classify_crawl_exception(exc))
        print(
            json.dumps(
                {
                    "crawl_id": args.crawl_id,
                    "status": "Failed",
                    "error": f"{type(exc).__name__}: {exc}",
                    "exit_status": code,
                }
            )
        )
        return code
    lineage = result.lineage_table()
    print(
        json.dumps(
            {
                "crawl_id": args.crawl_id,
                "out": args.out,
                "status": result.status()["status"],
                "generations": lineage.num_rows,
                "urls_fetched": sum(lineage.column("n_accepted").to_pylist()),
                "pages": sum(lineage.column("n_pages").to_pylist()),
                "errors": sum(lineage.column("n_errors").to_pylist()),
                "redirects": sum(lineage.column("n_redirects").to_pylist()),
            }
        )
    )
    return 0


def cmd_query(args) -> int:
    from website_indexer_ray.pipelines import query
    from website_indexer_ray.pipelines.engine import CrawlResult

    result = CrawlResult(args.out)
    # Prune the dominant html column unless this search needs it.
    cols = None
    if args.search_type != "html":
        cols = [n for n in result.records_dataset().schema.names if n != "html"]
    records = result.records_table(columns=cols)
    out = query.search_pages(
        records, args.search_type, args.q, include_related=args.format == "csv"
    )
    if args.format == "csv":
        kind = (
            "pages_components"
            if args.search_type == "components"
            else "pages_links" if args.search_type == "links" else "pages"
        )
        # suffix strip applies to CSV serializations too
        # (viewer/serializers.py:27-35)
        _name, data = query.to_csv_bytes(query.strip_title_suffix(out), kind)
        sys.stdout.buffer.write(data)
    else:
        page = query.paginate(query.strip_title_suffix(out), args.page)
        print(json.dumps(page, default=str))
    return 0


def cmd_page(args) -> int:
    """Exact-URL page detail (viewer/views.py:151-159); exit 4 when
    absent (the RetrieveAPIView's 404)."""
    from website_indexer_ray.pipelines import query
    from website_indexer_ray.pipelines.engine import CrawlResult

    records = CrawlResult(args.out).records_table()
    row = query.page_detail(records, args.url)
    if row is None:
        print(json.dumps({"detail": "Not found."}))
        return 4
    print(json.dumps(row, default=str))
    return 0


def cmd_diff(args) -> int:
    """Recrawl snapshot diff (pipelines/recrawl.py): pages
    added/removed/changed between two crawl checkpoints, as JSON
    lines or CSV-ish tab output."""
    _ray_ready()
    from website_indexer_ray.pipelines.recrawl import (
        crawl_diff_from_checkpoints,
    )

    d = crawl_diff_from_checkpoints(args.old, args.new)
    for row in d.to_pylist():
        print(json.dumps(row))
    return 0


def cmd_list(args) -> int:
    """components/errors/redirects list views (viewer/urls.py:8-10)
    with their status_code filters; JSON lines or CSV."""
    from website_indexer_ray.pipelines import query
    from website_indexer_ray.pipelines.engine import CrawlResult

    result = CrawlResult(args.out)
    cols = [n for n in result.records_dataset().schema.names if n != "html"]
    records = result.records_table(columns=cols)
    if args.kind == "components":
        table = query.list_components(records)
    elif args.kind == "errors":
        table = query.list_errors(records, status_code=args.status_code)
    else:
        table = query.list_redirects(records, status_code=args.status_code)
    if args.format == "csv":
        _name, data = query.to_csv_bytes(table, args.kind)
        sys.stdout.buffer.write(data)
    else:
        for row in table.to_pylist():
            print(json.dumps(row, default=str))
    return 0


def cmd_curate(args) -> int:
    """Run the composite training-data curation pipeline
    (pipelines/curate.py): clean → exact dedup → near dedup → kept
    corpus, checkpointed per stage and resumable."""
    _ray_ready()
    import os

    from website_indexer_ray.pipelines.curate import (
        curate_corpus,
        documents_from_crawl,
    )

    if not args.sf_dir and not args.from_crawl:
        print("curate: one of --sf-dir / --from-crawl is required", file=sys.stderr)
        return 2
    sf_dir = args.sf_dir
    if args.from_crawl:
        # bridge a finished crawl's docs artifact into the curation
        # input shape first (resumable; committed dirs are reused)
        sf_dir = documents_from_crawl(
            args.from_crawl, os.path.join(args.out, "bridge")
        )

    stats = curate_corpus(
        sf_dir,
        args.out,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        langs=tuple(args.langs.split(",")),
        jaccard_threshold=args.jaccard,
        normalize=args.normalize,
        redact_pii=args.redact_pii,
        decon_max_overlap=args.decon_max_overlap,
        per_source_quota=args.per_source_quota,
        quota_longest=args.quota_longest,
        n_shards=args.n_shards,
        max_ppl=args.max_ppl,
        snapshot_dir=args.snapshot_dir,
        dup_span_k=args.dup_span_k,
        near_dup_method=args.near_dup_method,
        simhash_max_hamming=args.simhash_max_hamming,
        embed_sim_threshold=args.embed_sim_threshold,
        embed_dim=args.embed_dim,
    )
    print(
        json.dumps(
            dict(
                zip(
                    stats.column("stage").to_pylist(),
                    stats.column("n_docs").to_pylist(),
                )
            )
        )
    )
    return 0


def cmd_serve(args) -> int:
    """Run the viewer HTTP server over a crawl checkpoint
    (server.py — the reference viewer's endpoint surface)."""
    from website_indexer_ray.server import make_server

    httpd = make_server(args.out, args.port)
    print(
        json.dumps(
            {
                "serving": args.out,
                "url": f"http://127.0.0.1:{httpd.server_address[1]}/",
            }
        ),
        flush=True,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_manage(args) -> int:
    from website_indexer_ray.pipelines import manage

    if args.action == "list":
        for c in manage.list_crawls(args.root):
            print(json.dumps({k: v for k, v in c.items() if not k.startswith("_")} | {"name": c["_name"]}))
    elif args.action == "compact":
        _ray_ready()
        import os as _os

        info = manage.compact_crawl(_os.path.join(args.root, args.name))
        print(json.dumps({"compacted": args.name, **info}))
    elif args.action == "delete":
        manage.delete_crawl(args.root, args.name, dry_run=args.dry_run)
        print(json.dumps({"deleted": args.name, "dry_run": args.dry_run}))
    else:  # clean
        dropped = manage.clean_crawls(args.root, keep=args.keep, dry_run=args.dry_run)
        print(json.dumps({"dropped": dropped, "dry_run": args.dry_run}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="website_indexer_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--start-url", required=True)
    c.add_argument("--corpus")  # omit for a real-network crawl
    c.add_argument("--seeds")
    c.add_argument("--out", default="/tmp/wir_crawl")
    c.add_argument("--crawl-id", default="crawl-0")
    c.add_argument("--max-pages", type=int, default=0)
    c.add_argument("--depth", type=int, default=0)
    # Reference defaults: wpull runs --wait=0.5 --random-wait
    # (crawler/wpull/crawler.py:36-37); pass --politeness-wait 0 to
    # disable for synthetic-corpus runs.
    c.add_argument("--politeness-wait", type=float, default=0.5)
    c.add_argument(
        "--random-wait",
        action=argparse.BooleanOptionalAction,
        default=True,
    )
    c.add_argument("--respect-robots", action="store_true")
    c.add_argument("--seen-shards", type=int, default=8)
    c.add_argument("--fetch-concurrency", type=int, default=8)
    c.add_argument("--resume", action="store_true")
    c.add_argument(
        "--docs-table",
        action="store_true",
        help="also materialize the interleaved-span docs artifact "
        "(enables `curate --from-crawl` on this checkpoint)",
    )
    c.set_defaults(fn=cmd_crawl)

    q = sub.add_parser("query")
    q.add_argument("--out", required=True)
    q.add_argument("--search-type", default="")
    q.add_argument("--q", default="")
    q.add_argument("--format", choices=["json", "csv"], default="json")
    q.add_argument("--page", type=int, default=1)
    q.set_defaults(fn=cmd_query)

    pg = sub.add_parser("page")
    pg.add_argument("--out", required=True)
    pg.add_argument("--url", required=True)
    pg.set_defaults(fn=cmd_page)

    ls = sub.add_parser("list")
    ls.add_argument("kind", choices=["components", "errors", "redirects"])
    ls.add_argument("--out", required=True)
    ls.add_argument("--status-code", type=int)
    ls.add_argument("--format", choices=["json", "csv"], default="json")
    ls.set_defaults(fn=cmd_list)

    sv = sub.add_parser("serve")
    sv.add_argument("--out", required=True)
    sv.add_argument("--port", type=int, default=8000)
    sv.set_defaults(fn=cmd_serve)

    cu = sub.add_parser("curate")
    cu.add_argument("--sf-dir", default=None)
    cu.add_argument(
        "--from-crawl",
        default=None,
        help="a finished crawl checkpoint dir (run with write_docs_table); "
        "its docs artifact is bridged into the curation input shape",
    )
    cu.add_argument("--out", required=True)
    cu.add_argument("--min-tokens", type=int, default=20)
    cu.add_argument("--max-tokens", type=int, default=1000)
    cu.add_argument("--langs", default="en")
    cu.add_argument("--jaccard", type=float, default=0.5)
    cu.add_argument("--normalize", action="store_true")
    cu.add_argument("--redact-pii", action="store_true")
    cu.add_argument("--decon-max-overlap", type=int, default=None)
    cu.add_argument("--per-source-quota", type=int, default=None)
    cu.add_argument("--quota-longest", action="store_true")
    cu.add_argument("--n-shards", type=int, default=None)
    cu.add_argument("--max-ppl", type=float, default=None)
    cu.add_argument("--snapshot-dir", default=None)
    cu.add_argument("--dup-span-k", type=int, default=None)
    cu.add_argument(
        "--near-dup-method",
        choices=["minhash", "simhash", "embedding"],
        default="minhash",
    )
    cu.add_argument("--embed-sim-threshold", type=float, default=0.9)
    cu.add_argument("--embed-dim", type=int, default=64)
    cu.add_argument("--simhash-max-hamming", type=int, default=3)
    cu.set_defaults(fn=cmd_curate)

    df = sub.add_parser("diff")
    df.add_argument("--old", required=True, help="previous crawl checkpoint dir")
    df.add_argument("--new", required=True, help="newer crawl checkpoint dir")
    df.set_defaults(fn=cmd_diff)

    m = sub.add_parser("manage")
    m.add_argument("action", choices=["list", "delete", "clean", "compact"])
    m.add_argument("--root", required=True)
    m.add_argument("--name")
    m.add_argument("--keep", type=int, default=1)
    m.add_argument("--dry-run", action="store_true")
    m.set_defaults(fn=cmd_manage)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
