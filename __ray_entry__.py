"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline: a full crawl of the
deterministic synthetic web corpus (FIXTURES.md) through the
generation-based Ray Data engine, returning the interleaved-span
``docs`` table (the BASELINE.json input_hint shape). ``queries()``
exposes one entry per implemented operator/pipeline from SURVEY.md §2
plus the training-data operators; ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one (crawl-loop pipelines and
approximate/sketch ops are rows-only by nature).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() happens here or in the library.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_CRAWL_CACHE: dict[str, Any] = {}


def _crawl_result(n_pages: int = 120, tag: str = "q"):
    """Run (once per process) the synthetic-corpus crawl the crawl_*
    queries read from. Fully deterministic: seeded corpus, seeded
    engine, pure-function timestamps."""
    key = f"{tag}-{n_pages}"
    if key not in _CRAWL_CACHE:
        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.fixtures.gen import START_URL, generate_corpus
        from website_indexer_ray.pipelines.engine import CrawlEngine

        corpus, seeds = generate_corpus(n_pages=n_pages, seed=42)
        cfg = CrawlConfig(
            start_url=START_URL,
            n_seen_shards=4,
            fetch_concurrency=4,
            fetch_batch_size=256,
        )
        out = f"/tmp/wir_entry_crawl/{key}"
        _CRAWL_CACHE[key] = CrawlEngine(cfg, out, crawl_id=key).run(corpus, seeds)
    return _CRAWL_CACHE[key]


def entry() -> Any:
    """Flagship: synthetic-web crawl → interleaved-span docs table,
    as a streaming Dataset pipeline over the crawl checkpoint (pruned
    read, per-batch span construction — never materializes records on
    the driver)."""
    from website_indexer_ray.functions.spans import DOC_SOURCE_COLUMNS, docs_table_from_records

    result = _crawl_result(n_pages=40, tag="entry")
    return result.ray_records(columns=DOC_SOURCE_COLUMNS).map_batches(
        docs_table_from_records, batch_format="pyarrow"
    )


# --- crawl-engine queries (iterative; no SQL equivalent) ------------

def _crawl_pages(sf_dir: str):
    from website_indexer_ray.pipelines import query

    records = _crawl_result().records_table()
    out = query.search_pages(records)  # all pages, url-sorted
    return out


def _crawl_errors(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.list_errors(_crawl_result().records_table())


def _crawl_redirects(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.list_redirects(_crawl_result().records_table())


def _crawl_seen(sf_dir: str):
    return _crawl_result().seen_table()


def _crawl_docs(sf_dir: str):
    from website_indexer_ray.functions.spans import docs_table_from_records

    docs = docs_table_from_records(_crawl_result().records_table())
    import pyarrow as pa
    import pyarrow.compute as pc

    # flatten spans for a hashable tabular shape
    flat_doc, flat_kind, flat_text, flat_ref, flat_off = [], [], [], [], []
    for doc_id, spans in zip(
        docs.column("doc_id").to_pylist(), docs.column("spans").to_pylist()
    ):
        for s in spans:
            flat_doc.append(doc_id)
            flat_kind.append(s["kind"])
            flat_text.append(s["text"])
            flat_ref.append(s["media_ref"])
            flat_off.append(s["offset"])
    return pa.table(
        {
            "doc_id": flat_doc,
            "kind": flat_kind,
            "text": flat_text,
            "media_ref": flat_ref,
            "offset": flat_off,
        }
    )


def _crawl_components(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.list_components(_crawl_result().records_table())


def _crawl_links(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.list_links(_crawl_result().records_table())


def _crawl_lineage(sf_dir: str):
    return _crawl_result().lineage_table()


def _crawl_stats(sf_dir: str):
    """A1: Count/Min/Max(timestamp) crawl stats
    (viewer/context_processors.py:6-27) as a one-row table."""
    import pyarrow as pa

    from website_indexer_ray.pipelines import query

    s = query.crawl_stats(_crawl_result().records_table())
    return pa.table(
        {
            "count": pa.array([s["count"]], type=pa.int64()),
            "start": pa.array([str(s["start"])], type=pa.string()),
            "end": pa.array([str(s["end"])], type=pa.string()),
            "duration_us": pa.array(
                [int(s["duration"].total_seconds() * 1e6) if s["duration"] is not None else 0],
                type=pa.int64(),
            ),
        }
    )


def _crawl_media_features(sf_dir: str):
    """Pipeline composition: crawled docs' media spans (the <img> srcs
    the reference's parser drops, kept as kind="media" spans) → opaque
    payload rows → actor-style feature extraction (stub decode). The
    multimodal leg of the interleaved-document model."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from website_indexer_ray.functions.spans import docs_table_from_records
    from website_indexer_ray.pipelines.multimodal import MediaFeatureStage

    docs = docs_table_from_records(_crawl_result().records_table())
    rows = []
    for i, (doc_id, spans) in enumerate(
        zip(docs.column("doc_id").to_pylist(), docs.column("spans").to_pylist())
    ):
        for s in spans:
            if s["kind"] == "media":
                payload = f"{doc_id}::{s['media_ref']}".encode()
                rows.append(
                    {
                        "doc_id": i,
                        "url": doc_id,
                        "media_ref": s["media_ref"],
                        "payload": payload,
                        "n_bytes": len(payload),
                    }
                )
    if not rows:
        return pa.table({"url": [], "media_ref": [], "n_frames": []})
    batch = pa.Table.from_pylist(rows)
    feats = MediaFeatureStage()(batch)
    out = pa.table(
        {
            "url": batch.column("url"),
            "media_ref": batch.column("media_ref"),
            "n_frames": feats.column("n_frames"),
        }
    )
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("url", "ascending"), ("media_ref", "ascending")]
        )
    )


def _crawl_near_dup(sf_dir: str):
    """Pipeline composition: crawl output → near-duplicate keep list
    (the crawl's templated pages are natural near-dups). Deterministic:
    doc ids assigned over url-sorted pages."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from website_indexer_ray.pipelines import textops

    rec = _crawl_result().records_table()
    pages = rec.filter(
        pc.and_(
            pc.equal(rec.column("record_type"), "page"),
            pc.is_valid(rec.column("text")),  # titled but body-less pages
        )
    )
    pages = pages.take(
        pc.sort_indices(pages, sort_keys=[("url", "ascending")])
    )
    docs = pa.table(
        {
            "doc_id": pa.array(range(pages.num_rows), type=pa.int64()),
            "text": pages.column("text"),
        }
    )
    kept = textops.near_dedup_keep("", jaccard_threshold=0.8, documents=docs)
    urls = pages.column("url").take(kept.column("doc_id"))
    return pa.table({"url": urls})


def _search_title(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.search_pages(_crawl_result().records_table(), "title", "Section")


def _search_components(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.search_pages(
        _crawl_result().records_table(), "components", "o-", include_related=True
    )


def _search_links(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.search_pages(_crawl_result().records_table(), "links", "ext0.example")


def _search_text(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.search_pages(_crawl_result().records_table(), "text", "consumer")


def _search_html(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.search_pages(_crawl_result().records_table(), "html", "o-banner")


def _search_url(sf_dir: str):
    from website_indexer_ray.pipelines import query

    return query.search_pages(_crawl_result().records_table(), "url", "list")


def queries() -> dict[str, Callable[[str], Any]]:
    from website_indexer_ray.pipelines import annops, multimodal, relational, textops

    return {
        # crawl engine (SURVEY §2.1-2.10; iterative — rows-only checks)
        "crawl_pages": _crawl_pages,
        "crawl_errors": _crawl_errors,
        "crawl_redirects": _crawl_redirects,
        "crawl_seen": _crawl_seen,
        "crawl_docs_spans": _crawl_docs,
        "crawl_components": _crawl_components,
        "crawl_links": _crawl_links,
        "crawl_lineage": _crawl_lineage,
        "crawl_near_dup_keep": _crawl_near_dup,
        "crawl_media_features": _crawl_media_features,
        "crawl_stats": _crawl_stats,
        # viewer searches (C1, J2, J3 — rows-only, over crawl output)
        "search_title": _search_title,
        "search_url": _search_url,
        "search_text": _search_text,
        "search_html": _search_html,
        "search_components": _search_components,
        "search_links": _search_links,
        # relational operator classes (SQL-checkable)
        "agg_lineitem": relational.agg_lineitem,
        "top_revenue_orders": relational.top_revenue_orders,
        "events_stats": relational.events_stats,
        "status_counts": relational.status_counts,
        "distinct_sources": relational.distinct_sources,
        "pagination_orders": relational.pagination_orders,
        "filter_chain_events": relational.filter_chain_events,
        "window_counts": relational.window_counts,
        "asof_last_order": relational.asof_last_order,
        "sessionize": relational.sessionize,
        "approx_distinct_users": relational.approx_distinct_users,
        "search_docs_text": relational.search_docs_text,
        # training-data ops
        "exact_dedup": textops.exact_dedup,
        "token_count": textops.token_count,
        "quality_score": textops.quality_score,
        "lang_id": textops.lang_id,
        "fingerprint": textops.fingerprint,
        "minhash_lsh_pairs": textops.minhash_lsh_pairs,
        "near_dedup_keep": textops.near_dedup_keep,
        "paragraph_dedup": textops.paragraph_dedup,
        "vocab_top_tokens": textops.vocab_top_tokens,
        "length_filter": textops.length_filter,
        "simhash_pairs": textops.simhash_pairs,
        "ngram_jaccard_pairs": textops.ngram_jaccard_pairs,
        "knn_bruteforce": annops.knn_bruteforce,
        "knn_lsh": annops.knn_lsh,
        "knn_ivf": annops.knn_ivf,
        "embedding_dedup": annops.embedding_dedup_pairs,
        "media_features": multimodal.media_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "agg_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                       * CAST(ROUND((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_revenue_c4,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                       * CAST(ROUND((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c4
            FROM lineitem
            GROUP BY l_orderkey
            ORDER BY revenue_c4 DESC, l_orderkey
            LIMIT 10
        """,
        "events_stats": """
            SELECT COUNT(*) AS n, MIN(ts) AS min_ts, MAX(ts) AS max_ts FROM events
        """,
        "status_counts": """
            SELECT event_type, COUNT(*) AS n FROM events
            GROUP BY event_type ORDER BY event_type
        """,
        "distinct_sources": """
            SELECT DISTINCT source FROM documents ORDER BY source
        """,
        "pagination_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_orderkey LIMIT 25 OFFSET 25
        """,
        "filter_chain_events": """
            SELECT event_id, user_id FROM events
            WHERE event_type IN ('click', 'purchase')
              AND value > 50.0
              AND regexp_matches(props, '"k": [0-9]*[02468]}')
            ORDER BY event_id
        """,
        "window_counts": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
                   COUNT(*) AS n
            FROM events
            GROUP BY window_start, event_type
            ORDER BY window_start, event_type
        """,
        "asof_last_order": """
            SELECT e.event_id,
                   COALESCE((
                     SELECT max(o_orderkey) FROM orders o
                     WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                       AND o.o_orderdate = (
                         SELECT max(o_orderdate) FROM orders o2
                         WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)
                   ), -1) AS last_orderkey
            FROM events e ORDER BY event_id
        """,
        "sessionize": """
            WITH d AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   CAST(SUM(new_s) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM d GROUP BY user_id ORDER BY user_id
        """,
        "search_docs_text": """
            SELECT doc_id, lang, source FROM documents
            WHERE text ILIKE '%spark merge%' ORDER BY doc_id
        """,
        "exact_dedup": """
            SELECT MIN(doc_id) AS doc_id FROM documents
            GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
            ORDER BY doc_id
        """,
        "length_filter": """
            SELECT doc_id FROM documents
            WHERE length(regexp_extract_all(text, '\\w+|[^\\w\\s]'))
                  BETWEEN 20 AND 1000
            ORDER BY doc_id
        """,
        "vocab_top_tokens": """
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                  FROM documents)
            GROUP BY token ORDER BY n DESC, token LIMIT 100
        """,
        "paragraph_dedup": """
            WITH p AS (
                SELECT doc_id, unnest(string_split(text, '. ')) AS para
                FROM documents
            ), d AS (
                SELECT para, COUNT(*) AS c FROM p GROUP BY para
            )
            SELECT p.doc_id, COUNT(*) AS n_paragraphs,
                   CAST(SUM(CASE WHEN d.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_paragraphs
            FROM p JOIN d USING (para)
            GROUP BY p.doc_id ORDER BY p.doc_id
        """,
        "token_count": """
            SELECT doc_id,
                   length(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_score": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(regexp_extract_all(text, '\\S+')) AS n_words,
                   length(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   length(regexp_extract_all(text, '\\b(the|a|and|of|to|in|is)\\b')) AS n_stop,
                   CASE WHEN length(regexp_extract_all(text, '\\S+')) = 0 THEN 0
                        ELSE (1000 * length(regexp_extract_all(text, '\\b(the|a|and|of|to|in|is)\\b')))
                             // length(regexp_extract_all(text, '\\S+')) END AS stop_permille
            FROM documents ORDER BY doc_id
        """,
        "knn_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                ORDER BY vec_id LIMIT 5
            ),
            sims AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qe, e.embedding) AS sim
                FROM q, embeddings e
                WHERE e.vec_id != q.query_id
            )
            SELECT query_id, neighbor_id, rank FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY sim DESC, neighbor_id
                       ) AS rank
                FROM sims
            ) WHERE rank <= 10
            ORDER BY query_id, rank
        """,
        "embedding_dedup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
            ORDER BY vec_a, vec_b
        """,
        "media_features": """
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   1 + CAST(octet_length(encode(text)) AS BIGINT) // 512 AS n_frames
            FROM documents ORDER BY doc_id
        """,
    }
