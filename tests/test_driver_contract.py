"""Driver-contract shape guards (no Ray work): the correctness gate
records only the FIRST 50 ``queries()`` entries, so every one of those
slots must carry a SQL oracle — a reordering or an oracle-less insert
in the head silently downgrades a recorded row to rows-only.  The
oracle-export side effect is stubbed out; only dict keys are checked.
"""

import sys


def _entry_module(monkeypatch):
    import __ray_entry__ as e

    monkeypatch.setattr(e, "_ensure_oracle_exports", lambda: None)
    return e


def test_first_50_queries_are_oracle_backed(monkeypatch):
    e = _entry_module(monkeypatch)
    q = list(e.queries().keys())
    oracles = set(e.oracle_sql().keys())
    assert len(q) >= 50
    missing = [k for k in q[:50] if k not in oracles]
    assert not missing, (
        f"queries() slots within the driver's 50-row recording window "
        f"lack oracle_sql entries: {missing}"
    )


def test_oracle_tail_rotated_into_window(monkeypatch):
    """Rotation policy: oracle-backed queries that sat past the
    driver's 50-row recording window last round rotate INTO it, so
    the next CORRECTNESS_r{N} hard-gates them; the displaced entries
    must have been driver-green two consecutive rounds.  Round-5 set
    (VERDICT r4 'Next round' #2) plus the round-4 rotation, whose
    members have been in-window only one recorded round and so must
    stay."""
    e = _entry_module(monkeypatch)
    head = set(list(e.queries().keys())[:50])
    rotated_in_r5 = {
        "cumulative_revenue", "revenue_rollup", "top_users_per_window",
        "search_docs_text", "filter_chain_events", "window_counts",
        "sessionize",
    }
    rotated_in_r4 = {
        "snapshot_dedup", "similarity_join", "group_topk",
        "top_terms_per_doc", "doc_length_quantiles",
        "streaming_window_counts", "streaming_sessionize",
        "crawl_diff", "recrawl_priority", "triangle_counts_pages",
        "search_url", "search_html",
    }
    missing = sorted((rotated_in_r5 | rotated_in_r4) - head)
    assert not missing, (
        f"tail oracle queries fell back out of the driver's "
        f"50-row window: {missing}"
    )


def test_every_oracle_has_a_query(monkeypatch):
    e = _entry_module(monkeypatch)
    q = set(e.queries().keys())
    orphans = [k for k in e.oracle_sql() if k not in q]
    assert not orphans, f"oracle_sql entries without queries(): {orphans}"


def test_query_names_unique_and_nonempty(monkeypatch):
    e = _entry_module(monkeypatch)
    q = list(e.queries().keys())
    assert len(q) == len(set(q))
    assert all(isinstance(k, str) and k for k in q)
    assert "__ray_entry__" in sys.modules
