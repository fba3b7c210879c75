"""Corpus-curation operators over the ``documents`` table — the
second half of a large-scale training-data pipeline, beyond the dedup
family in ``textops.py``: PII redaction, repetition (boilerplate)
statistics, eval-set decontamination, per-source quota sampling, and
fixed-length sequence packing via a distributed prefix sum.

Every operator is a ``map_batches`` transform over zero-copy Arrow
batches; the two keyed ones route slim rows (integers plus, for the
quota sampler, the short source string) through the actor hash
exchange (``state/exchange.py``) — never the document text. Each has a
DuckDB-expressible definition so the driver/pytest value-hash gate can
check it exactly (RE2 kernels on both sides; integer outputs only —
see graft oracle rules on scaled-integer parity).

Scale notes are inline per operator. Broadcast lookups (the eval
n-gram set, the pack bucket offsets) are one ``ray.put`` on the
driver, read once per worker process via ``util.cached_get``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from website_indexer_ray.pipelines.textops import (
    _TOKEN_PAT,
    _count_re,
    _merge_partials_adaptive,
    read_documents,
)
from website_indexer_ray.util import (
    agg_named,
    cached_get,
    collect_table_blocks,
)


def _docs_ds(sf_dir: str, documents: pa.Table | None, columns: list[str]):
    """Dataset over the documents table, or an in-memory override for
    tests that need synthetic content (mirrors simhash_pairs)."""
    if documents is not None:
        return ray.data.from_arrow(documents.select(columns))
    return read_documents(sf_dir, columns=columns)


def _sorted_by(tbl: pa.Table, col: str = "doc_id") -> pa.Table:
    return tbl.take(pc.sort_indices(tbl, sort_keys=[(col, "ascending")]))


# --- PII redaction ---------------------------------------------------
# RE2 patterns, applied in a fixed order (email, then IPv4, then
# phone) so the chained replacements are deterministic and the DuckDB
# oracle (regexp_replace(..., 'g'), same RE2 engine) reproduces them
# byte-for-byte. Counts are taken on the ORIGINAL text on both sides.

PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def _redact_text(text: pa.ChunkedArray | pa.Array):
    """Chained fixed-order PII replacement; shared with curate.py."""
    red = pc.replace_substring_regex(text, PII_EMAIL, "<EMAIL>")
    red = pc.replace_substring_regex(red, PII_IPV4, "<IP>")
    return pc.replace_substring_regex(red, PII_PHONE, "<PHONE>")


def _pii_mapped(sf_dir: str, documents: pa.Table | None = None):
    ds = _docs_ds(sf_dir, documents, ["doc_id", "text"])

    def redact(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        red = _redact_text(text)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pc.cast(red, pa.string()),
                "n_emails": _count_re(text, PII_EMAIL),
                "n_ips": _count_re(text, PII_IPV4),
                "n_phones": _count_re(text, PII_PHONE),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow")


def pii_redact(sf_dir: str, documents: pa.Table | None = None) -> pa.Table:
    """Redact emails / IPv4s / phone numbers and count hits per doc.

    Map-only: no shuffle, streams at any scale. The table form exists
    for the driver query contract; use :func:`pii_redact_write` in a
    real pipeline."""
    from website_indexer_ray.pipelines.textops import _collect_sorted

    return _collect_sorted(_pii_mapped(sf_dir, documents), "doc_id")


def pii_redact_write(sf_dir: str, out_dir: str) -> None:
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(_pii_mapped(sf_dir), out_dir)


# --- repetition (boilerplate) statistics -----------------------------
# Gopher-style repetition signals on word bigrams: how many bigram
# slots a doc has, how many distinct bigrams, and the multiplicity of
# its most-repeated bigram. Tokenization is a plain single-space split
# (string_split(text, ' ') on the oracle side) so both engines see
# identical token lists, empties included.


def _repetition_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id")
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_id": doc_ids,
                "n_bigrams": pa.array([], type=pa.int64()),
                "n_uniq_bigrams": pa.array([], type=pa.int64()),
                "top_bigram_n": pa.array([], type=pa.int64()),
            }
        )
    n_rows = batch.num_rows
    row_of, grams, n_bigrams = _word_ngram_rows(batch.column("text"), 2)
    uniq = np.zeros(n_rows, dtype=np.int64)
    top = np.zeros(n_rows, dtype=np.int64)
    if len(grams):
        pairs = pa.table(
            {"row": pa.array(row_of, type=pa.int64()), "bg": grams}
        )
        per_bg = agg_named(pairs, ["row", "bg"], [("bg", "count")], ["row", "bg", "c"])
        per_row = agg_named(
            per_bg,
            "row",
            [("c", "count"), ("c", "max")],
            ["row", "n_uniq_bigrams", "top_bigram_n"],
        )
        rows = per_row.column("row").to_numpy(zero_copy_only=False)
        uniq[rows] = per_row.column("n_uniq_bigrams").to_numpy(zero_copy_only=False)
        top[rows] = per_row.column("top_bigram_n").to_numpy(zero_copy_only=False)

    return pa.table(
        {
            "doc_id": doc_ids,
            "n_bigrams": pa.array(n_bigrams, type=pa.int64()),
            "n_uniq_bigrams": pa.array(uniq, type=pa.int64()),
            "top_bigram_n": pa.array(top, type=pa.int64()),
        }
    )


def repetition_stats(sf_dir: str, documents: pa.Table | None = None) -> pa.Table:
    """Per-doc bigram repetition counts (boilerplate / low-quality
    signal). Map-only and fully vectorized: the bigram build is two
    shifted slices of the flattened token buffer joined element-wise,
    and the per-doc aggregation is Arrow ``group_by`` inside the
    batch — no shuffle, because every bigram lives within one doc."""
    from website_indexer_ray.pipelines.textops import _collect_sorted

    ds = _docs_ds(sf_dir, documents, ["doc_id", "text"])
    return _collect_sorted(
        ds.map_batches(_repetition_batch, batch_format="pyarrow"), "doc_id"
    )


def repetition_stats_write(sf_dir: str, out_dir: str) -> None:
    """Sink form of :func:`repetition_stats` (output is O(corpus))."""
    from website_indexer_ray.util import committed_parquet_write

    ds = _docs_ds(sf_dir, None, ["doc_id", "text"])
    committed_parquet_write(
        ds.map_batches(_repetition_batch, batch_format="pyarrow"), out_dir
    )


# --- eval-set decontamination ----------------------------------------
# Standard pretraining hygiene: count each training doc's distinct
# word 5-grams that collide with a benchmark ("eval") set. The eval
# set here is the deterministic stand-in doc_id % 101 == 0 (the
# operator takes any eval table at the API level); its distinct grams
# broadcast once via ray.put — at real scale an eval suite is a few
# MB of n-grams, the textbook broadcast-small-side case.

_EVAL_MOD = 101
DECON_N = 5


def _word_ngram_rows(
    text: pa.ChunkedArray | pa.Array, n: int
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized word n-gram build over a whole column: split once,
    then join n shifted slices of the flattened token buffer
    element-wise. Returns (parent row of each gram, gram strings,
    per-row gram-slot counts); grams never straddle rows."""
    return _ngram_rows_from_tokens(pc.split_pattern(text, " "), n)


def _ngram_rows_from_tokens(
    toks, n: int
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Core of :func:`_word_ngram_rows` over an already-split
    ``list<string>`` column (callers pick the tokenizer: single-space
    for pre-normalized text, ``utf8_split_whitespace`` for raw)."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = offsets[1:] - offsets[:-1]
    n_slots = np.maximum(lens - (n - 1), 0)
    total = int(offsets[-1] - offsets[0])
    if total < n or int(n_slots.sum()) == 0:
        return (
            np.empty(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            n_slots,
        )
    base = int(offsets[0])
    parts = [
        pc.cast(flat.slice(base + i, total - (n - 1)), pa.string())
        for i in range(n)
    ]
    grams = pc.binary_join_element_wise(*parts, " ")
    pos = np.arange(total - (n - 1), dtype=np.int64) + base
    row_of = np.searchsorted(offsets[1:], pos, side="right")
    keep = (pos + n - 1) < offsets[row_of + 1]
    return (
        row_of[keep],
        grams.take(pa.array(np.flatnonzero(keep))),
        n_slots,
    )


def _eval_overlap_counts(
    text: pa.ChunkedArray | pa.Array, ev_set: pa.Array, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per row: (n-gram slot count, DISTINCT grams hitting ev_set).
    One vectorized gram build + one ``pc.is_in`` + one in-batch
    ``group_by(count_distinct)``. Shared with curate.py's
    decontamination mask."""
    row_of, grams, n_slots = _word_ngram_rows(text, n)
    overlap = np.zeros(len(n_slots), dtype=np.int64)
    if len(grams) and len(ev_set):
        hit = pc.is_in(grams, value_set=ev_set).to_numpy(zero_copy_only=False)
        if hit.any():
            idx = np.flatnonzero(hit)
            pairs = pa.table(
                {
                    "row": pa.array(row_of[idx], type=pa.int64()),
                    "g": grams.take(pa.array(idx)),
                }
            )
            per_row = agg_named(
                pairs, "row", [("g", "count_distinct")], ["row", "c"]
            )
            overlap[per_row.column("row").to_numpy(zero_copy_only=False)] = (
                per_row.column("c").to_numpy(zero_copy_only=False)
            )
    return n_slots, overlap


def decontaminate(
    sf_dir: str,
    n: int = DECON_N,
    documents: pa.Table | None = None,
    eval_documents: pa.Table | None = None,
) -> pa.Table:
    """Per non-eval doc: total 5-gram slots and how many DISTINCT
    grams hit the eval set. Output is integer-only for hash parity.

    Fully vectorized: grams are built by joining shifted slices of
    the flattened token buffer, membership is one ``pc.is_in``
    against the broadcast eval-gram array (exact strings — no hash
    false positives), and per-doc distinct-hit counts come from
    Arrow ``group_by(count_distinct)`` inside the batch."""
    from website_indexer_ray.pipelines.textops import _collect_sorted

    return _collect_sorted(
        _decontaminate_mapped(sf_dir, n, documents, eval_documents), "doc_id"
    )


def _decontaminate_mapped(
    sf_dir: str,
    n: int = DECON_N,
    documents: pa.Table | None = None,
    eval_documents: pa.Table | None = None,
):
    ds = _docs_ds(sf_dir, documents, ["doc_id", "text"])

    def _is_eval(batch: pa.Table) -> np.ndarray:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return (ids % _EVAL_MOD) == 0

    if eval_documents is None:
        ev = ds.map_batches(
            lambda b: b.filter(pa.array(_is_eval(b))), batch_format="pyarrow"
        )
        ev_tbl = pa.concat_tables(collect_table_blocks(ev))
    else:
        ev_tbl = eval_documents
    _, ev_grams, _ = _word_ngram_rows(ev_tbl.column("text"), n)
    grams_ref = ray.put(pc.unique(ev_grams))

    def score(batch: pa.Table) -> pa.Table:
        ev_set = cached_get(grams_ref)
        batch = batch.filter(pa.array(~_is_eval(batch)))
        n_slots, overlap = _eval_overlap_counts(batch.column("text"), ev_set, n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(n_slots, type=pa.int64()),
                "n_overlap": pa.array(overlap, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def decontaminate_write(sf_dir: str, out_dir: str, n: int = DECON_N) -> None:
    """Sink form: per-doc overlap counts stream to partitioned parquet
    under the commit protocol — nothing O(corpus) driver-side."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(_decontaminate_mapped(sf_dir, n), out_dir)


# --- per-source quota sampling ----------------------------------------
# Domain balancing: keep at most k docs per source (deterministic —
# the k smallest doc_ids). Slim (doc_id, source) rows route through
# the exchange hashed on the source (a short domain string rides
# along so grouping is EXACT — a hash collision may co-locate two
# sources in one partition but never merges their quotas); the
# reducer resolves every source in its partition with one lexsort +
# run-length pass, no per-group Python.

QUOTA_K = 15


def _quota_resolve(k: int, t: pa.Table) -> pa.Table:
    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    # dictionary-encode within the partition: integer codes identify
    # the exact source strings, collision-free, sortable by numpy
    src_col = t.column("source")
    if isinstance(src_col, pa.ChunkedArray):
        src_col = src_col.combine_chunks()
    src = pc.dictionary_encode(src_col).indices.to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    order = np.lexsort((doc, src))
    src_s, doc_s = src[order], doc[order]
    first = np.ones(len(src_s), dtype=bool)
    first[1:] = src_s[1:] != src_s[:-1]
    starts = np.flatnonzero(first)
    run_id = np.cumsum(first) - 1
    pos_in_grp = np.arange(len(src_s), dtype=np.int64) - starts[run_id]
    keep = pos_in_grp < k
    return pa.table({"doc_id": pa.array(doc_s[keep], type=pa.int64())})


def group_quota_sample(
    sf_dir: str, k: int = QUOTA_K, documents: pa.Table | None = None
) -> pa.Table:
    """Keep the k lowest doc_ids per source. Scale: source cardinality
    is what must fit the reducer fleet, not doc count — the exchange
    routes ~24-byte rows and each partition owns whole sources. A
    top-k-per-batch partial pass would bound routed rows to k per
    (source, batch); at sf scale the slim rows are already tiny."""
    from zlib import crc32

    ds = _docs_ds(sf_dir, documents, ["doc_id", "source"])

    def key_rows(batch: pa.Table) -> pa.Table:
        # hash only the few UNIQUE sources in the batch, then fan the
        # codes back out — the routing key; grouping uses the string
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        uniq_hash = np.fromiter(
            (crc32(s.encode()) & 0x7FFFFFFF for s in enc.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(enc.dictionary),
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": src,
                "src_hash": pa.array(uniq_hash[codes], type=pa.int64()),
            }
        )

    from functools import partial

    from website_indexer_ray.state.exchange import hash_exchange

    keyed = ds.map_batches(key_rows, batch_format="pyarrow")
    out = hash_exchange(keyed, "src_hash", partial(_quota_resolve, k))
    if out is None:
        return pa.schema([("doc_id", pa.int64())]).empty_table()
    return _sorted_by(out)


# --- ranked per-group selection (top-k by quality) --------------------
# The quality-ranked sibling of group_quota_sample: keep the k BEST
# docs per source (n_chars descending, doc_id ascending tie-break) —
# the "best docs per domain" pass of a curation pipeline. Unlike the
# quota sampler, a per-batch partial top-k runs BEFORE routing, so the
# exchange ships at most k rows per (source, batch) however large a
# hot source is: routed volume is bounded by k × sources × batches,
# independent of doc count.


def _topk_indices(
    src: np.ndarray, n: np.ndarray, doc: np.ndarray, k: int
) -> np.ndarray:
    """Indices (original order) of the top-k rows per src code,
    ranked n desc then doc asc. One lexsort — no per-group Python."""
    order = np.lexsort((doc, -n, src))
    src_s = src[order]
    first = np.ones(len(src_s), dtype=bool)
    first[1:] = src_s[1:] != src_s[:-1]
    starts = np.flatnonzero(first)
    run_id = np.cumsum(first) - 1
    pos_in_grp = np.arange(len(src_s), dtype=np.int64) - starts[run_id]
    return order[pos_in_grp < k]


def _src_codes(src_col) -> tuple[np.ndarray, list[str]]:
    if isinstance(src_col, pa.ChunkedArray):
        src_col = src_col.combine_chunks()
    enc = pc.dictionary_encode(src_col)
    return (
        enc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        enc.dictionary.to_pylist(),
    )


def _topk_resolve(k: int, t: pa.Table) -> pa.Table:
    codes, _ = _src_codes(t.column("source"))
    idx = _topk_indices(
        codes,
        t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64),
        t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
        k,
    )
    return pa.table(
        {"doc_id": t.column("doc_id").take(pa.array(np.sort(idx)))}
    )


def group_topk(
    sf_dir: str, k: int = QUOTA_K, documents: pa.Table | None = None
) -> pa.Table:
    """doc_ids of the k longest docs per source (ties → lowest
    doc_id), doc_id-sorted. Oracle: row_number() window."""
    from zlib import crc32

    ds = _docs_ds(sf_dir, documents, ["doc_id", "source", "n_chars"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        codes, words = _src_codes(batch.column("source"))
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        idx = np.sort(_topk_indices(codes, n, doc, k))
        uniq_hash = np.fromiter(
            (crc32(s.encode()) & 0x7FFFFFFF for s in words),
            dtype=np.int64,
            count=len(words),
        )
        kept = batch.select(["doc_id", "source", "n_chars"]).take(
            pa.array(idx)
        )
        return kept.append_column(
            "src_hash", pa.array(uniq_hash[codes[idx]], type=pa.int64())
        )

    from functools import partial

    from website_indexer_ray.state.exchange import hash_exchange

    keyed = ds.map_batches(partial_topk, batch_format="pyarrow")
    out = hash_exchange(keyed, "src_hash", partial(_topk_resolve, k))
    if out is None:
        return pa.schema([("doc_id", pa.int64())]).empty_table()
    return _sorted_by(out)


# --- text normalization ----------------------------------------------
# Canonical cleanup pass before hashing/dedup: lowercase, collapse
# whitespace runs, trim. RE2 '\s+' on both sides; before/after char
# counts ride along as integer quality signals.


def _normalize_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    # trim spaces only (after the collapse any edge run IS one space);
    # utf8_trim_whitespace would also strip unicode spaces, which
    # DuckDB's trim() does not — keep the two engines byte-identical
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " "),
        characters=" ",
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text": pc.cast(norm, pa.string()),
            "n_chars_raw": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
        }
    )


def text_normalize(sf_dir: str, documents: pa.Table | None = None) -> pa.Table:
    """Lowercase + whitespace-collapse + trim each doc. Map-only —
    streams at any scale; table form exists for the gate contract."""
    from website_indexer_ray.pipelines.textops import _collect_sorted

    ds = _docs_ds(sf_dir, documents, ["doc_id", "text"])
    return _collect_sorted(
        ds.map_batches(_normalize_batch, batch_format="pyarrow"), "doc_id"
    )


def text_normalize_write(sf_dir: str, out_dir: str) -> None:
    from website_indexer_ray.util import committed_parquet_write

    ds = _docs_ds(sf_dir, None, ["doc_id", "text"])
    committed_parquet_write(
        ds.map_batches(_normalize_batch, batch_format="pyarrow"), out_dir
    )


# --- weighted per-source mix sampling --------------------------------
# Corpus mixing: each source gets a deterministic keep-rate and each
# doc an independent deterministic coin — a Knuth multiplicative hash
# of doc_id mod 100 — so the sample is reproducible, shuffle-free and
# embarrassingly parallel. The rate function here is a stand-in
# (20/40/60/80 % by source-name length mod 4, SQL-expressible); the
# operator takes any per-source rate map at the API level and
# broadcasts it once.

_MIX_MULT = 2654435761  # Knuth 2^32 golden-ratio multiplier


def source_mix_sample(
    sf_dir: str,
    rates: dict[str, int] | None = None,
    documents: pa.Table | None = None,
) -> pa.Table:
    """Keep each doc with its source's percentage rate, decided by a
    deterministic per-doc hash coin. Output: kept (doc_id, rate)."""
    from website_indexer_ray.pipelines.textops import _collect_sorted

    ds = _docs_ds(sf_dir, documents, ["doc_id", "source"])
    rates_ref = ray.put(rates) if rates is not None else None

    def keep(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if rates_ref is not None:
            rmap = cached_get(rates_ref)
            enc = pc.dictionary_encode(src)
            uniq = np.fromiter(
                (int(rmap.get(s, 100)) for s in enc.dictionary.to_pylist()),
                dtype=np.int64,
                count=len(enc.dictionary),
            )
            rate = uniq[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            lens = pc.utf8_length(src).to_numpy(zero_copy_only=False)
            rate = 20 * (1 + lens % 4)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        coin = (ids * np.uint64(_MIX_MULT)) % np.uint64(2**32) % np.uint64(100)
        mask = coin < rate.astype(np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(mask)),
                "rate": pa.array(rate[mask], type=pa.int64()),
            }
        )

    return _collect_sorted(
        ds.map_batches(keep, batch_format="pyarrow"), "doc_id"
    )


# --- deterministic global shuffle into training shards ----------------
# The last step before a training run: assign every doc a pseudo-random
# shard and a position within it, reproducibly. The shuffle key is the
# same multiplicative hash (uncorrelated with doc_id order); shard =
# key % n_shards, position = rank of (key, doc_id) within the shard.
# Slim (doc_id, key, shard) rows route through the exchange keyed on
# shard; each partition ranks its shards with one lexsort. Scale: a
# partition holds whole shards (16-byte rows × docs/n_shards each) —
# pick n_shards ≥ corpus_rows × 16 B / reducer_heap; at 10⁹ docs and
# 1024 shards that is ~16 MB per shard. A writer stage can then emit
# shard files independently, resumable per shard.

SHUFFLE_SHARDS = 8


def _shuffle_resolve(t: pa.Table) -> pa.Table:
    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    key = t.column("skey").to_numpy(zero_copy_only=False).astype(np.int64)
    shard = t.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((doc, key, shard))
    doc_s, key_s, shard_s = doc[order], key[order], shard[order]
    first = np.ones(len(shard_s), dtype=bool)
    first[1:] = shard_s[1:] != shard_s[:-1]
    starts = np.flatnonzero(first)
    run_id = np.cumsum(first) - 1
    pos = np.arange(len(shard_s), dtype=np.int64) - starts[run_id]
    return pa.table(
        {
            "doc_id": pa.array(doc_s, type=pa.int64()),
            "shard": pa.array(shard_s, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
            "skey": pa.array(key_s, type=pa.int64()),
        }
    )


def shuffle_shards(
    sf_dir: str,
    n_shards: int = SHUFFLE_SHARDS,
    documents: pa.Table | None = None,
) -> pa.Table:
    ds = _docs_ds(sf_dir, documents, ["doc_id"])

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (ids * np.uint64(_MIX_MULT)) % np.uint64(2**32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "skey": pa.array(key.astype(np.int64), type=pa.int64()),
                "shard": pa.array(
                    (key % np.uint64(n_shards)).astype(np.int64), type=pa.int64()
                ),
            }
        )

    from website_indexer_ray.state.exchange import hash_exchange

    keyed = ds.map_batches(key_rows, batch_format="pyarrow")
    out = hash_exchange(keyed, "shard", _shuffle_resolve)
    if out is None:
        return pa.schema(
            [
                ("doc_id", pa.int64()),
                ("shard", pa.int64()),
                ("pos", pa.int64()),
                ("skey", pa.int64()),
            ]
        ).empty_table()
    return _sorted_by(out)


def shuffle_shards_write(
    sf_dir: str, out_dir: str, n_shards: int = SHUFFLE_SHARDS
) -> None:
    """Sink form: lands each training shard as ONE pos-ordered parquet
    file, nothing O(docs) on the driver. ``n_reducers=n_shards`` makes
    every exchange partition exactly one shard (partition p owns
    shard p), and the resolve body's lexsort already emits rows in
    position order — the file IS the shard, ready for a sequential
    trainer read. Commits a ``_SUCCESS`` manifest; a resumed run
    skips the whole write."""
    from website_indexer_ray.state.exchange import hash_exchange, sink_committed

    if sink_committed(out_dir):
        return
    ds = _docs_ds(sf_dir, None, ["doc_id"])

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (ids * np.uint64(_MIX_MULT)) % np.uint64(2**32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "skey": pa.array(key.astype(np.int64), type=pa.int64()),
                "shard": pa.array(
                    (key % np.uint64(n_shards)).astype(np.int64), type=pa.int64()
                ),
            }
        )

    hash_exchange(
        ds.map_batches(key_rows, batch_format="pyarrow"),
        "shard",
        _shuffle_resolve,
        n_reducers=n_shards,
        sink_dir=out_dir,
    )


# --- sequence packing (distributed prefix sum) ------------------------
# GPT-style packing: concatenate every doc's tokens in doc_id order
# and cut the stream every ``seq_len`` tokens. Each doc's placement is
# a pure function of the EXCLUSIVE prefix sum of token counts — the
# classic three-step distributed scan:
#   1. one pass computes slim (doc_id, n_tokens, bucket) rows
#      (bucket = doc_id // bucket_width) and per-bucket partial sums;
#   2. the driver scans the tiny per-bucket totals (O(docs/width) —
#      244k rows at 10^9 docs) into exclusive bucket offsets,
#      broadcast once;
#   3. a bucket-keyed exchange resolves every doc vectorized: argsort
#      by doc_id, within-bucket cumsum, plus its bucket's offset.
# Nothing O(docs) ever sits on the driver except the contract-imposed
# table return; the slim counts dataset is materialized once so the
# text is read (and the regex run) exactly once.

PACK_SEQ_LEN = 512
_PACK_BUCKET_WIDTH = 64


def _pack_resolve(seq_len: int, offsets_ref, t: pa.Table) -> pa.Table:
    buckets, excl = cached_get(offsets_ref)
    doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
    b = t.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(doc, kind="stable")  # doc_id unique ⇒ total order
    doc, n, b = doc[order], n[order], b[order]
    local_start = np.cumsum(n) - n
    first = np.ones(len(b), dtype=bool)
    first[1:] = b[1:] != b[:-1]
    run_lengths = np.diff(np.append(np.flatnonzero(first), len(b)))
    base = np.repeat(local_start[first], run_lengths)
    start = excl[np.searchsorted(buckets, b)] + (local_start - base)
    span = np.maximum(n, 1)  # empty docs occupy their start pack
    return pa.table(
        {
            "doc_id": pa.array(doc, type=pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
            "start_tok": pa.array(start, type=pa.int64()),
            "pack_first": pa.array(start // seq_len, type=pa.int64()),
            "pack_last": pa.array((start + span - 1) // seq_len, type=pa.int64()),
            "pack_offset": pa.array(start % seq_len, type=pa.int64()),
        }
    )


def seq_pack(
    sf_dir: str,
    seq_len: int = PACK_SEQ_LEN,
    bucket_width: int = _PACK_BUCKET_WIDTH,
    documents: pa.Table | None = None,
) -> pa.Table:
    out = _seq_pack_exchange(sf_dir, seq_len, bucket_width, documents)
    if out is None:
        return pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("start_tok", pa.int64()),
                ("pack_first", pa.int64()),
                ("pack_last", pa.int64()),
                ("pack_offset", pa.int64()),
            ]
        ).empty_table()
    return _sorted_by(out)


def seq_pack_write(
    sf_dir: str,
    out_dir: str,
    seq_len: int = PACK_SEQ_LEN,
    bucket_width: int = _PACK_BUCKET_WIDTH,
) -> None:
    """Sink form of ``seq_pack``: the placement exchange lands one
    parquet file per partition under ``out_dir`` (committed
    ``_SUCCESS``) — the packing table is O(docs), so at corpus scale
    it must never concatenate on the driver; the table form above
    stays the driver/query-contract form."""
    from website_indexer_ray.state.exchange import sink_committed

    if sink_committed(out_dir):
        return
    _seq_pack_exchange(sf_dir, seq_len, bucket_width, None, sink_dir=out_dir)


def _seq_pack_exchange(
    sf_dir: str,
    seq_len: int,
    bucket_width: int,
    documents: pa.Table | None,
    sink_dir: str | None = None,
):
    ds = _docs_ds(sf_dir, documents, ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        n = _count_re(batch.column("text"), _TOKEN_PAT)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n,
                "bucket": pc.divide(batch.column("doc_id"), bucket_width),
            }
        )

    slim = ds.map_batches(counts, batch_format="pyarrow").materialize()

    def bucket_sum(t: pa.Table) -> pa.Table:
        """(bucket, total) -> per-bucket sums; idempotent, so it serves
        as both the exchange reduce fn and the final driver merge."""
        return agg_named(
            t.select(["bucket", "total"]),
            "bucket",
            [("total", "sum")],
            ["bucket", "total"],
        )

    partials = slim.map_batches(
        lambda b: bucket_sum(
            pa.table({"bucket": b.column("bucket"), "total": b.column("n_tokens")})
        ),
        batch_format="pyarrow",
    )
    merged = bucket_sum(_merge_partials_adaptive(partials, "bucket", bucket_sum))
    merged = _sorted_by(merged, "bucket")
    buckets = merged.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
    totals = merged.column("total").to_numpy(zero_copy_only=False).astype(np.int64)
    excl = np.cumsum(totals) - totals
    offsets_ref = ray.put((buckets, excl))

    from functools import partial

    from website_indexer_ray.state.exchange import hash_exchange

    return hash_exchange(
        slim,
        "bucket",
        partial(_pack_resolve, seq_len, offsets_ref),
        sink_dir=sink_dir,
    )


# --- LM perplexity scoring (CCNet-style quality signal) ---------------
# Score every document by its perplexity under an order-2 byte-level
# language model trained on the corpus itself (CCNet scores against a
# held-out reference corpus; pass ``train_documents`` for that). Two
# streaming passes:
#   1. train: each batch folds its text bytes into bigram counts with
#      one ``np.bincount`` and emits only the NONZERO (cell, cnt)
#      rows — a few-KB partial per batch regardless of batch size;
#      partials merge through the adaptive driver/exchange path (cell
#      domain is fixed at 256^2, so the merged model is always tiny).
#   2. score: the add-one-smoothed log2-prob table (65,536 float64 =
#      512 KB) broadcasts once via ray.put; each batch walks its
#      concatenated UTF-8 buffer with one fancy-index gather and one
#      ``np.add.reduceat`` per-doc reduction — cross-doc boundary
#      transitions are masked out, so a doc's score is independent of
#      which batch it lands in (deterministic under any partitioning).
# ppl = 2 ** (-mean log2 P(b_i | b_{i-1})); docs with fewer than two
# bytes have no transitions and score null. No SQL oracle (DuckDB has
# no per-byte scan) — the pytest gate compares against a naive
# per-doc Python reference and pins batching-independence.

_LM_CELLS = 256 * 256


def _text_bytes_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """(bytes, offsets) view of a string column: one uint8 array of
    every doc's UTF-8 bytes plus int64 doc offsets into it. Zero-copy
    from the Arrow buffers (modulo the null fill and a large_string
    upcast)."""
    a = pc.fill_null(col, "")
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    a = a.cast(pa.large_string())
    raw_offs = np.frombuffer(a.buffers()[1], dtype=np.int64)
    offs = raw_offs[a.offset : a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    buf = data[offs[0] : offs[-1]]
    return buf, (offs - offs[0]).astype(np.int64)


def _bigram_ids(buf: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Within-doc byte-bigram cell ids for a concatenated buffer, plus
    per-doc transition counts. Transitions that straddle a doc
    boundary are dropped."""
    n_trans = np.maximum(np.diff(offs) - 1, 0)
    if len(buf) < 2:
        return np.empty(0, dtype=np.int32), n_trans
    ids = buf[:-1].astype(np.int32) * 256 + buf[1:]
    # position p is a real transition iff p+1 is not a doc start
    is_start = np.zeros(len(buf) + 1, dtype=bool)
    is_start[offs] = True
    return ids[~is_start[1 : len(buf)]], n_trans


def _lm_model(sf_dir: str, documents: pa.Table | None):
    """Train the bigram model; returns the dense log2-prob table."""
    ds = _docs_ds(sf_dir, documents, ["text"])

    def count_batch(batch: pa.Table) -> pa.Table:
        buf, offs = _text_bytes_offsets(batch.column("text"))
        ids, _ = _bigram_ids(buf, offs)
        counts = np.bincount(ids, minlength=_LM_CELLS)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64), type=pa.int64()),
                "cnt": pa.array(counts[nz].astype(np.int64), type=pa.int64()),
            }
        )

    def cell_sum(t: pa.Table) -> pa.Table:
        return agg_named(
            t.select(["cell", "cnt"]), "cell", [("cnt", "sum")], ["cell", "cnt"]
        )

    from website_indexer_ray.pipelines.textops import _merge_partials_adaptive

    merged = cell_sum(
        _merge_partials_adaptive(
            ds.map_batches(count_batch, batch_format="pyarrow"), "cell", cell_sum
        )
    )
    dense = np.zeros(_LM_CELLS, dtype=np.int64)
    dense[merged.column("cell").to_numpy(zero_copy_only=False)] = merged.column(
        "cnt"
    ).to_numpy(zero_copy_only=False)
    row_tot = dense.reshape(256, 256).sum(axis=1)
    logp = np.log2(dense + 1.0) - np.repeat(np.log2(row_tot + 256.0), 256)
    return logp


def _ppl_scores(col, logp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n_trans, ppl) per doc of a text column under a trained model;
    docs without transitions score NaN."""
    buf, offs = _text_bytes_offsets(col)
    ids, n_trans = _bigram_ids(buf, offs)
    sums = np.zeros(len(n_trans), dtype=np.float64)
    nz = n_trans > 0
    if ids.size:
        starts = (np.cumsum(n_trans) - n_trans)[nz]
        sums[nz] = np.add.reduceat(logp[ids], starts)
    return n_trans, np.where(nz, np.exp2(-sums / np.maximum(n_trans, 1)), np.nan)


def _ppl_mapped(sf_dir: str, documents: pa.Table | None, logp_ref):
    ds = _docs_ds(sf_dir, documents, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        n_trans, ppl = _ppl_scores(batch.column("text"), cached_get(logp_ref))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_trans": pa.array(n_trans, type=pa.int64()),
                "ppl": pa.array(ppl, type=pa.float64(), from_pandas=True),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def lm_perplexity(
    sf_dir: str,
    documents: pa.Table | None = None,
    train_documents: pa.Table | None = None,
) -> pa.Table:
    """Per-doc byte-bigram perplexity (doc_id, n_trans, ppl). The
    table form exists for the driver query contract; use
    :func:`lm_perplexity_write` in a real pipeline."""
    logp_ref = ray.put(
        _lm_model(sf_dir, train_documents if train_documents is not None else documents)
    )
    from website_indexer_ray.pipelines.textops import _collect_sorted

    return _collect_sorted(_ppl_mapped(sf_dir, documents, logp_ref), "doc_id")


def lm_perplexity_write(
    sf_dir: str, out_dir: str, train_documents: pa.Table | None = None
) -> None:
    from website_indexer_ray.util import committed_parquet_write

    logp_ref = ray.put(_lm_model(sf_dir, train_documents))
    committed_parquet_write(_ppl_mapped(sf_dir, None, logp_ref), out_dir)


# --- DSIR-style importance sampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling") ---------------------
#
# Select raw docs whose hashed-n-gram distribution looks like a TARGET
# corpus: fit bag-of-hashed-ngram (unigram + bigram, xxh64 % m
# buckets) unigram models for target p and raw q, score every raw doc
# with log w(x) = Σ_b c_b(x)·(log p_b − log q_b), keep the top-n.
#
# Scale shape: the raw bucket counts come off the same sparse-partial
# + adaptive-merge path as vocab_top_tokens (per-batch Counter rows,
# keyed exchange when partials explode); the m-vector log-ratio (64 KB
# at m=8192) broadcasts once; scoring is one streaming pass emitting
# per-batch top-n partials, so only O(batches·n) slim rows reach the
# driver. The target set is eval-sized by assumption (driver table).
# Weights are emitted as integer micro-units (round(1e6·logw)) so the
# output is hash-stable across float environments.

_DSIR_BUCKETS = 8192
# odd 64-bit multiplier for the bigram combine (feature hashing WANTS
# controlled collisions into m buckets, so C-fast crc32 per token plus
# one vectorized multiply-add per bigram replaces the first version's
# per-feature pure-Python 64-bit hash — the exact hot spot the
# dup-span op measured at 3.3x total wall and vectorized away)
_DSIR_BIGRAM_B = np.uint64(0x9E3779B185EBCA87)


def _dsir_buckets_of(text: str, m: int) -> np.ndarray:
    """Hashed unigram+bigram bucket ids for one doc (lowercased)."""
    import re as _re
    from zlib import crc32

    toks = _re.findall(r"[a-z0-9]+", text.lower())
    if not toks:
        return np.empty(0, dtype=np.int64)
    th = np.array([crc32(t.encode()) for t in toks], dtype=np.uint64)
    mm = np.uint64(m)
    uni = th % mm
    if len(th) > 1:
        bi = (th[:-1] * _DSIR_BIGRAM_B + th[1:]) % mm
        return np.concatenate([uni, bi]).astype(np.int64)
    return uni.astype(np.int64)


def _dsir_batch_buckets(text_col, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, parent_doc_index) feature arrays for a whole text
    column — the vectorized form of `_dsir_buckets_of` per doc
    (identical features: hashed unigrams + within-doc bigrams), with
    no per-document Python: _token_runs tokenization, crc32 only per
    DISTINCT token via dictionary_encode, one vectorized multiply-add
    for the bigrams (pairs valid where consecutive tokens share a
    doc)."""
    from zlib import crc32 as _crc32

    from website_indexer_ray.pipelines.textops import _token_runs

    toks, parent = _token_runs(text_col)
    if not len(toks):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    enc = toks.dictionary_encode()
    words = enc.dictionary.to_pylist()
    dh = np.fromiter(
        (_crc32(w.encode()) for w in words), dtype=np.uint64, count=len(words)
    )
    th = dh[enc.indices.to_numpy(zero_copy_only=False)]
    mm = np.uint64(m)
    uni = (th % mm).astype(np.int64)
    same = parent[1:] == parent[:-1]
    bi = ((th[:-1] * _DSIR_BIGRAM_B + th[1:]) % mm).astype(np.int64)[same]
    return (
        np.concatenate([uni, bi]),
        np.concatenate([parent, parent[:-1][same]]),
    )


def _dsir_counts_table(tbl: pa.Table, m: int) -> np.ndarray:
    """Dense m-vector of bucket counts for a driver-resident table."""
    b, _ = _dsir_batch_buckets(tbl.column("text"), m)
    return (
        np.bincount(b, minlength=m).astype(np.int64)
        if len(b)
        else np.zeros(m, dtype=np.int64)
    )


def _dsir_corpus_counts(ds, m: int) -> np.ndarray:
    """Dense m-vector for a Dataset via sparse (bucket, n) partials +
    the adaptive merge (driver concat while small, bucket-keyed actor
    exchange when partials explode)."""
    from website_indexer_ray.pipelines.textops import (
        _merge_partials_adaptive,
    )

    def partial(batch: pa.Table) -> pa.Table:
        b, _ = _dsir_batch_buckets(batch.column("text"), m)
        v = (
            np.bincount(b, minlength=m).astype(np.int64)
            if len(b)
            else np.zeros(m, dtype=np.int64)
        )
        nz = np.flatnonzero(v)
        return pa.table(
            {
                "bucket": pa.array(nz, type=pa.int64()),
                "n": pa.array(v[nz], type=pa.int64()),
            }
        )

    partials = _merge_partials_adaptive(
        ds.map_batches(partial, batch_format="pyarrow"),
        key="bucket",
        reduce_fn=lambda t: agg_named(
            t, "bucket", [("n", "sum")], ["bucket", "n"]
        ),
    )
    merged = agg_named(partials, "bucket", [("n", "sum")], ["bucket", "n"])
    v = np.zeros(m, dtype=np.int64)
    v[merged.column("bucket").to_numpy(zero_copy_only=False)] = merged.column(
        "n"
    ).to_numpy(zero_copy_only=False)
    return v


def importance_sample(
    sf_dir: str,
    n: int = 100,
    m: int = _DSIR_BUCKETS,
    target_documents: pa.Table | None = None,
    documents: pa.Table | None = None,
) -> pa.Table:
    """Top-n raw docs by DSIR importance log-weight against the target
    distribution — (doc_id, logw_micro), ordered (logw desc, doc_id
    asc). Default target is the ``doc_id % 101 == 0`` stand-in eval
    split (the decontamination stage's convention); those docs are
    excluded from the output. Hashed-feature scoring is approximate by
    construction ⇒ rows-only driver check; topic-separation behavior
    pinned in pytest."""
    ds = _docs_ds(sf_dir, documents, ["doc_id", "text"])

    exclude_target = False
    if target_documents is None:
        exclude_target = True

        def _tgt_filter(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % _EVAL_MOD == 0))

        parts = collect_table_blocks(
            ds.map_batches(_tgt_filter, batch_format="pyarrow")
        )
        target_documents = (
            pa.concat_tables(parts)
            if parts
            else pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )

    tgt = _dsir_counts_table(target_documents, m).astype(np.float64)
    raw = _dsir_corpus_counts(ds, m).astype(np.float64)
    # add-one smoothing per bucket; totals include the smoothing mass
    log_ratio = np.log((tgt + 1.0) / (tgt.sum() + m)) - np.log(
        (raw + 1.0) / (raw.sum() + m)
    )
    ref = ray.put(log_ratio)

    def score_topn(batch: pa.Table) -> pa.Table:
        lr = cached_get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if exclude_target:
            keep = ids % _EVAL_MOD != 0
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
        b, par = _dsir_batch_buckets(batch.column("text"), m)
        w = np.bincount(
            par, weights=lr[b], minlength=batch.num_rows
        ) if len(b) else np.zeros(batch.num_rows, dtype=np.float64)
        micro = np.round(w * 1e6).astype(np.int64)
        order = np.lexsort((ids, -micro))[: min(n, len(ids))]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], type=pa.int64()),
                "logw_micro": pa.array(micro[order], type=pa.int64()),
            }
        )

    partials = collect_table_blocks(
        ds.map_batches(score_topn, batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "logw_micro": pa.array([], type=pa.int64()),
        }
    )
    if not partials:
        return empty
    allp = pa.concat_tables(partials)
    order = pc.sort_indices(
        allp,
        sort_keys=[("logw_micro", "descending"), ("doc_id", "ascending")],
    )
    return allp.take(order.slice(0, n))
