"""Training-data text operators over a ``documents`` table
(doc_id:int64, text:string, lang:string, source:string, n_chars:int64).

Beyond the reference's own operator inventory (SURVEY.md §2), these are
the large-scale-pipeline operators the engine needs as first-class
components: exact + near deduplication (MinHash-LSH, SimHash, n-gram
Jaccard), language-ID, quality scoring, token counting, and document
fingerprinting. All hot paths are ``map_batches`` over Arrow batches;
signatures/partials are computed per batch and only slim derived
columns are shuffled (never the full text, except the one exact-dedup
variant whose oracle requires grouping by the normalized text itself).

Scale notes are given per operator; broadcast lookups use one
``ray.put`` on the driver, read once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

import hashlib
from zlib import crc32

from website_indexer_ray.util import agg_named, read_parquet_parallel

# Hash choices: xxh64 (functions/xxh.py, pure-python reference impl)
# is mandated for URL identity and stays there. Content hashing in the
# dedup family runs millions of times per batch, so it uses C-speed
# primitives: crc32 for shingle/token hashes (only uniformity matters
# — minhash/simhash tolerate 32-bit space) and blake2b-64 for
# whole-document content keys (64-bit, collision-safe at 10^9+ docs
# where crc32 would collide).


def _content_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")

_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")  # BPE-ish: words + punct singles
_WORD_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_STOP_RE = re.compile(r"\b(the|a|and|of|to|in|is)\b")



def read_documents(sf_dir: str, columns=None):
    return read_parquet_parallel(
        f"{sf_dir}/documents.parquet", columns=columns or ["doc_id", "text"]
    )


# --- exact dedup -----------------------------------------------------

def normalize_text(s: str) -> str:
    return _WS_RE.sub(" ", s).strip().lower()


def exact_dedup(sf_dir: str) -> pa.Table:
    """Keep min(doc_id) per normalized-text group.

    Scale path: hash-partition on a 64-bit content hash and reduce to
    min(doc_id) per hash — only (hash, doc_id) pairs shuffle, never the
    text. Oracle: GROUP BY the normalized text itself.
    """
    ds = read_documents(sf_dir)

    def add_hash(batch: pa.Table) -> pa.Table:
        # 63-bit mask keeps the hash in int64 (plays well with every
        # downstream engine's signed-int group keys).
        hashes = [
            _content_hash64(normalize_text(t)) & 0x7FFFFFFFFFFFFFFF
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_hash": pa.array(hashes, type=pa.int64()),
            }
        )

    from website_indexer_ray.util import agg_named

    def min_per_hash(t: pa.Table) -> pa.Table:
        return agg_named(
            t, "text_hash", [("doc_id", "min")], ["text_hash", "doc_id"]
        )

    def partial_min(batch: pa.Table) -> pa.Table:
        return min_per_hash(add_hash(batch))

    partials = ds.map_batches(partial_min, batch_format="pyarrow")
    # Partials are one row per (hash, batch). Adaptive final merge:
    # small partial sets combine on the driver; past the threshold the
    # min-merge runs as a text_hash-keyed hash exchange (each reducer
    # partition owns its hashes, so its local min IS the global min).
    merged = _merge_partials_adaptive(
        partials, key="text_hash", reduce_fn=min_per_hash
    )
    tbl = min_per_hash(merged).select(["doc_id"])
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))


# --- token counting / quality scoring -------------------------------
# Vectorized with Arrow's RE2 kernels (pc.count_substring_regex) —
# the same regex engine the DuckDB oracles run, and no per-row Python.
# The module-level _TOKEN_RE/_WORD_RE/... Python regexes are kept as
# the reference semantics; a pytest pins kernel == re.findall counts
# on the test corpus.

_TOKEN_PAT = r"\w+|[^\w\s]"  # BPE-ish: words + punct singles
_WORD_PAT = r"\S+"
_PUNCT_PAT = r"[^\w\s]"
_STOP_PAT = r"\b(the|a|and|of|to|in|is)\b"


def _count_re(col: pa.ChunkedArray, pat: str) -> pa.ChunkedArray:
    return pc.cast(pc.count_substring_regex(col, pat), pa.int64())


# Complement class of the `[a-z0-9]+` token regex: splitting lowered
# text on it and dropping empties yields EXACTLY re.findall's tokens
# (pinned in pytest), with no per-document Python in the scan task.
_VOCAB_SPLIT_PAT = r"[^a-z0-9]+"

# byte-class LUT for the numpy tokenizer: True for [a-z0-9] bytes
_TOKEN_BYTE_LUT = np.zeros(256, dtype=bool)
_TOKEN_BYTE_LUT[np.frombuffer(b"abcdefghijklmnopqrstuvwxyz0123456789",
                              dtype=np.uint8)] = True


def _token_runs(text_col, lut: "np.ndarray" = None) -> tuple[pa.Array, "np.ndarray"]:
    """(tokens, parent_doc_index) for a text column, with no
    per-document Python — the vectorized form of
    `token_re.findall(t.lower())` per document (scan-task CPU is the
    dominant cost of token work at 100 TB).

    utf8_lower runs as the Arrow kernel; tokenization then runs as
    numpy run-detection directly on the lowered UTF-8 data buffer
    (the hash_strings64 idiom, util.py): after lowering, every
    `[a-z0-9]` character is a single ASCII byte and every non-token
    character consists solely of non-class bytes (UTF-8 multibyte
    sequences never contain ASCII bytes), so maximal `[a-z0-9]` byte
    runs — broken at document offsets — are EXACTLY the regex
    `[a-z0-9]+` findall tokens.  Equality with the per-doc Python
    form is pinned in pytest (corpus + unicode/null/slice edges).

    ``lut`` swaps the token byte class (a 256-bool table; must contain
    only ASCII bytes) — LangIdStage passes the `[a-z']` class."""
    if lut is None:
        lut = _TOKEN_BYTE_LUT
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    empty = pa.array([], type=pa.string())
    n = len(text_col)
    if not n:
        return empty, np.empty(0, dtype=np.int64)
    low = pc.utf8_lower(text_col)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(low.type) else np.int32
    offsets = np.frombuffer(low.buffers()[1], dtype=off_dtype)[
        low.offset : low.offset + n + 1
    ].astype(np.int64)
    lo, hi = int(offsets[0]), int(offsets[-1])
    if hi == lo:
        return empty, np.empty(0, dtype=np.int64)
    seg = np.frombuffer(low.buffers()[2], dtype=np.uint8)[lo:hi]
    is_tok = lut[seg]
    # run starts/ends, with runs force-broken at document boundaries
    # (a token never spans documents)
    prev = np.empty_like(is_tok)
    prev[0] = False
    prev[1:] = is_tok[:-1]
    nxt = np.empty_like(is_tok)
    nxt[-1] = False
    nxt[:-1] = is_tok[1:]
    bnd = offsets[1:-1] - lo  # interior document starts
    inb = bnd[(bnd > 0) & (bnd < len(seg))]
    prev[inb] = False
    nxt[inb - 1] = False
    starts = np.flatnonzero(is_tok & ~prev)
    if not len(starts):
        return empty, np.empty(0, dtype=np.int64)
    ends = np.flatnonzero(is_tok & ~nxt) + 1
    lens = ends - starts
    out_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    # vectorized multi-range gather of the token bytes
    gather = np.repeat(starts - out_off[:-1], lens) + np.arange(
        total, dtype=np.int64
    )
    tok_bytes = seg[gather]
    if total <= 0x7FFFFFFF:
        tok_arr = pa.Array.from_buffers(
            pa.string(), len(lens),
            [None, pa.py_buffer(out_off.astype(np.int32)),
             pa.py_buffer(tok_bytes)],
        )
    else:
        tok_arr = pa.Array.from_buffers(
            pa.large_string(), len(lens),
            [None, pa.py_buffer(out_off), pa.py_buffer(tok_bytes)],
        )
        tok_arr = pc.cast(tok_arr, pa.string())
    # doc i owns byte range [offsets[i]-lo, offsets[i+1]-lo)
    parent = np.searchsorted(offsets[1:] - lo, starts, side="right")
    return tok_arr, parent.astype(np.int64)


def _token_count_table(text_col) -> pa.Table:
    """Per-batch (token, n) counts — the vectorized form of
    `Counter(token_re.findall(t.lower()))` summed over the batch:
    _token_runs tokenization + one Arrow group_by count."""
    from website_indexer_ray.util import agg_named

    tok_arr, _ = _token_runs(text_col)
    if not len(tok_arr):
        return pa.table(
            {"token": pa.array([], type=pa.string()),
             "n": pa.array([], type=pa.int64())}
        )
    t = pa.table({"token": tok_arr})
    return agg_named(t, "token", [([], "count_all")], ["token", "n"])


def _token_count_mapped(sf_dir: str):
    ds = read_documents(sf_dir)

    def count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": _count_re(batch.column("text"), _TOKEN_PAT),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def token_count(sf_dir: str) -> pa.Table:
    return _collect_sorted(_token_count_mapped(sf_dir), "doc_id")


def token_count_write(sf_dir: str, out_dir: str) -> None:
    """Sink form: stream per-doc token counts straight to partitioned
    parquet — no driver concat (the table form exists for the driver
    query contract only). Commit protocol: _SUCCESS manifest, stale
    part files cleared, rerun over a committed dir is a no-op."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(_token_count_mapped(sf_dir), out_dir)


def _quality_score_mapped(sf_dir: str):
    ds = read_documents(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = _count_re(text, _WORD_PAT)
        n_stop = _count_re(text, _STOP_PAT)
        denom = pc.max_element_wise(n_words, pa.scalar(1, type=pa.int64()))
        stop_permille = pc.if_else(
            pc.equal(n_words, 0),
            pa.scalar(0, type=pa.int64()),
            # non-negative ints: Arrow integer divide == Python //
            pc.divide(pc.multiply(n_stop, pa.scalar(1000, type=pa.int64())), denom),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_words": n_words,
                "n_punct": _count_re(text, _PUNCT_PAT),
                "n_stop": n_stop,
                "stop_permille": stop_permille,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def quality_score(sf_dir: str) -> pa.Table:
    """Integer-valued quality signals (length, punctuation, stopword
    density) — integers on purpose so the SQL oracle hashes
    identically (no float-association drift)."""
    return _collect_sorted(_quality_score_mapped(sf_dir), "doc_id")


def quality_score_write(sf_dir: str, out_dir: str) -> None:
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(_quality_score_mapped(sf_dir), out_dir)


# --- language ID (heuristic; no SQL oracle) -------------------------

_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "a", "that", "it", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "no"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
}


class LangIdStage:
    """Stopword-profile n-gram heuristic as an actor-pool stage
    (profiles built once per actor in __init__).  Vectorized: one
    _token_runs pass over the batch's `[a-z']` byte class (EXACTLY
    the old `re.findall(r"[a-zA-Z']+", t.lower())` tokens — pinned
    in pytest), then per-language membership via pc.is_in + a
    bincount scatter per doc; no per-document Python."""

    # byte class for `[a-zA-Z']+` on lowered text: [a-z']
    _WORD_LUT = np.zeros(256, dtype=bool)
    _WORD_LUT[np.frombuffer(b"abcdefghijklmnopqrstuvwxyz'",
                            dtype=np.uint8)] = True

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        # sorted language order = the old max(sorted(scores)) tie-break
        # (argmax returns the first maximum, i.e. lex-smallest lang)
        self.langs = sorted(self.profiles)
        self.profile_arrays = [
            pa.array(sorted(self.profiles[lang]), type=pa.string())
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        toks, parent = _token_runs(batch.column("text"), lut=self._WORD_LUT)
        if len(toks):
            n_words = np.bincount(parent, minlength=n).astype(np.int64)
            scores = np.stack(
                [
                    np.bincount(
                        parent,
                        weights=pc.is_in(toks, value_set=vs)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64),
                        minlength=n,
                    )
                    for vs in self.profile_arrays
                ],
                axis=1,
            ).astype(np.int64)
        else:
            n_words = np.zeros(n, dtype=np.int64)
            scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        best_i = np.argmax(scores, axis=1)
        best = scores[np.arange(n), best_i]
        lang_arr = np.array(self.langs, dtype=object)[best_i]
        lang_arr[best == 0] = "und"
        denom = np.maximum(n_words, 1)
        confs = (1000 * best) // denom
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(lang_arr, type=pa.string()),
                "conf_permille": pa.array(confs, type=pa.int64()),
            }
        )


def _lang_id_mapped(sf_dir: str):
    ds = read_documents(sf_dir)
    return ds.map_batches(LangIdStage(), batch_format="pyarrow")


def lang_id(sf_dir: str) -> pa.Table:
    return _collect_sorted(_lang_id_mapped(sf_dir), "doc_id")


def lang_id_write(sf_dir: str, out_dir: str) -> None:
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(_lang_id_mapped(sf_dir), out_dir)


# --- document fingerprinting (winnowing; no SQL oracle) -------------

def fingerprint(sf_dir: str, k: int = 5, window: int = 4) -> pa.Table:
    """Winnowing fingerprints (Schleimer, Wilkerson, Aiken — MOSS,
    SIGMOD 2003): min rolling k-gram hash per window."""
    return _collect_sorted(_fingerprint_mapped(sf_dir, k, window), "doc_id")


def fingerprint_write(
    sf_dir: str, out_dir: str, k: int = 5, window: int = 4
) -> None:
    """Sink form of :func:`fingerprint` (output is O(corpus))."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(_fingerprint_mapped(sf_dir, k, window), out_dir)


def _fingerprint_mapped(sf_dir: str, k: int = 5, window: int = 4):
    """Vectorized winnowing summary per doc.

    The strided-window picks collapse algebraically: windows
    ``[i, i+window)`` are disjoint, so each contributes exactly one
    distinct argmin index — ``n_fingerprints = ceil(n_grams/window)``
    — and the min over picked values equals the GLOBAL min of the
    gram hashes (min over window-minima).  That turns the per-doc
    Python winnowing loop into one shifted-slice gram build
    (corpusops), one `hash_strings64` pass, and one
    ``minimum.reduceat``.  Gram hashes are internal identity only
    (rows-only op; determinism pinned by tests, no external hash
    contract)."""
    ds = read_documents(sf_dir)

    def fp(batch: pa.Table) -> pa.Table:
        from website_indexer_ray.pipelines.corpusops import (
            _ngram_rows_from_tokens,
        )
        from website_indexer_ray.util import hash_strings64

        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # trim + split_whitespace == str.split() for rows with any
        # non-ws char; whitespace-only rows yield one empty token —
        # zero grams for k >= 2 (k == 1 masks empties below).
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        row_of, grams, n_slots = _ngram_rows_from_tokens(toks, k)
        if k == 1 and len(grams):
            keep = pc.utf8_length(grams).to_numpy(zero_copy_only=False) > 0
            row_of, grams = row_of[keep], grams.filter(pa.array(keep))
            n_slots = np.bincount(row_of, minlength=len(n_slots))
        out_n = -(-n_slots // window)  # ceil; 0 stays 0
        out_min = np.zeros(len(n_slots), dtype=np.int64)
        if len(grams):
            g = hash_strings64(grams)
            bounds = np.flatnonzero(np.diff(row_of, prepend=-1))
            out_min[row_of[bounds]] = np.minimum.reduceat(g, bounds)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_fingerprints": pa.array(out_n, type=pa.int64()),
                "min_fingerprint": pa.array(out_min, type=pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


# --- MinHash + LSH near-dup -----------------------------------------

N_PERM = 128
N_BANDS = 32  # rows-per-band 4 ⇒ LSH threshold ≈ 0.42 Jaccard
# Mersenne prime 2^31-1: shingle hashes and permutation params stay
# below 2^31, so (a*x + b) fits native uint64 — the whole signature
# computation is vectorized numpy integer math, no object arrays.
_MH_PRIME = (1 << 31) - 1


def _perm_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MH_PRIME, size=N_PERM, dtype=np.uint64)
    b = rng.integers(0, _MH_PRIME, size=N_PERM, dtype=np.uint64)
    return a, b


def _shingle_hashes_batch(text_col) -> tuple[np.ndarray, np.ndarray]:
    """(parent row, shingle hash) for a whole text column, sorted by
    row with PER-ROW-UNIQUE hashes — the vectorized form of
    `_shingle_hashes` per doc: Arrow normalization kernels, the
    shifted-slice w-gram join (corpusops._word_ngram_rows), and
    `hash_strings64` over the gram strings in one numpy pass (no
    crc32-per-shingle Python loop; shingle hashes only need identity
    + uniformity — signature and verify both consume THIS hash).
    Rows shorter than the shingle width contribute their whole
    normalized text as the single shingle (the reference semantics);
    empty rows contribute none."""
    from website_indexer_ray.pipelines.corpusops import _word_ngram_rows
    from website_indexer_ray.util import hash_strings64

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    norm = pc.utf8_lower(
        pc.utf8_trim(pc.replace_substring_regex(text_col, r"\s+", " "), " ")
    )
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    row_of, grams, n_slots = _word_ngram_rows(norm, 3)
    # short rows (1-2 tokens): the whole normalized text is the shingle
    lens = pc.utf8_length(norm).to_numpy(zero_copy_only=False)
    short = np.flatnonzero((n_slots == 0) & (lens > 0))
    parts_rows = [row_of]
    parts_hash = [
        hash_strings64(grams).astype(np.uint64) % np.uint64(_MH_PRIME)
        if len(grams)
        else np.empty(0, dtype=np.uint64)
    ]
    if len(short):
        parts_rows.append(short.astype(np.int64))
        parts_hash.append(
            hash_strings64(norm.take(pa.array(short))).astype(np.uint64)
            % np.uint64(_MH_PRIME)
        )
    rows = np.concatenate(parts_rows)
    hashes = np.concatenate(parts_hash)
    if not len(rows):
        return rows.astype(np.int64), hashes
    # per-row unique: lexsort then drop consecutive (row, hash) dups
    order = np.lexsort((hashes, rows))
    rows, hashes = rows[order], hashes[order]
    keep = np.ones(len(rows), dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (hashes[1:] != hashes[:-1])
    return rows[keep], hashes[keep]


def _shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Single-doc form (the verify join computes shingles for
    candidate docs only) — delegates to the batch kernel so both
    sides of the pipeline share one hash identity."""
    _, h = _shingle_hashes_batch(pa.array([text], type=pa.string()))
    return h


_SIG_BLOCK_SHINGLES = 256  # val-matrix blocks 256 KB (x N_PERM x 8B)
# L2-resident blocks: the permutation matrix is memory-bound, not
# compute-bound — the block sweep measured 256 shingles (0.23 s)
# beating 8192 (0.42 s) single-core, and the gap widens under 32-way
# map_batches parallelism where big blocks fight for bandwidth


class MinHashStage:
    """Per-batch signature computation (perm params built once).
    Fully vectorized: one `_shingle_hashes_batch` pass, then the
    (a·x+b) mod p permutation matrix computed in ~64 MB blocks of
    consecutive docs with `np.minimum.reduceat` collapsing each doc's
    shingle span — no per-document Python.  Band hashes are an
    FNV-style fold + splitmix finalize over each 4-value signature
    slice (vectorized across the whole batch; bucket identity +
    uniformity is the only contract, as with the routing hashes)."""

    def __init__(self, seed: int = 7):
        self.a, self.b = _perm_params(seed)

    def _sigs(self, row_of: np.ndarray, hashes: np.ndarray, n_rows: int):
        sigs = np.full((n_rows, N_PERM), _MH_PRIME, dtype=np.uint64)
        if not len(row_of):
            return sigs
        doc_rows, doc_starts = np.unique(row_of, return_index=True)
        bnds = np.concatenate([doc_starts, [len(row_of)]])
        m31 = np.uint64(_MH_PRIME)
        s31 = np.uint64(31)
        gi = 0
        n_docs = len(doc_rows)
        while gi < n_docs:
            gj = gi + 1
            start = bnds[gi]
            while gj < n_docs and bnds[gj + 1] - start <= _SIG_BLOCK_SHINGLES:
                gj += 1
            end = bnds[gj]
            x = hashes[start:end]
            vals = self.a[None, :] * x[:, None] + self.b[None, :]
            # Mersenne reduction mod 2^31-1: (v & p) + (v >> 31),
            # twice, then one conditional subtract — shifts and adds
            # instead of 64-bit integer division (the hot op here)
            vals = (vals & m31) + (vals >> s31)
            vals = (vals & m31) + (vals >> s31)
            vals -= (vals >= m31) * m31
            sigs[doc_rows[gi:gj]] = np.minimum.reduceat(
                vals, bnds[gi:gj] - start, axis=0
            )
            gi = gj
        return sigs

    @staticmethod
    def _band_hashes(sigs: np.ndarray) -> np.ndarray:
        """(n_docs, N_BANDS) uint64 — FNV fold over each band's
        signature values + splitmix64 finalize, masked to 32 bits (the
        bucket key packs band bits alongside)."""
        n = len(sigs)
        v = sigs.reshape(n, N_BANDS, N_PERM // N_BANDS)
        h = np.full((n, N_BANDS), 0xCBF29CE484222325, dtype=np.uint64)
        P = np.uint64(0x100000001B3)
        for j in range(v.shape[2]):
            h = (h ^ v[:, :, j]) * P
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        return h & np.uint64(0xFFFFFFFF)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        row_of, hashes = _shingle_hashes_batch(batch.column("text"))
        sigs = self._sigs(row_of, hashes, n)
        band_h = self._band_hashes(sigs)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(N_BANDS, dtype=np.int32), n),
                    type=pa.int32(),
                ),
                "band_hash": pa.array(band_h.reshape(-1), type=pa.uint64()),
                "doc_id": pa.array(
                    np.repeat(doc_ids, N_BANDS), type=pa.int64()
                ),
            }
        )


_BUCKET_CAP = 50  # per-bucket member cap; truncation is counted+logged


def _bucket_pairs_partition(group: pa.Table) -> pa.Table:
    """One hash partition of (bucket_key, doc_id) rows → candidate
    pairs (doc_a < doc_b) for every bucket in the partition.

    Runs inside a ``hash_exchange`` reducer (state/exchange.py) —
    grouping per raw bucket key would pay a Python call per
    near-singleton group; within a partition the buckets are recovered
    vectorized (argsort + run-length boundaries, the same cost profile
    as a local combiner). Hot buckets are capped at _BUCKET_CAP sorted
    members; a sentinel row (doc_a = -1, n_dropped = k) records each
    truncation instead of dropping it silently."""
    keys = group.column("bucket_key").to_numpy(zero_copy_only=False)
    docs_np = group.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    boundaries = np.flatnonzero(np.diff(sorted_keys)) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(sorted_keys)]))
    a_out: list[int] = []
    b_out: list[int] = []
    n_dropped: list[int] = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        members = sorted(set(docs_np[order[s:e]].tolist()))
        dropped = max(0, len(members) - _BUCKET_CAP)
        members = members[:_BUCKET_CAP]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a_out.append(members[i])
                b_out.append(members[j])
                n_dropped.append(0)
        if dropped:
            a_out.append(-1)
            b_out.append(-1)
            n_dropped.append(dropped)
    return pa.table(
        {
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "n_dropped": pa.array(n_dropped, type=pa.int64()),
        }
    )


def _split_candidates(cand_tbl: pa.Table, op_name: str) -> pa.Table:
    """Strip truncation-sentinel rows, logging the drop count."""
    sentinels = cand_tbl.filter(pc.equal(cand_tbl.column("doc_a"), -1))
    if sentinels.num_rows:
        import logging

        logging.getLogger(__name__).warning(
            "%s: %d hot-bucket members beyond the %d-member cap were "
            "dropped across %d buckets",
            op_name,
            sum(sentinels.column("n_dropped").to_pylist()),
            _BUCKET_CAP,
            sentinels.num_rows,
        )
    return cand_tbl.filter(pc.greater_equal(cand_tbl.column("doc_a"), 0)).select(
        ["doc_a", "doc_b"]
    )


_EMPTY_PAIRS = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("jaccard_permille", pa.int64()),
    ]
)


def minhash_lsh_pairs(
    sf_dir: str, jaccard_threshold: float = 0.5, documents: pa.Table | None = None
) -> pa.Table:
    """shingle→minhash→band→bucket-groupby→candidate pairs→exact
    Jaccard verify (ray_guide near-dup pattern; Broder 1997) — fully
    in-dataset:

      1. signatures: map_batches (slim (bucket_key, doc_id) rows)
      2. candidates: hash_exchange on bucket_key (actor reducers as
         hash partitions — the one LSH exchange); buckets recovered
         vectorized in-partition; hot buckets capped (logged, never
         silent)
      3. verify: hash-partitioned shingle join — the pair-membership
         map (bounded by the candidate set) broadcasts once, shingle
         sets are computed per batch for candidate docs only, and one
         pair-keyed exchange co-locates both sides for the exact
         Jaccard.

    The signature table and shingle sets never land on the driver;
    only the final verified pair list (≪ corpus) does.
    Returns (doc_a, doc_b, jaccard_permille), doc_a < doc_b.
    """
    if documents is not None:
        ds = ray.data.from_arrow(documents.select(["doc_id", "text"]))
    else:
        ds = read_documents(sf_dir)

    # Stage state (permutation params) is 2 KB — run as plain tasks on
    # warm workers (instance-callable), not an actor pool whose
    # spin-up would dominate this short job.
    from website_indexer_ray.state.exchange import hash_exchange

    sigs = ds.map_batches(MinHashStage(), batch_format="pyarrow")

    def add_bucket_key(batch: pa.Table) -> pa.Table:
        h = batch.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket_key = ((h << np.uint64(5)) | b).astype(np.int64)
        return pa.table(
            {
                "bucket_key": pa.array(bucket_key, type=pa.int64()),
                "doc_id": batch.column("doc_id"),
            }
        )

    cand_raw = hash_exchange(
        sigs.map_batches(add_bucket_key, batch_format="pyarrow"),
        "bucket_key",
        _bucket_pairs_partition,
    )
    if cand_raw is None:
        return _EMPTY_PAIRS.empty_table()
    cand_tbl = _split_candidates(cand_raw, "minhash_lsh_pairs")
    if cand_tbl.num_rows == 0:
        return _EMPTY_PAIRS.empty_table()
    # Dedup duplicate candidates across bands on the slim pair list.
    cand_tbl = cand_tbl.group_by(["doc_a", "doc_b"]).aggregate([]).select(
        ["doc_a", "doc_b"]
    )

    out = _verify_pairs_jaccard(ds, cand_tbl, jaccard_threshold)
    return out.take(
        pc.sort_indices(out, sort_keys=[("doc_a", "ascending"), ("doc_b", "ascending")])
    )


def _verify_pairs_jaccard(
    docs_ds, cand_tbl: pa.Table, jaccard_threshold: float
) -> pa.Table:
    """Exact-Jaccard verification of candidate pairs as a
    hash-partitioned join: the pair membership map (doc → its pairs,
    bounded by the candidate set) is broadcast once; a map pass over
    the documents computes shingle sets for candidate docs only and
    emits one slim (pair_key, side, shingles) row per (doc, pair);
    one keyed exchange co-locates both sides of each pair, where the
    exact Jaccard is computed. Raw text never moves, and the driver
    only ever holds the candidate pair list."""
    n_reducers = 8
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for da, db in zip(
        cand_tbl.column("doc_a").to_pylist(), cand_tbl.column("doc_b").to_pylist()
    ):
        by_doc.setdefault(da, []).append((da, db))
        by_doc.setdefault(db, []).append((da, db))
    map_ref = ray.put(by_doc)

    shingle_list = pa.list_(pa.uint64())
    id_list = pa.list_(pa.int64())

    def emit_sides(batch: pa.Table) -> pa.Table:
        """One row per (doc, target partition): a doc participating in
        P pairs ships its shingle set once per PARTITION its pairs
        hash to, not once per pair — under heavy duplication (the
        dup-clique worst case) that bounds routed bytes by
        O(docs × n_reducers) instead of O(pairs)."""
        from website_indexer_ray.util import cached_get

        want = cached_get(map_ref)
        out_pk, out_id, out_a, out_b, out_sh = [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            pairs = want.get(doc_id)
            if not pairs:
                continue
            sh = _shingle_hashes(text).tolist()
            by_shard: dict[int, tuple[list, list]] = {}
            for da, db in pairs:
                shard = (da * 1_000_003 + db) % n_reducers
                slot = by_shard.setdefault(shard, ([], []))
                slot[0].append(da)
                slot[1].append(db)
            for shard, (das, dbs) in by_shard.items():
                out_pk.append(shard)
                out_id.append(doc_id)
                out_a.append(das)
                out_b.append(dbs)
                out_sh.append(sh)
        return pa.table(
            {
                "pair_key": pa.array(out_pk, type=pa.int64()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "doc_a": pa.array(out_a, type=id_list),
                "doc_b": pa.array(out_b, type=id_list),
                "shingles": pa.array(out_sh, type=shingle_list),
            }
        )

    def jaccard_partition(group: pa.Table) -> pa.Table:
        """One hash partition: every pair routed here has BOTH sides'
        shingle rows co-located (the row's shard key derives from the
        pair). Build each doc's set once, then verify each unique
        pair."""
        sh_of: dict[int, set] = {}
        pair_lists = []
        for d, das, dbs, sh in zip(
            group.column("doc_id").to_pylist(),
            group.column("doc_a").to_pylist(),
            group.column("doc_b").to_pylist(),
            group.column("shingles").to_pylist(),
        ):
            sh_of[d] = set(sh)
            pair_lists.append((das, dbs))
        done: set[tuple[int, int]] = set()
        out_a, out_b, out_j = [], [], []
        for das, dbs in pair_lists:
            for da, db in zip(das, dbs):
                if (da, db) in done:
                    continue
                sa, sb = sh_of.get(da), sh_of.get(db)
                if sa is None or sb is None:
                    continue
                done.add((da, db))
                union = len(sa | sb)
                j = len(sa & sb) / union if union else 0.0
                if j >= jaccard_threshold:
                    out_a.append(da)
                    out_b.append(db)
                    out_j.append(int(j * 1000))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard_permille": pa.array(out_j, type=pa.int64()),
            }
        )

    from website_indexer_ray.state.exchange import hash_exchange

    out = hash_exchange(
        docs_ds.map_batches(emit_sides, batch_format="pyarrow"),
        "pair_key",
        jaccard_partition,
        n_reducers=n_reducers,
    )
    return out if out is not None else _EMPTY_PAIRS.empty_table()


def _length_filter_mapped(
    sf_dir: str, min_tokens: int = 20, max_tokens: int = 1000
):
    """Token-count document filter (the standard cleaning gate: drop
    too-short and too-long documents). Pure per-batch vectorized
    predicate — count tokens with the RE2 kernel, mask, filter —
    emitting only kept doc_ids."""
    ds = read_documents(sf_dir)

    def keep(batch: pa.Table) -> pa.Table:
        n = _count_re(batch.column("text"), _TOKEN_PAT)
        mask = pc.and_(
            pc.greater_equal(n, min_tokens), pc.less_equal(n, max_tokens)
        )
        return pa.table({"doc_id": batch.column("doc_id").filter(mask)})

    return ds.map_batches(keep, batch_format="pyarrow")


def length_filter(
    sf_dir: str, min_tokens: int = 20, max_tokens: int = 1000
) -> pa.Table:
    return _collect_sorted(
        _length_filter_mapped(sf_dir, min_tokens, max_tokens), "doc_id"
    )


def length_filter_write(
    sf_dir: str, out_dir: str, min_tokens: int = 20, max_tokens: int = 1000
) -> None:
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(
        _length_filter_mapped(sf_dir, min_tokens, max_tokens), out_dir
    )


def vocab_top_tokens(sf_dir: str, k: int = 100) -> pa.Table:
    """Corpus vocabulary top-k: per-batch Arrow token counts (the
    partial combiner — token counts shrink ~1000x before leaving the
    task; tokenization is all-Arrow via _token_count_table, no per-doc
    Python) with an adaptive merge — driver-side while the partial
    table is small, flipping to a token-hash-keyed actor exchange when
    the vocabulary explodes (each partition owns its hashes, so its
    per-token sums are final). Deterministic (count desc, token asc)
    top-k."""
    ds = read_documents(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        counts = _token_count_table(batch.column("text"))
        # crc32 routing keys: per-DISTINCT-token only (vocab-sized,
        # not corpus-sized — the one loop the kernels can't replace)
        th = np.fromiter(
            (crc32(t.encode()) for t in counts.column("token").to_pylist()),
            dtype=np.int64,
            count=counts.num_rows,
        )
        return pa.table(
            {
                "token": counts.column("token"),
                "token_hash": pa.array(th, type=pa.int64()),
                "n": pc.cast(counts.column("n"), pa.int64()),
            }
        )

    from website_indexer_ray.util import agg_named

    partials = _merge_partials_adaptive(
        ds.map_batches(partial, batch_format="pyarrow"),
        key="token_hash",
        reduce_fn=lambda t: agg_named(
            t,
            ["token", "token_hash"],
            [("n", "sum")],
            ["token", "token_hash", "n"],
        ),
    )
    merged = agg_named(partials, "token", [("n", "sum")], ["token", "n"])
    order = pc.sort_indices(
        merged, sort_keys=[("n", "descending"), ("token", "ascending")]
    )
    return merged.take(order.slice(0, k))


# --- set-similarity join ---------------------------------------------

# Per-worker inverted index (token -> query positions) for
# similarity_join, keyed by the broadcast ref; cleared on key change.
def _distinct_token_rows(text_col) -> tuple[pa.Table, "np.ndarray"]:
    """Text column → distinct (row, w) word-token pairs + per-row
    distinct-token counts, entirely on Arrow kernels (utf8_lower /
    trim / RE2 whitespace collapse / split / list_flatten — the same
    normalization `normalize_text` + str.split computes per row, and
    the same RE2 engine the DuckDB oracle runs)."""
    if hasattr(text_col, "combine_chunks"):
        text_col = text_col.combine_chunks()
    n = len(text_col)
    empty = pa.table(
        {"row": pa.array([], type=pa.int64()), "w": pa.array([], type=pa.string())}
    )
    if not n:
        return empty, np.zeros(0, dtype=np.int64)
    norm = pc.utf8_lower(
        pc.utf8_trim(
            pc.replace_substring_regex(text_col, r"\s+", " "), " "
        )
    )
    toks = pc.split_pattern(norm, " ")
    flat = pc.list_flatten(toks)
    rows = pc.cast(pc.list_parent_indices(toks), pa.int64())
    t = pa.table({"row": rows, "w": flat}).filter(pc.not_equal(flat, ""))
    d = t.group_by(["row", "w"]).aggregate([])
    sizes = np.zeros(n, dtype=np.int64)
    if d.num_rows:
        cnt = agg_named(d, "row", [("w", "count")], ["row", "n"])
        sizes[cnt.column("row").to_numpy(zero_copy_only=False)] = (
            cnt.column("n").to_numpy(zero_copy_only=False)
        )
    return d, sizes


def similarity_join(
    sf_dir: str, threshold_pct: int = 20, query_mod: int = 29
) -> pa.Table:
    """Set-similarity join (the streaming-set-similarity-join operator
    class): match every document against a query set by word-token
    Jaccard, keeping pairs with similarity ≥ threshold_pct.

    Query side = docs with doc_id % query_mod == 0 (deterministic,
    corpus-derived — no external data).  This is the broadcast-small-
    side form: the query token sets ship once via ``ray.put`` and every
    corpus batch joins against them in one streaming pass — no shuffle,
    the pattern for query-against-corpus joins at 100 TB.  (Big-big
    similarity joins go through the MinHash-LSH machinery instead:
    minhash_lsh_pairs' bucket exchange.)  All-integer similarity
    ((100·|∩|) // |∪|, kept when 100·|∩| ≥ t·|∪|) so the result
    hash-matches the SQL oracle exactly.

    ``threshold_pct`` must be ≥ 1: the inverted-index prefilter only
    considers pairs sharing ≥ 1 token, which is equivalent to the
    threshold predicate exactly when t ≥ 1 (at t = 0 every
    zero-overlap pair would satisfy 100·0 ≥ 0·|∪| yet be skipped)."""
    from website_indexer_ray.util import cached_get

    if threshold_pct < 1:
        raise ValueError(
            "similarity_join requires threshold_pct >= 1; the token-"
            "overlap prefilter is only equivalent to the threshold "
            "predicate for positive thresholds"
        )
    docs = read_documents(sf_dir)

    # Query side built DISTRIBUTED (the decontaminate pattern): the
    # membership filter runs in map tasks; only the small query slice
    # is collected — the driver never streams the corpus.
    def _is_query(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % query_mod == 0))

    q_ds = docs.map_batches(_is_query, batch_format="pyarrow")
    from website_indexer_ray.util import collect_table_blocks

    q_tables = collect_table_blocks(q_ds)
    if q_tables:
        q_tbl = pa.concat_tables(q_tables).combine_chunks()
        q_tbl = q_tbl.take(
            pc.sort_indices(q_tbl, sort_keys=[("doc_id", "ascending")])
        )
    else:
        q_tbl = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "text": pa.array([], type=pa.string())}
        )
    # The broadcast side ships as Arrow/numpy (never Python sets): the
    # distinct (qpos, w) token table IS the inverted index — each
    # batch's Arrow hash join against it does the candidate
    # generation + intersection counting in one C++ pass.
    qtok, qsizes = _distinct_token_rows(q_tbl.column("text"))
    qtok = qtok.rename_columns(["qpos", "w"])
    qids_np = q_tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    q_ref = ray.put((qtok, qids_np, qsizes))

    def join_batch(batch: pa.Table) -> pa.Table:
        """Fully vectorized (no per-row Python): tokenize via RE2 +
        list kernels, intersect via one Arrow hash join + group count,
        score with integer numpy — exact floor arithmetic, so output
        is bit-identical to the former per-row set implementation."""
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "jaccard_pct": pa.array([], type=pa.int64()),
            }
        )
        qtok_t, qids, qn = cached_get(q_ref)
        if not qtok_t.num_rows or not batch.num_rows:
            return empty
        dtok, dn = _distinct_token_rows(batch.column("text"))
        if not dtok.num_rows:
            return empty
        j = dtok.join(qtok_t, keys=["w"], join_type="inner")
        if not j.num_rows:
            return empty
        g = agg_named(
            j.select(["row", "qpos", "w"]),
            ["row", "qpos"],
            [("w", "count")],
            ["row", "qpos", "i"],
        )
        row = g.column("row").to_numpy(zero_copy_only=False)
        qpos = g.column("qpos").to_numpy(zero_copy_only=False)
        inter = g.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        did = ids[row]
        qid = qids[qpos]
        union = dn[row] + qn[qpos] - inter
        keep = (qid != did) & (100 * inter >= threshold_pct * union)
        return pa.table(
            {
                "query_id": pa.array(qid[keep], type=pa.int64()),
                "doc_id": pa.array(did[keep], type=pa.int64()),
                "jaccard_pct": pa.array(
                    (100 * inter[keep]) // union[keep], type=pa.int64()
                ),
            }
        )

    out = _to_table(docs.map_batches(join_batch, batch_format="pyarrow"))
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("query_id", "ascending"), ("doc_id", "ascending")]
        )
    )


# --- BPE tokenizer training ------------------------------------------

_BPE_EOW = "</w>"


def _bpe_word_counts(sf_dir: str) -> pa.Table:
    """Distributed word-frequency table — the corpus-scale half of BPE
    training.  Per-batch Counters shrink the text ~1000x before
    anything leaves the scan task; tokenization is all-Arrow
    (_token_count_table — no per-doc Python in the scan body); the
    adaptive merge flips to a word-hash-keyed exchange when the
    vocabulary explodes."""
    from website_indexer_ray.util import agg_named

    ds = read_documents(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        counts = _token_count_table(batch.column("text"))
        wh = np.fromiter(
            (crc32(w.encode()) for w in counts.column("token").to_pylist()),
            dtype=np.int64,
            count=counts.num_rows,
        )
        return pa.table(
            {
                "word": counts.column("token"),
                "word_hash": pa.array(wh, type=pa.int64()),
                "n": pc.cast(counts.column("n"), pa.int64()),
            }
        )

    partials = _merge_partials_adaptive(
        ds.map_batches(partial, batch_format="pyarrow"),
        key="word_hash",
        reduce_fn=lambda t: agg_named(
            t,
            ["word", "word_hash"],
            [("n", "sum")],
            ["word", "word_hash", "n"],
        ),
    )
    return agg_named(partials, "word", [("n", "sum")], ["word", "n"])


def _bpe_merges(words: list[str], counts: list[int], n_merges: int):
    """Sequential BPE merge learning over the WORD-FREQUENCY table
    (Sennrich et al. 2016) — the standard reduction: a 100-TB corpus
    collapses to a vocab-sized table first, so the driver-side loop is
    bounded by distinct words × n_merges, never corpus size.
    Deterministic tie-break: count desc, then pair lexicographic."""
    from collections import Counter

    vocab: dict[tuple, int] = {}
    for w, c in zip(words, counts):
        key = tuple(w) + (_BPE_EOW,)
        vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_train(sf_dir: str, n_merges: int = 50) -> pa.Table:
    """Train a BPE tokenizer on the corpus → merge table
    (rank, left, right).  Distributed part: the word-count exchange
    (_bpe_word_counts).  Bounded part: merge learning over the word
    table on the driver — vocab-sized, not corpus-sized, exactly how
    production tokenizer trainers decompose the problem.  Fully
    deterministic (count-desc / pair-lexicographic tie-break), so the
    merges are independent of batching and partitioning (pinned in
    pytest)."""
    wc = _bpe_word_counts(sf_dir)
    order = pc.sort_indices(wc, sort_keys=[("word", "ascending")])
    wc = wc.take(order)
    merges = _bpe_merges(
        wc.column("word").to_pylist(),
        wc.column("n").to_pylist(),
        n_merges,
    )
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), type=pa.int64()),
            "left": pa.array([m[0] for m in merges], type=pa.string()),
            "right": pa.array([m[1] for m in merges], type=pa.string()),
        }
    )


# Per-worker word→token-length cache for bpe_token_count, keyed by the
# broadcast merge-table ref so a new tokenizer never reuses stale
# lengths; cleared on key change (one live tokenizer per worker).
_BPE_LEN_CACHE: dict[str, dict[str, int]] = {}


def _bpe_encode_len(word: str, rank_of: dict[tuple[str, str], int]) -> int:
    """Greedy BPE apply (lowest-rank pair first) → token count."""
    syms = list(word) + [_BPE_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_token_count(sf_dir: str, n_merges: int = 50) -> pa.Table:
    return _collect_sorted(_bpe_count_mapped(sf_dir, n_merges), "doc_id")


def bpe_token_count_write(sf_dir: str, out_dir: str, n_merges: int = 50) -> None:
    """Sink form of :func:`bpe_token_count` (output is O(corpus))."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(_bpe_count_mapped(sf_dir, n_merges), out_dir)


def _bpe_count_mapped(sf_dir: str, n_merges: int = 50):
    """Per-doc BPE token counts under a corpus-trained tokenizer:
    merges learned once (bpe_train), broadcast once via ``ray.put``,
    applied per batch with a per-WORKER word→length cache (a module
    global keyed by the merge-table ref, so it survives across the
    tasks a worker process runs; words repeat heavily, so the greedy
    merge loop runs ~once per DISTINCT word per worker, not per
    occurrence).  Deterministic but not
    SQL-expressible (the merge recurrence) ⇒ rows-only driver check;
    the exact gate is the hand-computed-merge and batching-
    independence pytests."""
    from website_indexer_ray.util import cached_get

    merges = bpe_train(sf_dir, n_merges)
    rank_of = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
        )
    }
    rank_ref = ray.put(rank_of)
    ref_key = rank_ref.hex()

    def count_batch(batch: pa.Table) -> pa.Table:
        ranks = cached_get(rank_ref)
        cache = _BPE_LEN_CACHE.get(ref_key)
        if cache is None:
            _BPE_LEN_CACHE.clear()  # one live tokenizer per worker
            cache = _BPE_LEN_CACHE[ref_key] = {}
        # tokenize the whole batch in one numpy pass, then greedy-
        # encode each DISTINCT word once (dictionary_encode): the
        # merge loop runs per distinct word per worker, never per
        # occurrence, and the per-doc sum is one bincount scatter
        toks, parent = _token_runs(batch.column("text"))
        out = np.zeros(batch.num_rows, dtype=np.int64)
        if len(toks):
            enc = toks.dictionary_encode()
            words = enc.dictionary.to_pylist()
            lens = np.empty(len(words), dtype=np.int64)
            for i, w in enumerate(words):
                ln = cache.get(w)
                if ln is None:
                    ln = _bpe_encode_len(w, ranks)
                    cache[w] = ln
                lens[i] = ln
            codes = enc.indices.to_numpy(zero_copy_only=False)
            out = np.bincount(
                parent, weights=lens[codes], minlength=batch.num_rows
            ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_bpe_tokens": pa.array(out, type=pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(count_batch, batch_format="pyarrow")


def _paragraph_exploded(sf_dir: str):
    """documents → (doc_id, seg_hash) rows, one per '. '-segment."""
    ds = read_documents(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        out_doc, out_h = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for seg in text.split(". "):
                out_doc.append(doc_id)
                out_h.append(_content_hash64(seg) & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "seg_hash": pa.array(out_h, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def _paragraph_mark_partition(group: pa.Table) -> pa.Table:
    """One seg_hash hash partition: a row is a duplicate segment
    iff its seg_hash occurs more than once corpus-wide — all of a
    hash's rows are co-located here, so the global count is a
    vectorized run-length over the sorted partition. Emits per-doc
    PARTIAL sums (the combiner) so the final doc_id merge moves
    one row per (doc, partition)."""
    from website_indexer_ray.util import agg_named

    h = group.column("seg_hash").to_numpy(zero_copy_only=False)
    d = group.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    bounds = np.flatnonzero(np.diff(hs)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(hs)]))
    sizes = ends - starts
    dup_flag = np.repeat((sizes > 1).astype(np.int64), sizes)
    return agg_named(
        pa.table(
            {
                "doc_id": pa.array(d[order], type=pa.int64()),
                "n": pa.array(np.ones(len(d), dtype=np.int64)),
                "dup": pa.array(dup_flag, type=pa.int64()),
            }
        ),
        "doc_id",
        [("n", "sum"), ("dup", "sum")],
        ["doc_id", "n", "dup"],
    )


_PARA_EMPTY = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_paragraphs", pa.int64()),
        ("n_dup_paragraphs", pa.int64()),
    ]
)


def _paragraph_final_merge(partials: pa.Table) -> pa.Table:
    from website_indexer_ray.util import agg_named

    tbl = agg_named(
        partials,
        "doc_id",
        [("n", "sum"), ("dup", "sum")],
        ["doc_id", "n_paragraphs", "n_dup_paragraphs"],
    )
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))


def paragraph_dedup(sf_dir: str) -> pa.Table:
    """Paragraph-level exact dedup stats: per document, how many of
    its '. '-delimited segments also appear elsewhere in the corpus
    (boilerplate detection — the segment-granularity member of the
    dedup family). Explode to (doc_id, seg_hash) rows per batch, one
    seg_hash-keyed exchange marks corpus-duplicated segments and
    combines to per-doc partials, a final per-doc merge sums them.
    Only 8-byte hash rows shuffle, never segment text."""
    from website_indexer_ray.state.exchange import hash_exchange

    partials = hash_exchange(
        _paragraph_exploded(sf_dir), "seg_hash", _paragraph_mark_partition
    )
    if partials is None:
        return _PARA_EMPTY.empty_table()
    # Final merge over the partials (≤ one row per doc per reducer —
    # the same shrink-then-merge contract as vocab_top_tokens; the
    # write form runs it as a second keyed exchange instead).
    return _paragraph_final_merge(partials)


def paragraph_dedup_write(sf_dir: str, out_dir: str) -> None:
    """Sink form for O(corpus)-row output: BOTH exchanges land in
    partitioned parquet — the seg_hash exchange sinks per-doc partials
    to a staging dir, a second doc_id-keyed exchange merges them and
    sinks the final per-doc stats. Nothing O(docs) ever concatenates
    on the driver; each partition is one file, each exchange commits a
    ``_SUCCESS`` manifest, and a resumed run skips every committed
    stage (the crawl checkpoints' resume protocol)."""
    import glob
    import os

    import ray.data as rd

    from website_indexer_ray.state.exchange import hash_exchange, sink_committed

    if sink_committed(out_dir):
        return
    staging = out_dir.rstrip("/") + ".partials"
    if not sink_committed(staging):
        hash_exchange(
            _paragraph_exploded(sf_dir),
            "seg_hash",
            _paragraph_mark_partition,
            sink_dir=staging,
        )
    if not glob.glob(os.path.join(staging, "part-*.parquet")):
        os.makedirs(out_dir, exist_ok=True)
        open(os.path.join(out_dir, "_SUCCESS"), "w").close()
        return
    hash_exchange(
        rd.read_parquet(
            sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
        ),
        "doc_id",
        _paragraph_final_merge,
        sink_dir=out_dir,
    )


def _dropped_from_pairs(pairs: pa.Table) -> np.ndarray:
    """Union-find over the near-dup pair list → the doc_ids to DROP
    (everything but min(doc_id) per connected component). The pair
    list is orders of magnitude smaller than the corpus, so this runs
    on the driver; at 10^10 docs the components step becomes iterative
    label propagation over the pair table, same contract."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # canonical root = smaller id, so kept doc is min per component
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    return np.array(
        sorted(d for d in parent if find(d) != d), dtype=np.int64
    )


def near_dedup_keep_ds(
    sf_dir: str, jaccard_threshold: float = 0.5, distributed_cc: bool = False
) -> "ray.data.Dataset":
    """Dataset-returning form of near-duplicate removal: MinHash-LSH
    pairs → connected components → drop-set broadcast once via
    ``ray.put`` → kept doc_ids emitted as a streaming ``map_batches``
    filter. Nothing O(corpus) ever lands on the driver — consume with
    ``write_parquet`` or feed the next stage.

    Components come from the driver union-find by default (the pair
    list is orders of magnitude smaller than the corpus); with
    ``distributed_cc=True`` they come from the large-star/small-star
    exchange rounds (graphops.connected_components) instead — the
    path for pair lists too big for one heap.  Both label components
    by min(doc_id), so the outputs are identical (pinned in pytest)."""
    from website_indexer_ray.util import cached_get

    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold)
    if distributed_cc:
        from website_indexer_ray.pipelines.graphops import connected_components

        comp = connected_components(pairs, a_col="doc_a", b_col="doc_b")
        non_root = comp.filter(
            pc.not_equal(comp.column("node"), comp.column("component"))
        )
        dropped = np.sort(
            non_root.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        dropped_ref = ray.put(dropped)
    else:
        dropped_ref = ray.put(_dropped_from_pairs(pairs))
    ds = read_documents(sf_dir, columns=["doc_id"])

    def keep(batch: pa.Table) -> pa.Table:
        dropped = cached_get(dropped_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, dropped, assume_unique=False)
        return pa.table({"doc_id": pa.array(ids[mask], type=pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow")


def near_dedup_keep(
    sf_dir: str, jaccard_threshold: float = 0.5, documents: pa.Table | None = None
) -> pa.Table:
    """The applied form of near-duplicate detection: MinHash-LSH pairs
    → connected components (union-find) → keep min(doc_id) per
    component. This is what a training-data pipeline actually runs —
    the kept-document list. The driver-query contract wants a table,
    so the streamed kept ids are collected at the end; production
    pipelines use ``near_dedup_keep_ds`` and sink it instead."""
    if documents is not None:
        # in-memory corpus variant (crawl output): filter the given
        # table directly — it is already driver-resident by contract.
        pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold, documents=documents)
        dropped = _dropped_from_pairs(pairs)
        ids = documents.column("doc_id").to_numpy(zero_copy_only=False)
        kept = np.sort(ids[~np.isin(ids, dropped)])
        return pa.table({"doc_id": pa.array(kept, type=pa.int64())})
    return _collect_sorted(near_dedup_keep_ds(sf_dir, jaccard_threshold), "doc_id")


# --- SimHash near-dup -----------------------------------------------

class SimHashStage:
    """Charikar 2002 similarity hash over unigram token hashes —
    vectorized across the whole batch: Arrow normalization + one
    whitespace split, `hash_strings64` over every token occurrence in
    one numpy pass (token-hash identity only needs determinism +
    uniformity; bit 63 is always 0, leaving an effective 63-bit
    signature — the 4×16-bit band blocking is unaffected), one
    unpackbits matrix, and per-doc bit sums via reduceat over the
    sorted parent spans. No per-document Python."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from website_indexer_ray.util import hash_strings64

        n = batch.num_rows
        sig = np.zeros(n, dtype=np.uint64)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if n:
            norm = pc.utf8_lower(
                pc.utf8_trim(
                    pc.replace_substring_regex(text, r"\s+", " "), " "
                )
            )
            toks = pc.split_pattern(norm, " ")
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = toks.values
            offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            parent = np.repeat(
                np.arange(n, dtype=np.int64), offsets[1:] - offsets[:-1]
            )
            if len(flat):
                # an empty doc splits to a single "" token — drop it
                keep = (
                    pc.utf8_length(flat)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    > 0
                )
                h = hash_strings64(flat).astype(np.uint64)[keep]
                parent = parent[keep]
                if len(h):
                    bits = np.unpackbits(
                        h.view(np.uint8).reshape(-1, 8),
                        axis=1,
                        bitorder="little",
                    ).astype(np.int64)
                    docs, starts = np.unique(parent, return_index=True)
                    cnt = np.add.reduceat(bits, starts, axis=0)
                    ntok = np.diff(
                        np.concatenate([starts, [len(parent)]])
                    )
                    pos_bits = (2 * cnt - ntok[:, None]) > 0
                    packed = np.packbits(
                        pos_bits, axis=1, bitorder="little"
                    )
                    sig[docs] = packed.copy().view(np.uint64).reshape(-1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(sig, type=pa.uint64()),
            }
        )


def _simhash_bands(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) → 4 band rows per doc for the blocking
    exchange, keyed by the composite bucket key (band folded in) plus
    its coarse hash partition. The signature rides along so hamming
    verifies in-partition with no second lookup."""
    ids = batch.column("doc_id").combine_chunks()
    sigs = batch.column("simhash").combine_chunks()
    sig_np = sigs.to_numpy(zero_copy_only=False).astype(np.uint64)
    out_key = np.concatenate(
        [
            (((sig_np >> np.uint64(band * 16)) & np.uint64(0xFFFF)) * np.uint64(4)
             + np.uint64(band)).astype(np.int64)
            for band in range(4)
        ]
    )
    return pa.table(
        {
            "bucket_key": pa.array(out_key, type=pa.int64()),
            "doc_id": pa.concat_arrays([ids] * 4),
            "simhash": pa.concat_arrays([sigs] * 4),
        }
    )


def simhash_pairs(
    sf_dir: str, max_hamming: int = 3, documents: pa.Table | None = None
) -> pa.Table:
    """Near-dup pairs by simhash: 4×16-bit band blocking (two sigs
    within hamming ≤3 of 64 bits share at least one exact 16-bit band)
    then exact hamming verify — distributed: the band rows flow
    through one bucket-keyed hash_exchange (actor reducers as hash
    partitions), hamming verifies inside the partition (signatures
    ride with the band rows), and the slim result dedups pairs that
    collided in several bands. Hot buckets capped at _BUCKET_CAP
    (logged). Returns (doc_a, doc_b, hamming)."""
    if documents is not None:
        ds = ray.data.from_arrow(documents.select(["doc_id", "text"]))
    else:
        ds = read_documents(sf_dir)

    def bucket_verify_partition(group: pa.Table) -> pa.Table:
        """One hash partition of band rows: recover the buckets
        vectorized (argsort + run-length over the composite band key),
        verify hamming inside each bucket (signatures rode along —
        no second lookup exchange)."""
        keys = group.column("bucket_key").to_numpy(zero_copy_only=False)
        docs_np = group.column("doc_id").to_numpy(zero_copy_only=False)
        sigs_np = group.column("simhash").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        bounds = np.flatnonzero(np.diff(sorted_keys)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sorted_keys)]))
        a_out, b_out, h_out = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = order[s:e]
            sig_of = dict(zip(docs_np[idx].tolist(), sigs_np[idx].tolist()))
            members = sorted(sig_of)
            dropped = max(0, len(members) - _BUCKET_CAP)
            members = members[:_BUCKET_CAP]
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    ham = bin(sig_of[members[i]] ^ sig_of[members[j]]).count("1")
                    if ham <= max_hamming:
                        a_out.append(members[i])
                        b_out.append(members[j])
                        h_out.append(ham)
            if dropped:
                # Unique per bucket so the dedup pass can't merge two
                # buckets' truncation records.
                a_out.append(-1)
                b_out.append(-(1 + int(sorted_keys[s])))
                h_out.append(dropped)
        return pa.table(
            {
                "doc_a": pa.array(a_out, type=pa.int64()),
                "doc_b": pa.array(b_out, type=pa.int64()),
                "hamming": pa.array(h_out, type=pa.int64()),
            }
        )

    from website_indexer_ray.state.exchange import hash_exchange

    tbl = hash_exchange(
        ds.map_batches(SimHashStage(), batch_format="pyarrow").map_batches(
            _simhash_bands, batch_format="pyarrow"
        ),
        "bucket_key",
        bucket_verify_partition,
    )
    if tbl is None:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
    sentinels = tbl.filter(pc.equal(tbl.column("doc_a"), -1))
    if sentinels.num_rows:
        import logging

        logging.getLogger(__name__).warning(
            "simhash_pairs: %d hot-bucket members beyond the %d-member "
            "cap were dropped",
            sum(sentinels.column("hamming").to_pylist()),
            _BUCKET_CAP,
        )
    out = tbl.filter(pc.greater_equal(tbl.column("doc_a"), 0))
    # Dedup pairs that collided in several bands (slim pair list).
    from website_indexer_ray.util import agg_named

    out = agg_named(
        out,
        ["doc_a", "doc_b"],
        [("hamming", "min")],
        ["doc_a", "doc_b", "hamming"],
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("doc_a", "ascending"), ("doc_b", "ascending")])
    )


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.3, documents: pa.Table | None = None
) -> pa.Table:
    """Exact n-gram Jaccard near-dup — the lower-threshold exact
    variant (MinHash bands recall; this verifies everything LSH
    surfaces at a looser threshold)."""
    return minhash_lsh_pairs(sf_dir, jaccard_threshold=threshold, documents=documents)


# --- Count-Min heavy hitters ----------------------------------------

def approx_top_tokens(
    sf_dir: str, k: int = 20, width: int = 4096, depth: int = 4,
    candidates_per_batch: int = 64,
) -> pa.Table:
    """Approximate corpus heavy hitters via Count-Min: each batch emits
    one serialized sketch (mergeable by addition — the partial) plus
    its local top tokens as candidates; the driver sums the sketches
    (depth×width ints, size-independent of the corpus) and ranks the
    candidate union by estimated count. CMS never underestimates, so
    true heavy hitters can't be pushed out by sketch error — only
    over-counted. Approximate ⇒ rows-only driver check; top-k overlap
    + overestimate bound vs the exact vocab asserted in pytest.
    Tokenization is all-Arrow (_token_count_table); the sketch update
    and candidate pick run over the batch's DISTINCT tokens (np.add.at
    scatter), never per occurrence."""
    ds = read_documents(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        counts = _token_count_table(batch.column("text"))
        toks = counts.column("token").to_pylist()
        ns = counts.column("n").to_numpy().astype(np.int64)
        sk = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            salt = d * 0x9E3779B1 & 0xFFFFFFFF
            idx = np.fromiter(
                (crc32(t.encode(), salt) % width for t in toks),
                dtype=np.int64,
                count=len(toks),
            )
            np.add.at(sk[d], idx, ns)
        # deterministic candidates: count desc, token asc (Counter's
        # most_common broke ties by first-occurrence order — batch-
        # layout-dependent; this form is partitioning-independent)
        order = pc.sort_indices(
            counts, sort_keys=[("n", "descending"), ("token", "ascending")]
        )
        top = (
            counts.take(order.slice(0, candidates_per_batch))
            .column("token")
            .to_pylist()
        )
        return pa.table(
            {
                "sketch": pa.array([sk.tobytes()], type=pa.binary()),
                "candidates": pa.array([top], type=pa.list_(pa.string())),
            }
        )

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow"))
    sk = np.zeros((depth, width), dtype=np.int64)
    cands: set[str] = set()
    for raw, cand in zip(
        parts.column("sketch").to_pylist(), parts.column("candidates").to_pylist()
    ):
        sk += np.frombuffer(raw, dtype=np.int64).reshape(depth, width)
        cands.update(cand)

    def estimate(tok: str) -> int:
        b = tok.encode()
        return int(
            min(
                sk[d, crc32(b, d * 0x9E3779B1 & 0xFFFFFFFF) % width]
                for d in range(depth)
            )
        )

    ranked = sorted(((estimate(t), t) for t in cands), key=lambda x: (-x[0], x[1]))
    top = ranked[:k]
    return pa.table(
        {
            "token": pa.array([t for _, t in top], type=pa.string()),
            "est_n": pa.array([n for n, _ in top], type=pa.int64()),
        }
    )


# --- helpers ---------------------------------------------------------

_PARTIAL_DRIVER_MAX = 200_000


def _merge_partials_adaptive(partials_ds, key: str, reduce_fn) -> pa.Table:
    """Adaptive partial-merge: a small partial table concatenates on
    the driver (the caller's final group_by finishes it); past
    _PARTIAL_DRIVER_MAX rows the merge runs as a key-hashed actor
    exchange (state/exchange.py) where each partition owns its keys,
    so per-partition reduction is globally correct and only
    already-reduced rows reach the driver. Both paths return a table
    the caller finishes with one group_by."""
    mat = partials_ds.materialize()
    if mat.count() <= _PARTIAL_DRIVER_MAX:
        return _to_table(mat)
    from website_indexer_ray.state.exchange import hash_exchange

    out = hash_exchange(mat, key, reduce_fn)
    # fall back to the MATERIALIZED handle — the lazy `partials_ds`
    # would re-execute the whole upstream pipeline
    return out if out is not None else _to_table(mat)


def _to_table(ds) -> pa.Table:
    from website_indexer_ray.util import collect_table

    return collect_table(ds)


def _collect_sorted(ds, key: str) -> pa.Table:
    tbl = _to_table(ds)
    return tbl.take(pc.sort_indices(tbl, sort_keys=[(key, "ascending")]))


# --- incremental snapshot dedup (new shard vs existing corpus) -------
# The nightly-ingestion shape of exact dedup: an existing corpus
# snapshot (already deduplicated, arbitrarily large) and a new shard
# of incoming docs; keep the new docs whose normalized content does
# not already exist in the snapshot. The reference re-crawls from
# scratch nightly (BASELINE.md: no incremental path); at 100 TB the
# incremental form is the one that matters.
#
# Scale design — three streaming passes, no all-to-all shuffle:
#   A. snapshot scan → per-batch Bloom-filter partials (fixed
#      ``bloom_bits`` bit array), OR-merged in two distributed levels;
#      the driver holds one filter of m/8 bytes however large the
#      snapshot (10^9 keys fit 1.2 GB at ~1% fpr — `ray.put` once).
#   B. new-shard scan probes the broadcast filter: "not in bloom" is
#      definitive (no false negatives) → kept outright; hits are only
#      *candidates* (true dups + fpr of the shard).
#   C. exact verify of the candidates — false positives must not drop
#      docs. Small candidate sets broadcast their hash set and one
#      more snapshot scan finds the truly-present hashes; past
#      ``verify_broadcast_max`` the verify runs as a hash-keyed
#      exchange anti-join instead (snapshot side pre-filtered by a
#      Bloom of the candidate hashes, so routed bytes are bounded by
#      candidates + fpr², not by the snapshot).
# Either way the result is exact; the Bloom only prunes work.

_SNAP_M63 = 0x7FFFFFFFFFFFFFFF


def _norm_hashes(texts: list[str]) -> np.ndarray:
    return np.array(
        [_content_hash64(normalize_text(t)) & _SNAP_M63 for t in texts],
        dtype=np.uint64,
    )


def _bloom_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) probe positions via double hashing; m_bits is a power
    of two so the modulo is a mask."""
    h2 = (hashes >> np.uint64(33)) | np.uint64(1)  # odd stride
    ii = np.arange(k, dtype=np.uint64)[:, None]
    return (hashes[None, :] + ii * h2[None, :]) & np.uint64(m_bits - 1)


def _bloom_set(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        words,
        (pos >> np.uint64(6)).ravel(),
        np.uint64(1) << (pos.ravel() & np.uint64(63)),
    )


def _bloom_test(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    bits = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=0)


def _bloom_from_hash_ds(ds, col: str, m_bits: int, k: int) -> np.ndarray:
    """OR-reduce per-batch Bloom partials over a dataset's uint64-able
    hash column. Level 1 builds one filter row per batch; level 2 ORs
    within coalesced blocks; the driver ORs the final <=8 rows — its
    share is O(8 × m/8) bytes at any input size."""

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        h = batch.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(h):
            _bloom_set(words, _bloom_positions(h, m_bits, k))
        return pa.table({"bloom": pa.array([words.tobytes()], type=pa.binary())})

    def or_rows(batch: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 64, dtype=np.uint64)
        for blob in batch.column("bloom"):
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
        return pa.table({"bloom": pa.array([acc.tobytes()], type=pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() > 8:
        partials = (
            partials.repartition(8)
            .map_batches(or_rows, batch_format="pyarrow")
            .materialize()
        )
    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    for blob in _to_table(partials).column("bloom"):
        acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    return acc


def _snapshot_hash_ds(sf_dir: str, shard_mod: int, want_new: bool):
    """Slim (doc_id, text_hash) rows for one side of the deterministic
    split: new shard = doc_id % shard_mod == 0, snapshot = the rest.
    Hashing happens in the scan tasks; only 16-byte rows leave them."""
    ds = read_documents(sf_dir)

    def hash_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % shard_mod == 0) if want_new else (ids % shard_mod != 0)
        sel = np.flatnonzero(mask)
        texts = batch.column("text").take(pa.array(sel)).to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], type=pa.int64()),
                "text_hash": pa.array(
                    _norm_hashes(texts).view(np.int64), type=pa.int64()
                ),
            }
        )

    return ds.map_batches(hash_side, batch_format="pyarrow")


def _snapshot_core(
    new_fn,
    snap_fn,
    bloom_bits: int = 1 << 20,
    n_probes: int = 6,
    verify_broadcast_max: int = 1_000_000,
):
    """The Bloom-prefilter + exact-verify machinery over two dataset
    FACTORIES (callables returning fresh slim (doc_id, text_hash)
    Datasets — the snapshot side is scanned up to twice). Returns
    ``(slim, dropped_ref)``: the materialized probed new side and a
    broadcast array of hashes truly present in the snapshot."""
    from website_indexer_ray.util import cached_get

    # Pass A: snapshot Bloom, broadcast once.
    bloom_ref = ray.put(
        _bloom_from_hash_ds(snap_fn(), "text_hash", bloom_bits, n_probes)
    )

    # Pass B: probe. Slim (doc_id, text_hash, maybe_dup) rows only.
    def probe(batch: pa.Table) -> pa.Table:
        words = cached_get(bloom_ref)
        h = (
            batch.column("text_hash")
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        maybe = (
            _bloom_test(words, _bloom_positions(h, bloom_bits, n_probes))
            if len(h)
            else np.zeros(0, dtype=bool)
        )
        return batch.append_column("maybe_dup", pa.array(maybe))

    slim = new_fn().map_batches(probe, batch_format="pyarrow").materialize()

    cand = _to_table(
        slim.map_batches(
            lambda b: b.filter(b.column("maybe_dup")), batch_format="pyarrow"
        )
    )

    # Pass C: exact verify of candidates → set of truly-present hashes.
    if cand.num_rows == 0:
        dropped_ref = ray.put(np.zeros(0, dtype=np.int64))
    elif cand.num_rows <= verify_broadcast_max:
        cand_hashes = np.unique(cand.column("text_hash").to_numpy())
        cand_ref = ray.put(cand_hashes)

        def present(batch: pa.Table) -> pa.Table:
            ch = cached_get(cand_ref)
            h = batch.column("text_hash").to_numpy(zero_copy_only=False)
            hit = h[np.isin(h, ch)]
            return pa.table(
                {"text_hash": pa.array(np.unique(hit), type=pa.int64())}
            )

        matched = _to_table(
            snap_fn().map_batches(present, batch_format="pyarrow")
        )
        dropped_ref = ray.put(np.unique(matched.column("text_hash").to_numpy()))
    else:
        # Exchange anti-join: candidate rows ∪ (snapshot hashes that
        # pass a Bloom of the candidate hashes) co-partition by hash;
        # a partition's candidate hash is a true dup iff a snapshot
        # row with the same hash landed in the same partition.
        cand_ds = slim.map_batches(
            lambda b: b.filter(b.column("maybe_dup")).select(["text_hash"]),
            batch_format="pyarrow",
        )
        cand_bloom = ray.put(
            _bloom_from_hash_ds(cand_ds, "text_hash", bloom_bits, n_probes)
        )

        def snap_survivors(batch: pa.Table) -> pa.Table:
            words = cached_get(cand_bloom)
            h = (
                batch.column("text_hash")
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            keep = (
                _bloom_test(words, _bloom_positions(h, bloom_bits, n_probes))
                if len(h)
                else np.zeros(0, dtype=bool)
            )
            return pa.table(
                {
                    "text_hash": pa.array(
                        h[keep].view(np.int64), type=pa.int64()
                    ),
                    "side": pa.array(
                        np.zeros(int(keep.sum()), dtype=np.int8)
                    ),
                }
            )

        def cand_tag(batch: pa.Table) -> pa.Table:
            t = batch.filter(batch.column("maybe_dup")).select(["text_hash"])
            return t.append_column(
                "side", pa.array(np.ones(t.num_rows, dtype=np.int8))
            )

        union = snap_fn().map_batches(
            snap_survivors, batch_format="pyarrow"
        ).union(slim.map_batches(cand_tag, batch_format="pyarrow"))

        def partition_dups(t: pa.Table) -> pa.Table:
            h = t.column("text_hash").to_numpy(zero_copy_only=False)
            side = t.column("side").to_numpy(zero_copy_only=False)
            snap = np.unique(h[side == 0])
            cand_h = np.unique(h[side == 1])
            return pa.table(
                {
                    "text_hash": pa.array(
                        cand_h[np.isin(cand_h, snap)], type=pa.int64()
                    )
                }
            )

        from website_indexer_ray.state.exchange import hash_exchange

        dup_tbl = hash_exchange(union, "text_hash", partition_dups)
        dropped = (
            np.unique(dup_tbl.column("text_hash").to_numpy())
            if dup_tbl is not None
            else np.zeros(0, dtype=np.int64)
        )
        dropped_ref = ray.put(dropped)

    return slim, dropped_ref


def snapshot_dedup_ds(sf_dir: str, shard_mod: int = 4, **kw):
    """Dataset of kept new-shard doc_ids (column ``doc_id``) — new
    docs whose normalized text does not appear in the snapshot side.
    Duplicates *within* the new shard are all kept (dedup is against
    the snapshot only; compose with exact_dedup for intra-shard)."""
    from website_indexer_ray.util import cached_get

    slim, dropped_ref = _snapshot_core(
        lambda: _snapshot_hash_ds(sf_dir, shard_mod, want_new=True),
        lambda: _snapshot_hash_ds(sf_dir, shard_mod, want_new=False),
        **kw,
    )

    # Final: definite keeps + candidates whose hash wasn't present.
    def keep(batch: pa.Table) -> pa.Table:
        dropped = cached_get(dropped_ref)
        h = batch.column("text_hash").to_numpy(zero_copy_only=False)
        maybe = batch.column("maybe_dup").to_numpy(zero_copy_only=False)
        ok = ~maybe | ~np.isin(h, dropped)
        return pa.table(
            {"doc_id": batch.column("doc_id").filter(pa.array(ok))}
        )

    return slim.map_batches(keep, batch_format="pyarrow")


def snapshot_dropped_ids(new_fn, snap_fn, **kw) -> np.ndarray:
    """doc_ids of the NEW side already present in the snapshot —
    the drop-set form composite pipelines broadcast (output ∝ true
    duplicates, never corpus size). ``new_fn``/``snap_fn`` are
    factories returning slim (doc_id, text_hash) Datasets."""
    from website_indexer_ray.util import cached_get

    slim, dropped_ref = _snapshot_core(new_fn, snap_fn, **kw)

    def dup_rows(batch: pa.Table) -> pa.Table:
        dropped = cached_get(dropped_ref)
        h = batch.column("text_hash").to_numpy(zero_copy_only=False)
        maybe = batch.column("maybe_dup").to_numpy(zero_copy_only=False)
        bad = maybe & np.isin(h, dropped)
        return pa.table(
            {"doc_id": batch.column("doc_id").filter(pa.array(bad))}
        )

    tbl = _to_table(slim.map_batches(dup_rows, batch_format="pyarrow"))
    return np.sort(tbl.column("doc_id").to_numpy(zero_copy_only=False))


def hashed_docs_ds(data_path: str):
    """Factory body for snapshot_dropped_ids over any documents
    parquet (file or directory): slim (doc_id, text_hash) rows with
    the family's normalized-content hash."""
    ds = ray.data.read_parquet(data_path, columns=["doc_id", "text"])

    def hash_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_hash": pa.array(
                    _norm_hashes(texts).view(np.int64), type=pa.int64()
                ),
            }
        )

    return ds.map_batches(hash_rows, batch_format="pyarrow")


def snapshot_dedup(sf_dir: str, **kw) -> pa.Table:
    """Driver-contract form: kept new-shard doc_ids, doc_id-sorted.
    Oracle: anti-join on the normalized text (NOT EXISTS)."""
    return _collect_sorted(snapshot_dedup_ds(sf_dir, **kw), "doc_id")


def snapshot_dedup_write(sf_dir: str, out_dir: str, **kw) -> None:
    """Sink form: kept ids stream to partitioned parquet under the
    commit protocol — nothing O(shard) concatenates on the driver."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(snapshot_dedup_ds(sf_dir, **kw), out_dir)


# --- per-doc distinctive terms (tf-idf-style, integer-exact) ----------
# Keyword extraction for corpus curation: the k most distinctive terms
# per document, ranked by tf DESC then global document-frequency ASC
# (rarer corpus-wide = more distinctive) then term ASC. The integer
# (tf, df) rank is the float tf·idf ordering made hash-stable across
# engines — log(N/df) is monotone-decreasing in df, so "tf desc, df
# asc" agrees with tf·idf wherever tf ties, and never compares floats.
#
# Scale: tf is exact per batch (a doc never spans batches) and stays
# distributed; df partials (term, n_docs-in-batch) sum through the
# adaptive merge keyed on a term hash; the final df table broadcasts
# once (vocab-sized — ~10^7 terms is ~100 MB, ray.put once per job)
# and each batch ranks its own docs with one Arrow hash-join + sort.

_TERM_SPLIT_PAT = r"[^a-z0-9]+"


def _doc_term_tf(batch: pa.Table) -> pa.Table:
    low = pc.utf8_lower(batch.column("text"))
    sp = pc.split_pattern_regex(low, _TERM_SPLIT_PAT)
    t = pa.table(
        {
            "doc_id": batch.column("doc_id").take(pc.list_parent_indices(sp)),
            "term": pc.cast(pc.list_flatten(sp), pa.string()),
        }
    )
    t = t.filter(pc.not_equal(t.column("term"), ""))
    from website_indexer_ray.util import agg_named

    return agg_named(
        t, ["doc_id", "term"], [([], "count_all")], ["doc_id", "term", "tf"]
    )


def _df_reduce(t: pa.Table) -> pa.Table:
    from website_indexer_ray.util import agg_named

    return agg_named(
        t,
        ["term", "term_hash"],
        [("df", "sum")],
        ["term", "term_hash", "df"],
    )


def top_terms_per_doc(sf_dir: str, k: int = 3) -> pa.Table:
    """(doc_id, term, tf, df) of each doc's top-k distinctive terms,
    ordered doc_id then term. Oracle: tf/df CTEs + ROW_NUMBER window."""
    from website_indexer_ray.util import agg_named, cached_get

    ds = read_documents(sf_dir)

    def df_partial(batch: pa.Table) -> pa.Table:
        tf = _doc_term_tf(batch)
        # distinct docs per term within the batch; batches partition
        # docs, so per-batch doc counts SUM to the global df
        part = agg_named(tf, "term", [([], "count_all")], ["term", "df"])
        th = np.fromiter(
            (crc32(s.encode()) & 0x7FFFFFFF for s in part.column("term").to_pylist()),
            dtype=np.int64,
            count=part.num_rows,
        )
        return part.append_column(
            "term_hash", pa.array(th, type=pa.int64())
        ).cast(
            pa.schema(
                [("term", pa.string()), ("df", pa.int64()), ("term_hash", pa.int64())]
            )
        )

    merged = _merge_partials_adaptive(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        key="term_hash",
        reduce_fn=_df_reduce,
    )
    df_tbl = agg_named(merged, "term", [("df", "sum")], ["term", "df"]).cast(
        pa.schema([("term", pa.string()), ("df", pa.int64())])
    )
    df_ref = ray.put(df_tbl.combine_chunks())

    def rank(batch: pa.Table) -> pa.Table:
        tf = _doc_term_tf(batch)
        joined = tf.join(cached_get(df_ref), keys="term", join_type="inner")
        order = pc.sort_indices(
            joined,
            sort_keys=[
                ("doc_id", "ascending"),
                ("tf", "descending"),
                ("df", "ascending"),
                ("term", "ascending"),
            ],
        )
        s = joined.take(order)
        doc = s.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.ones(len(doc), dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        pos = np.arange(len(doc), dtype=np.int64) - starts[run_id]
        return s.filter(pa.array(pos < k)).select(["doc_id", "term", "tf", "df"])

    out = _to_table(ds.map_batches(rank, batch_format="pyarrow"))
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("doc_id", "ascending"), ("term", "ascending")]
        )
    )


# --- exact length quantiles without a global sort ---------------------
# Distribution stats a curation run reports (length percentiles for
# filter thresholds). A global ds.sort is the naive path; since the
# key is a bounded-cardinality integer (distinct doc lengths), an
# exact value-histogram is enough: per-batch (value, count) partials
# sum through the adaptive merge, and the driver walks the cumulative
# histogram — O(distinct values) driver work at any corpus size.


def doc_length_quantiles(
    sf_dir: str, qs: tuple = (25, 50, 75, 95, 99)
) -> pa.Table:
    """(q, n_chars) rows: the q-th percentile of doc length, defined
    as the ceil(q*N/100)-th smallest value (rank-exact, no floats)."""
    from website_indexer_ray.util import agg_named

    ds = read_parquet_parallel(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    )

    def hist(t: pa.Table) -> pa.Table:
        return agg_named(
            t.select(["n_chars"]).append_column(
                "cnt", pa.array(np.ones(t.num_rows, dtype=np.int64))
            )
            if "cnt" not in t.schema.names
            else t,
            "n_chars",
            [("cnt", "sum")],
            ["n_chars", "cnt"],
        )

    merged = _merge_partials_adaptive(
        ds.map_batches(hist, batch_format="pyarrow"), key="n_chars", reduce_fn=hist
    )
    h = hist(merged)
    order = pc.sort_indices(h, sort_keys=[("n_chars", "ascending")])
    vals = h.column("n_chars").take(order).to_numpy(zero_copy_only=False)
    cum = np.cumsum(h.column("cnt").take(order).to_numpy(zero_copy_only=False))
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = -(-q * n // 100)  # ceil(q*N/100) in integers
        out_q.append(int(q))
        out_v.append(int(vals[np.searchsorted(cum, rank)]))
    return pa.table(
        {
            "q": pa.array(out_q, type=pa.int64()),
            "n_chars": pa.array(out_v, type=pa.int64()),
        }
    )


# --- duplicated-span removal (ExactSubstr-style; Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better") ---------
#
# Corpus-wide duplicated token runs of length >= k are excised from
# every occurrence EXCEPT the first (lowest (doc_id, pos)), the
# document-internal counterpart of the paper's suffix-array substring
# dedup re-expressed for a distributed engine: instead of one giant
# suffix array, every k-gram occurrence becomes a slim
# (gram_key, doc_id, pos) row and two keyed exchanges do the work —
# gram-keyed to find non-first occurrences, doc-keyed to merge the
# hit windows into maximal removal spans. Matching is hash-exact
# (xxh64 over the lowercased gram; 64-bit ⇒ collisions negligible and
# documented), positions are in `str.split()` token space, which is
# invariant under the lowercase/whitespace normalization used for
# hashing, so spans apply to the ORIGINAL tokens. Affected docs are
# ≪ corpus for natural data; only their (doc_id, span) rows ever
# reach the driver, and the applied form re-emits untouched docs
# byte-identical.

# Odd 64-bit multiplier (golden-ratio constant) for the polynomial
# gram hash: h(i) = Σ_j t64(tok[i+j])·B^(k-1-j) mod 2^64, where t64
# packs crc32(token) with an INDEPENDENT vectorized byte-polynomial
# over the token's first 16 bytes. The second word must not be any
# CRC variant of the same bytes: a CRC's state is exactly 32 bits and
# the update is affine, so crc32 with a different seed, an appended
# suffix, or a prepended prefix is an affine function of crc32(t) for
# equal-length tokens and adds ZERO entropy — a crc32-colliding token
# pair would still collide. With the byte polynomial, a combined
# collision needs a crc32 collision between tokens sharing their
# first 16 bytes (tokens ≤16 bytes with equal prefixes are equal),
# which is vanishing. This op DELETES text, so per-position entropy
# matters; everything stays vectorized (the per-gram pure-Python hash
# it replaced measured 3.3× total wall at the 50k-doc stress).
_DUP_HASH_B = np.uint64(0x9E3779B185EBCA87)
_TOKEN_BYTE_POWERS = np.uint64(0x100000001B3) ** np.arange(16, dtype=np.uint64)


def _token_hash64(toks: list[str]) -> np.ndarray:
    enc = [t.lower().encode() for t in toks]
    lo = np.array([crc32(b) for b in enc], dtype=np.uint64)
    padded = b"".join(b[:16].ljust(16, b"\x00") for b in enc)
    mat = (
        np.frombuffer(padded, dtype=np.uint8)
        .reshape(len(enc), 16)
        .astype(np.uint64)
    )
    hi = (mat * _TOKEN_BYTE_POWERS).sum(axis=1)  # uint64 wraps
    hi ^= np.array([len(b) for b in enc], dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def _dup_gram_rows(batch: pa.Table, k: int, exclude_ref=None) -> pa.Table:
    from website_indexer_ray.util import cached_get

    if exclude_ref is not None:
        excl = cached_get(exclude_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(~np.isin(ids, excl)))
    g_parts, d_parts, p_parts = [], [], []
    mask63 = np.uint64((1 << 63) - 1)
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        toks = text.split()  # positions index the ORIGINAL tokens
        n_grams = len(toks) - k + 1
        if n_grams <= 0:
            continue
        th = _token_hash64(toks)
        acc = th[:n_grams].copy()
        for j in range(1, k):
            acc = acc * _DUP_HASH_B + th[j : n_grams + j]  # uint64 wraps
        g_parts.append((acc & mask63).astype(np.int64))
        d_parts.append(np.full(n_grams, doc_id, dtype=np.int64))
        p_parts.append(np.arange(n_grams, dtype=np.int64))
    if not g_parts:
        return pa.table(
            {
                "gram_key": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "gram_key": pa.array(np.concatenate(g_parts), type=pa.int64()),
            "doc_id": pa.array(np.concatenate(d_parts), type=pa.int64()),
            "pos": pa.array(np.concatenate(p_parts), type=pa.int64()),
        }
    )


def _dup_marks_partition(group: pa.Table) -> pa.Table:
    """Gram-keyed partition → every occurrence that is NOT the first
    (lowest (doc_id, pos)) of its gram run, fully vectorized: one
    lexsort, run boundaries by key change, non-run-start mask."""
    g = group.column("gram_key").to_numpy(zero_copy_only=False)
    d = group.column("doc_id").to_numpy(zero_copy_only=False)
    p = group.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((p, d, g))
    gs = g[order]
    run_start = np.concatenate(([True], gs[1:] != gs[:-1]))
    mask = ~run_start
    return pa.table(
        {
            "doc_id": pa.array(d[order][mask], type=pa.int64()),
            "pos": pa.array(p[order][mask], type=pa.int64()),
        }
    )


def _merge_spans_partition(group: pa.Table, k: int) -> pa.Table:
    """Doc-keyed partition of removal marks → maximal merged token
    spans [span_start, span_end) per doc. The row loop is bounded by
    the partition's DUPLICATE volume (marks), never the corpus."""
    d = group.column("doc_id").to_numpy(zero_copy_only=False)
    p = group.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((p, d))
    out_d, out_s, out_e = [], [], []
    cur_doc, cur_s, cur_e = None, 0, -1
    for doc, pos in zip(d[order], p[order]):
        if doc != cur_doc or pos > cur_e:
            if cur_doc is not None:
                out_d.append(cur_doc)
                out_s.append(cur_s)
                out_e.append(cur_e)
            cur_doc, cur_s, cur_e = doc, pos, pos + k
        else:
            cur_e = max(cur_e, pos + k)
    if cur_doc is not None:
        out_d.append(cur_doc)
        out_s.append(cur_s)
        out_e.append(cur_e)
    return pa.table(
        {
            "doc_id": pa.array(out_d, type=pa.int64()),
            "span_start": pa.array(out_s, type=pa.int64()),
            "span_end": pa.array(out_e, type=pa.int64()),
        }
    )


def _dup_docs_ds(sf_dir: str, documents: pa.Table | None):
    if documents is not None:
        return ray.data.from_arrow(documents.select(["doc_id", "text"]))
    return read_documents(sf_dir)


def dup_span_marks(
    sf_dir: str,
    k: int = 15,
    documents: pa.Table | None = None,
    exclude_ids: "np.ndarray | None" = None,
) -> pa.Table:
    """Merged removal spans (doc_id, span_start, span_end) in token
    space, sorted — the slim artifact both the stats query and the
    applied rewrite consume. ``exclude_ids`` (e.g. a dedup drop set)
    removes docs from gram emission entirely, so a dropped first
    occurrence can never anchor a run and excise the surviving copy."""
    import functools

    from website_indexer_ray.state.exchange import hash_exchange

    ds = _dup_docs_ds(sf_dir, documents)
    exclude_ref = (
        ray.put(np.asarray(exclude_ids, dtype=np.int64))
        if exclude_ids is not None and len(exclude_ids)
        else None
    )
    grams = ds.map_batches(
        functools.partial(_dup_gram_rows, k=k, exclude_ref=exclude_ref),
        batch_format="pyarrow",
    )
    marks = hash_exchange(grams, "gram_key", _dup_marks_partition)
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "span_start": pa.array([], type=pa.int64()),
            "span_end": pa.array([], type=pa.int64()),
        }
    )
    if marks is None or marks.num_rows == 0:
        return empty
    spans = hash_exchange(
        ray.data.from_arrow(marks),
        "doc_id",
        functools.partial(_merge_spans_partition, k=k),
    )
    if spans is None:
        return empty
    return spans.take(
        pc.sort_indices(
            spans,
            sort_keys=[("doc_id", "ascending"), ("span_start", "ascending")],
        )
    )


def dup_span_removal(
    sf_dir: str, k: int = 15, documents: pa.Table | None = None
) -> pa.Table:
    """Driver-query form: per affected doc, how much duplicated text
    the rewrite removes — (doc_id, n_spans, n_tokens_removed), sorted.
    Hash-exact duplicated-run detection ⇒ rows-only check; the planted-
    duplicate excision semantics are pinned in pytest."""
    spans = dup_span_marks(sf_dir, k, documents)
    if spans.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_spans": pa.array([], type=pa.int64()),
                "n_tokens_removed": pa.array([], type=pa.int64()),
            }
        )
    from website_indexer_ray.util import agg_named

    lengths = pc.subtract(spans.column("span_end"), spans.column("span_start"))
    out = agg_named(
        spans.append_column("len", lengths),
        "doc_id",
        [("len", "count"), ("len", "sum")],
        ["doc_id", "n_spans", "n_tokens_removed"],
    )
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))


def apply_spans_to_texts(
    ids, texts, spans_by_doc: dict
) -> list[str]:
    """Excise [start, end) TOKEN ranges as byte-precise deletions on
    the original text: each merged span deletes from its first token's
    byte offset to the byte offset of the first surviving token after
    it (or, at end of text, back through the preceding whitespace), so
    every byte OUTSIDE the excised ranges — newlines, tabs, spacing —
    survives untouched. Docs absent from the span map pass through
    byte-identical (a join-and-resplit rewrite would silently collapse
    all whitespace in any doc with even one span)."""
    out = []
    for doc_id, text in zip(ids, texts):
        iv = spans_by_doc.get(doc_id)
        if not iv:
            out.append(text)
            continue
        toks = list(_WORD_RE.finditer(text))
        n = len(toks)
        cuts: list[tuple[int, int]] = []
        for s, e in iv:  # merged spans: non-overlapping, ascending
            s, e = min(s, n), min(e, n)
            if e <= s:
                continue
            if e < n:
                cuts.append((toks[s].start(), toks[e].start()))
            else:
                left = toks[s - 1].end() if s > 0 else 0
                cuts.append((left, len(text)))
        parts, prev = [], 0
        for a, b in cuts:
            parts.append(text[prev:a])
            prev = b
        parts.append(text[prev:])
        out.append("".join(parts))
    return out


def spans_by_doc(spans: pa.Table) -> dict:
    """(doc_id, span_start, span_end) rows → {doc_id: [(s, e), ...]}
    for broadcast."""
    by: dict[int, list[tuple[int, int]]] = {}
    for doc, s, e in zip(
        spans.column("doc_id").to_pylist(),
        spans.column("span_start").to_pylist(),
        spans.column("span_end").to_pylist(),
    ):
        by.setdefault(doc, []).append((s, e))
    return by


def dup_span_removal_ds(
    sf_dir: str, k: int = 15, documents: pa.Table | None = None
) -> "ray.data.Dataset":
    """Applied rewrite as a streaming Dataset of (doc_id, text):
    the merged span table (affected docs only, ≪ corpus) broadcasts
    once; a map pass excises the marked token ranges from the ORIGINAL
    tokens (first occurrences and untouched docs stay byte-identical —
    untouched docs are passed through without re-joining)."""
    from website_indexer_ray.util import cached_get

    spans = dup_span_marks(sf_dir, k, documents)
    spans_ref = ray.put(spans_by_doc(spans))

    def apply(batch: pa.Table) -> pa.Table:
        todo = cached_get(spans_ref)
        texts = apply_spans_to_texts(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            todo,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    return _dup_docs_ds(sf_dir, documents).map_batches(apply, batch_format="pyarrow")


def dup_span_removal_write(sf_dir: str, out_dir: str, k: int = 15) -> None:
    """Sink form of the duplicated-span rewrite: the cleaned corpus
    streams to a committed parquet dir (resume = skip committed) —
    the production path for an O(corpus) output; the table form stays
    the driver-query contract."""
    from website_indexer_ray.util import committed_parquet_write

    committed_parquet_write(dup_span_removal_ds(sf_dir, k), out_dir)
