"""The flagship composite training-data pipeline: documents →
cleaned, deduplicated, training-ready corpus, checkpointed at every
stage.

This is what a user of the engine actually runs over a raw 100-TB
document dump: one streaming cleaning pass (optional normalization +
token-length gate + language ID — pure per-batch predicates, no
global state), exact dedup, MinHash-LSH near-dedup, then one final
keep pass that can also decontaminate against an eval set, enforce
per-source quotas, redact PII and assign training shards — composed
from the textops/corpusops operators with the engine's resume
protocol:

  out_dir/
    filtered/_SUCCESS + filtered/documents.parquet/   (stage 1)
    kept/_SUCCESS     + kept/documents.parquet/       (stage 3)
    stats.parquet                                      (lineage)

Scale shape (the part that matters at 10^10 docs):
  - stage 1 streams map_batches → write_parquet, nothing on the driver;
  - both dedup stages broadcast only their DROP sets (∝ duplicate
    count, not corpus size) via one ``ray.put`` each — the exact-dup
    drop list comes off a content-hash exchange that emits only
    non-minimum members of duplicate groups, the near-dup drop list
    off the slim LSH pair list's union-find; the per-source quota
    stage likewise broadcasts only the over-quota EXCESS ids from a
    slim keyed exchange;
  - decontamination / PII / shard assignment are per-batch kernels
    folded into the single final pass (eval n-grams broadcast once);
  - a resumed run skips every stage whose ``_SUCCESS`` exists.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from website_indexer_ray.pipelines.textops import (
    _TOKEN_PAT,
    _content_hash64,
    _count_re,
    _dropped_from_pairs,
    LangIdStage,
    minhash_lsh_pairs,
    normalize_text,
    read_documents,
)
from website_indexer_ray.state.exchange import hash_exchange
from website_indexer_ray.util import cached_get, collect_table_blocks


def _committed(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, "_SUCCESS"))


def _commit(stage_dir: str) -> None:
    open(os.path.join(stage_dir, "_SUCCESS"), "w").close()


def _dir_rows(data_dir: str) -> int:
    """Row count from parquet footers only — never reads data pages."""
    total = 0
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def exact_dedup_dropped(sf_dir: str) -> np.ndarray:
    """doc_ids to DROP under exact (normalized-text) dedup: every
    non-minimum member of a duplicate group. Output size ∝ number of
    duplicates, never corpus size — only (hash, doc_id) pairs shuffle
    and only duplicate ids return."""
    ds = read_documents(sf_dir)

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            _content_hash64(normalize_text(t)) & 0x7FFFFFFFFFFFFFFF
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "text_hash": pa.array(hashes, type=pa.int64()),
                "doc_id": batch.column("doc_id"),
            }
        )

    def non_min_members(t: pa.Table) -> pa.Table:
        h = t.column("text_hash").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        hs, ds_ = h[order], d[order]
        grp_first = np.ones(len(hs), dtype=bool)
        grp_first[1:] = hs[1:] != hs[:-1]
        # sorted by (hash, doc_id): the first row of each group is the
        # min doc_id (the keeper); everything else is dropped
        dropped = ds_[~grp_first]
        return pa.table({"doc_id": pa.array(dropped, type=pa.int64())})

    out = hash_exchange(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        "text_hash",
        non_min_members,
    )
    if out is None:
        return np.array([], dtype=np.int64)
    return np.sort(out.column("doc_id").to_numpy(zero_copy_only=False))


def quota_dropped(
    filtered_data: str, dropped: np.ndarray, k: int, longest: bool = False
) -> np.ndarray:
    """doc_ids to DROP to enforce a per-source quota of k among the
    dedup survivors: everything past the k smallest doc_ids of each
    source (``longest=True`` ranks by text length desc instead —
    group_topk semantics — keeping each source's k longest docs).
    Slim (doc_id, source[, length]) rows route through the exchange
    hashed on source (string rides along — grouping is exact);
    output ∝ over-quota excess, never corpus size."""
    from zlib import crc32

    dropped_ref = ray.put(dropped)
    cols = ["doc_id", "source"] + (["text"] if longest else [])
    ds = ray.data.read_parquet(filtered_data, columns=cols)

    def key_rows(batch: pa.Table) -> pa.Table:
        dr = cached_get(dropped_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(~np.isin(ids, dr)))
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.dictionary_encode(src)
        uniq = np.fromiter(
            (crc32(s.encode()) & 0x7FFFFFFF for s in enc.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(enc.dictionary),
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": src,
                "src_hash": pa.array(uniq[codes], type=pa.int64()),
            }
        )
        if longest:
            # length computed in the scan task; text never routes
            out = out.append_column(
                "length",
                pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            )
        return out

    def over_quota(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src_col = t.column("source")
        if isinstance(src_col, pa.ChunkedArray):
            src_col = src_col.combine_chunks()
        src = pc.dictionary_encode(src_col).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if longest:
            ln = t.column("length").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            order = np.lexsort((doc, -ln, src))
        else:
            order = np.lexsort((doc, src))
        src_s, doc_s = src[order], doc[order]
        first = np.ones(len(src_s), dtype=bool)
        first[1:] = src_s[1:] != src_s[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        pos = np.arange(len(src_s), dtype=np.int64) - starts[run_id]
        return pa.table({"doc_id": pa.array(doc_s[pos >= k], type=pa.int64())})

    out = hash_exchange(
        ds.map_batches(key_rows, batch_format="pyarrow"), "src_hash", over_quota
    )
    if out is None:
        return np.array([], dtype=np.int64)
    return np.sort(out.column("doc_id").to_numpy(zero_copy_only=False))


def _gate_dropped_ids(
    filtered_data: str,
    decon_max_overlap: int | None,
    ev_grams_ref,
    max_ppl: float | None,
    logp_ref,
) -> np.ndarray:
    """One streaming pass over the cleaned corpus emitting the doc_ids
    the decontamination / perplexity / eval-split gates will drop in
    the keep pass — the same kernels, mask inverted, ids only."""

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        drop = np.zeros(len(ids), dtype=bool)
        if decon_max_overlap is not None:
            from website_indexer_ray.pipelines.corpusops import (
                DECON_N,
                _EVAL_MOD,
                _eval_overlap_counts,
            )

            drop |= ids % _EVAL_MOD == 0
            _, overlap = _eval_overlap_counts(
                batch.column("text"), cached_get(ev_grams_ref), DECON_N
            )
            drop |= overlap > decon_max_overlap
        if max_ppl is not None:
            from website_indexer_ray.pipelines.corpusops import _ppl_scores

            _, ppl = _ppl_scores(batch.column("text"), cached_get(logp_ref))
            with np.errstate(invalid="ignore"):
                drop |= ~(ppl <= max_ppl)  # NaN fails the gate too
        return pa.table(
            {"doc_id": pa.array(ids[drop], type=pa.int64())}
        )

    parts = collect_table_blocks(
        ray.data.read_parquet(filtered_data).map_batches(
            gate, batch_format="pyarrow"
        )
    )
    if not parts:
        return np.array([], dtype=np.int64)
    return np.sort(
        pa.concat_tables(parts).column("doc_id").to_numpy(zero_copy_only=False)
    )


def curate_corpus(
    sf_dir: str,
    out_dir: str,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    normalize: bool = False,
    redact_pii: bool = False,
    decon_max_overlap: int | None = None,
    eval_documents: pa.Table | None = None,
    per_source_quota: int | None = None,
    quota_longest: bool = False,
    n_shards: int | None = None,
    max_ppl: float | None = None,
    snapshot_dir: str | None = None,
    dup_span_k: int | None = None,
    near_dup_method: str = "minhash",
    simhash_max_hamming: int = 3,
    embed_sim_threshold: float = 0.9,
    embed_dim: int = 64,
) -> pa.Table:
    """Run the full curation pipeline; returns the per-stage lineage
    table (stage, n_docs). Re-running resumes from the last committed
    stage.

    Opt-in training-readiness stages (all default off; the base
    clean→dedup→keep behavior is unchanged):
      - ``normalize``: lowercase/whitespace-collapse text in stage 1,
        before the length gate and language ID.
      - ``decon_max_overlap``: drop kept docs whose distinct word
        5-grams overlap the eval set more than this many times (and
        drop the eval docs themselves). ``eval_documents`` supplies
        the eval table; default is the doc_id %% 101 == 0 stand-in
        split of the input.
      - ``per_source_quota``: keep at most k docs (smallest doc_ids)
        per source among the dedup survivors; ``quota_longest=True``
        keeps each source's k LONGEST docs instead (ranked selection).
      - ``snapshot_dir``: incremental mode — drop cleaned docs whose
        normalized text already exists in a prior corpus (a directory
        holding ``documents.parquet``, e.g. a previous run's ``kept/``;
        a direct parquet path also works). Exact-match incremental
        dedup via the snapshot Bloom machinery — only the true-dup ids
        broadcast; near-dedup stays within-batch (the snapshot carries
        no MinHash signatures).
      - ``redact_pii``: rewrite kept text through the email/IP/phone
        redaction kernels.
      - ``n_shards``: add a deterministic training-shard column
        (multiplicative-hash) to the kept output.
      - ``dup_span_k``: ExactSubstr-style duplicated-span removal —
        token runs of length >= k occurring in more than one SURVIVING
        doc are excised from all but the first occurrence during the
        final keep pass (dropped docs are excluded first, so a dropped
        duplicate can never anchor a run and erase the kept copy).
      - ``near_dup_method``: the near-dup family — ``"minhash"``
        (token-Jaccard LSH, default; ``jaccard_threshold`` applies),
        ``"simhash"`` (bit-similarity band blocking;
        ``simhash_max_hamming`` applies), or ``"embedding"``
        (embedding-cosine: hashed-BoW vectors derived from the cleaned
        text into a committed ``embeddings/`` sink, then the
        LSH-bucketed exact-cosine pair path; ``embed_sim_threshold`` /
        ``embed_dim`` apply — a learned encoder drops into the same
        sink stage). All three flow the same slim pair shape through
        the same bucket-keyed exchange.
      - ``max_ppl``: drop kept docs whose byte-bigram LM perplexity
        (CCNet-style; model trained once on the cleaned corpus, the
        512 KB log-prob table broadcast via one ``ray.put``) exceeds
        this bound. Docs with fewer than two bytes score NaN and are
        dropped by the gate (the default ``min_tokens`` makes that
        vacuous).
    """
    if near_dup_method not in ("minhash", "simhash", "embedding"):
        raise ValueError(
            f"near_dup_method must be 'minhash', 'simhash' or "
            f"'embedding', got {near_dup_method!r}"
        )
    filtered_dir = os.path.join(out_dir, "filtered")
    filtered_data = os.path.join(filtered_dir, "documents.parquet")
    kept_dir = os.path.join(out_dir, "kept")
    kept_data = os.path.join(kept_dir, "documents.parquet")

    n_input = _dir_rows(os.path.join(sf_dir, "documents.parquet")) or (
        pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
        if os.path.isfile(os.path.join(sf_dir, "documents.parquet"))
        else 0
    )

    # ---- stage 1: streaming clean (length gate + language ID) ------
    if not _committed(filtered_dir):
        os.makedirs(filtered_dir, exist_ok=True)
        lang_stage = LangIdStage()
        lang_set = frozenset(langs)

        def clean(batch: pa.Table) -> pa.Table:
            if normalize:
                from website_indexer_ray.pipelines.corpusops import (
                    _normalize_batch,
                )

                norm = _normalize_batch(batch)
                batch = batch.set_column(
                    batch.schema.get_field_index("text"),
                    "text",
                    norm.column("text"),
                )
            n = _count_re(batch.column("text"), _TOKEN_PAT)
            mask = pc.and_(
                pc.greater_equal(n, min_tokens), pc.less_equal(n, max_tokens)
            )
            batch = batch.filter(mask)
            if batch.num_rows == 0:
                return batch
            preds = lang_stage(batch)
            keep = pc.is_in(
                preds.column("lang_pred"),
                value_set=pa.array(sorted(lang_set), type=pa.string()),
            )
            return batch.filter(keep)

        # source rides along as provenance (and feeds the quota stage)
        read_documents(sf_dir, columns=["doc_id", "text", "source"]).map_batches(
            clean, batch_format="pyarrow"
        ).write_parquet(filtered_data)
        _commit(filtered_dir)

    n_cleaned = _dir_rows(filtered_data)

    # ---- stages 2+3: dedup drop sets + final keep pass --------------
    n_after_exact = n_cleaned
    n_span_docs = None
    n_kept = _dir_rows(kept_data) if _committed(kept_dir) else None
    if n_kept is None:
        if n_cleaned == 0:
            os.makedirs(kept_dir, exist_ok=True)
            os.makedirs(kept_data, exist_ok=True)
            _commit(kept_dir)
            n_kept = 0
        else:
            dropped_exact = exact_dedup_dropped(filtered_dir)
            if snapshot_dir is not None:
                from website_indexer_ray.pipelines.textops import (
                    hashed_docs_ds,
                    snapshot_dropped_ids,
                )

                snap_path = os.path.join(snapshot_dir, "documents.parquet")
                if not os.path.exists(snap_path):
                    snap_path = snapshot_dir
                dropped_exact = np.union1d(
                    dropped_exact,
                    snapshot_dropped_ids(
                        lambda: hashed_docs_ds(filtered_data),
                        lambda: hashed_docs_ds(snap_path),
                    ),
                )
            n_after_exact = n_cleaned - len(dropped_exact)
            # near-dup family is selectable: MinHash-LSH (token-
            # Jaccard, the default) or SimHash band blocking (bit
            # similarity of hashed feature vectors) — both produce the
            # same slim (doc_a, doc_b) pair shape through the same
            # bucket-keyed exchange, so the drop-set plumbing is shared
            if near_dup_method == "minhash":
                pairs = minhash_lsh_pairs(filtered_dir, jaccard_threshold)
            elif near_dup_method == "simhash":
                from website_indexer_ray.pipelines.textops import simhash_pairs

                pairs = simhash_pairs(
                    filtered_dir, max_hamming=simhash_max_hamming
                )
            else:  # "embedding" (validated at entry)
                # embedding-cosine family: derive hashed-BoW vectors
                # from the cleaned text (a learned encoder drops into
                # the same sink stage), then the LSH-bucketed cosine
                # pair path — no n×n matrix anywhere
                from functools import partial as _partial

                from website_indexer_ray.pipelines.annops import (
                    _embed_text_batch,
                    embedding_dedup_lsh,
                )
                from website_indexer_ray.util import committed_parquet_write

                emb_dir = os.path.join(out_dir, "embeddings")
                emb_data = os.path.join(emb_dir, "embeddings.parquet")
                if not _committed(emb_dir):
                    os.makedirs(emb_dir, exist_ok=True)

                    def embed(b: pa.Table) -> pa.Table:
                        return _embed_text_batch(b, embed_dim).rename_columns(
                            ["vec_id", "embedding"]
                        )

                    committed_parquet_write(
                        read_documents(
                            filtered_dir, columns=["doc_id", "text"]
                        ).map_batches(embed, batch_format="pyarrow"),
                        emb_data,
                    )
                    _commit(emb_dir)
                pairs = embedding_dedup_lsh(
                    emb_dir, threshold=embed_sim_threshold
                ).rename_columns(["doc_a", "doc_b"])
            # near-dup union-find over survivors only: pairs touching
            # an exact/snapshot-dropped doc must not drop its keeper twin
            if len(dropped_exact) and pairs.num_rows:
                a = pairs.column("doc_a").to_numpy(zero_copy_only=False)
                b = pairs.column("doc_b").to_numpy(zero_copy_only=False)
                alive = ~np.isin(a, dropped_exact) & ~np.isin(b, dropped_exact)
                pairs = pairs.filter(pa.array(alive))
            dropped_near = _dropped_from_pairs(pairs)
            dropped = np.union1d(dropped_exact, dropped_near)
            if per_source_quota is not None:
                dropped = np.union1d(
                    dropped,
                    quota_dropped(
                        filtered_data,
                        dropped,
                        per_source_quota,
                        longest=quota_longest,
                    ),
                )
            dropped_ref = ray.put(dropped)

            ev_grams_ref = None
            if decon_max_overlap is not None:
                from website_indexer_ray.pipelines.corpusops import (
                    DECON_N,
                    _EVAL_MOD,
                    _word_ngram_rows,
                )

                if eval_documents is not None:
                    ev_tbl = eval_documents
                else:
                    # stand-in eval split: doc_id % 101 == 0 of the
                    # RAW input (eval membership must not depend on
                    # what the cleaning stages dropped)
                    ev = read_documents(sf_dir, columns=["doc_id", "text"])

                    def _ev_filter(b: pa.Table) -> pa.Table:
                        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                        return b.filter(pa.array(ids % _EVAL_MOD == 0))

                    parts = collect_table_blocks(
                        ev.map_batches(_ev_filter, batch_format="pyarrow")
                    )
                    ev_tbl = (
                        pa.concat_tables(parts)
                        if parts
                        else pa.table({"text": pa.array([], type=pa.string())})
                    )
                _, ev_grams, _ = _word_ngram_rows(ev_tbl.column("text"), DECON_N)
                ev_grams_ref = ray.put(pc.unique(ev_grams))

            logp_ref = None
            if max_ppl is not None:
                from website_indexer_ray.pipelines.corpusops import _lm_model

                logp_ref = ray.put(_lm_model(filtered_dir, None))

            span_map_ref = None
            gate_dropped_ref = None
            if dup_span_k is not None:
                from website_indexer_ray.pipelines.textops import (
                    dup_span_marks,
                    spans_by_doc,
                )

                # A doc the keep pass will drop must not anchor a
                # "first occurrence" (its copy would be the only one
                # kept of a duplicated run). The dedup/quota drop set
                # is known; the decon/ppl/eval gates are per-batch
                # kernels, so when any is active one extra scan
                # collects THEIR dropped ids too before span marking.
                span_exclude = dropped
                if decon_max_overlap is not None or max_ppl is not None:
                    gate_ids = _gate_dropped_ids(
                        filtered_data,
                        decon_max_overlap,
                        ev_grams_ref,
                        max_ppl,
                        logp_ref,
                    )
                    span_exclude = np.union1d(span_exclude, gate_ids)
                    # the keep pass reuses this drop set instead of
                    # re-running the (expensive) gate kernels over the
                    # whole corpus a second time — the pre-scan IS the
                    # gate, mask parity exact by construction
                    gate_dropped_ref = ray.put(gate_ids)
                span_map = spans_by_doc(
                    dup_span_marks(
                        filtered_dir, k=dup_span_k, exclude_ids=span_exclude
                    )
                )
                n_span_docs = len(span_map)
                span_map_ref = ray.put(span_map)

            def keep(batch: pa.Table) -> pa.Table:
                dr = cached_get(dropped_ref)
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                mask = ~np.isin(ids, dr)
                if gate_dropped_ref is not None:
                    # pre-scan already evaluated the decon/ppl/eval
                    # gates for every doc — one isin instead of
                    # re-running the kernels
                    mask &= ~np.isin(ids, cached_get(gate_dropped_ref))
                elif decon_max_overlap is not None:
                    from website_indexer_ray.pipelines.corpusops import (
                        DECON_N,
                        _EVAL_MOD,
                        _eval_overlap_counts,
                    )

                    mask &= ids % _EVAL_MOD != 0  # the eval docs themselves
                    _, overlap = _eval_overlap_counts(
                        batch.column("text"), cached_get(ev_grams_ref), DECON_N
                    )
                    mask &= overlap <= decon_max_overlap
                if gate_dropped_ref is None and max_ppl is not None:
                    from website_indexer_ray.pipelines.corpusops import (
                        _ppl_scores,
                    )

                    _, ppl = _ppl_scores(
                        batch.column("text"), cached_get(logp_ref)
                    )
                    # NaN (no transitions) fails the comparison → drop
                    with np.errstate(invalid="ignore"):
                        mask &= ppl <= max_ppl
                batch = batch.filter(pa.array(mask))
                if batch.num_rows and span_map_ref is not None:
                    from website_indexer_ray.pipelines.textops import (
                        apply_spans_to_texts,
                    )

                    texts = apply_spans_to_texts(
                        batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist(),
                        cached_get(span_map_ref),
                    )
                    batch = batch.set_column(
                        batch.schema.get_field_index("text"),
                        "text",
                        pa.array(texts, type=pa.string()),
                    )
                if batch.num_rows and redact_pii:
                    from website_indexer_ray.pipelines.corpusops import (
                        _redact_text,
                    )

                    batch = batch.set_column(
                        batch.schema.get_field_index("text"),
                        "text",
                        pc.cast(_redact_text(batch.column("text")), pa.string()),
                    )
                if n_shards is not None:
                    from website_indexer_ray.pipelines.corpusops import _MIX_MULT

                    kept_ids = (
                        batch.column("doc_id")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.uint64)
                    )
                    shard = (
                        (kept_ids * np.uint64(_MIX_MULT))
                        % np.uint64(2**32)
                        % np.uint64(n_shards)
                    ).astype(np.int64)
                    batch = batch.append_column(
                        "shard", pa.array(shard, type=pa.int64())
                    )
                return batch

            os.makedirs(kept_dir, exist_ok=True)
            ray.data.read_parquet(filtered_data).map_batches(
                keep, batch_format="pyarrow"
            ).write_parquet(kept_data)
            _commit(kept_dir)
            n_kept = _dir_rows(kept_data)
    else:
        # resumed: recompute only the cheap exact-drop count for stats
        n_after_exact = None

    stages = ["input", "cleaned", "after_exact_dedup", "kept"]
    counts = [n_input, n_cleaned, n_after_exact, n_kept]
    if dup_span_k is not None:
        stages.append("dup_span_affected")
        counts.append(n_span_docs)
    rows = [(s, c) for s, c in zip(stages, counts) if c is not None]
    stats = pa.table(
        {
            "stage": pa.array([r[0] for r in rows], type=pa.string()),
            "n_docs": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(stats, os.path.join(out_dir, "stats.parquet"))
    return stats


# --- crawl → curation bridge -----------------------------------------

def documents_from_crawl(crawl_out: str, dest_dir: str) -> str:
    """Project a finished crawl's interleaved-docs artifact (the
    BASELINE input_hint shape: ``doc_id:string`` URL + span sequence)
    into the curation input shape — ``dest_dir/documents.parquet/``
    with (doc_id:int64, text, source) — so ``curate_corpus(dest_dir,
    ...)`` runs directly on crawl output. This is the composed
    end-to-end story: crawl → bridge → curate → training shards.

      - ``text``: the doc's ``kind == 'text'`` spans joined in span
        order (the cleaned-body spans the parser emitted);
      - ``source``: the URL's lowercased host (feeds per-source quota
        and mix stages);
      - ``doc_id``: 63-bit xxh64 of the URL (collisions negligible);
        ``url`` rides along in the documents output (readers prune it)
        and the (doc_id, url) provenance map is a column-pruned
        projection of THAT parquet — the crawl artifact is read, and
        every URL hashed, exactly once.

    Both outputs go through the engine's commit protocol (resume =
    skip committed), and everything streams — no driver
    materialization of text."""
    from urllib.parse import urlsplit

    from website_indexer_ray.functions.xxh import xxh64
    from website_indexer_ray.pipelines.engine import CrawlResult
    from website_indexer_ray.util import committed_parquet_write

    os.makedirs(dest_dir, exist_ok=True)
    mask63 = (1 << 63) - 1

    def project(batch: pa.Table) -> pa.Table:
        urls = batch.column("doc_id").to_pylist()
        spans = batch.column("spans").to_pylist()
        texts = [
            " ".join(s["text"] for s in sp if s["kind"] == "text")
            for sp in spans
        ]
        return pa.table(
            {
                "doc_id": pa.array(
                    [xxh64(u) & mask63 for u in urls], type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
                "source": pa.array(
                    [urlsplit(u).netloc.lower() for u in urls],
                    type=pa.string(),
                ),
                "url": pa.array(urls, type=pa.string()),
            }
        )

    docs_dir = os.path.join(dest_dir, "documents.parquet")
    committed_parquet_write(
        CrawlResult(crawl_out).ray_docs().map_batches(
            project, batch_format="pyarrow"
        ),
        docs_dir,
    )
    committed_parquet_write(
        ray.data.read_parquet(docs_dir, columns=["doc_id", "url"]),
        os.path.join(dest_dir, "doc_map.parquet"),
    )
    return dest_dir
