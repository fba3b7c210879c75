"""Scale-stress the curation composite one order of magnitude past
the bench corpus: ~50k documents (10x sf0.1) through curate_corpus
for EACH near-dup family (minhash / simhash / embedding), recording
per-stage wall (from the committed-stage checkpoints), the exchange
reducer peaks, and the drop-set sizes the keep pass broadcasts — the
evidence that the composite's state stays proportional to DROPPED
docs, not corpus size.

The corpus is synthesized deterministically (word-salad over the same
vocab/shape as the driver's documents table: 5 langs, 20 sources,
44-600 chars) with planted duplicate structure so every dedup stage
carries real load:
  - 5% exact duplicates (same text as an earlier doc)
  - 10% near duplicates (an earlier doc with a few words swapped)

Usage: python scripts/stress_curate.py [n_docs]
Prints one JSON line per family and a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = (
    # the stopwords give LangIdStage a real signal (as the driver's
    # documents table does); the rest is engine word-salad
    "a the to of and in is batch part spark line column order small "
    "sort fast value scan hash slow group agg filter query big key "
    "window merge join shard block stream table row plan push read "
    "write disk cache net cpu heap spill skew salt probe build"
).split()


def build_documents(n_docs: int, out_path: str) -> None:
    rng = np.random.default_rng(20260818)
    langs = np.array(["en", "es", "de", "fr", "zh"])
    lang_p = np.array([0.42, 0.15, 0.14, 0.14, 0.15])
    texts: list[str] = []
    for i in range(n_docs):
        if i > 100 and i % 20 == 0:  # 5% exact dups
            texts.append(texts[int(rng.integers(0, i - 1))])
            continue
        n_words = int(rng.integers(8, 110))
        words = [ _VOCAB[int(w)] for w in rng.integers(0, len(_VOCAB), n_words) ]
        if i > 100 and i % 10 == 5:  # 10% near dups: perturb an earlier doc
            src = texts[int(rng.integers(0, i - 1))].split()
            if len(src) > 6:
                for _ in range(2):
                    src[int(rng.integers(0, len(src)))] = _VOCAB[
                        int(rng.integers(0, len(_VOCAB)))
                    ]
                words = src
        texts.append(" ".join(words))
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(
                langs[rng.choice(len(langs), n, p=lang_p)], type=pa.string()
            ),
            "source": pa.array(
                [f"src{i % 20}" for i in range(n)], type=pa.string()
            ),
            "n_chars": pa.array(
                [len(t) for t in texts], type=pa.int64()
            ),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(tbl, out_path)


def _stage_walls(out_dir: str) -> dict:
    """Per-stage wall from the committed checkpoints' _SUCCESS mtimes
    (stages run sequentially, so successive commit times bracket each
    stage)."""
    marks = []
    for root, _dirs, files in os.walk(out_dir):
        if "_SUCCESS" in files:
            marks.append(
                (os.path.relpath(root, out_dir),
                 os.path.getmtime(os.path.join(root, "_SUCCESS")))
            )
    marks.sort(key=lambda kv: kv[1])
    out, prev = {}, None
    for name, ts in marks:
        if prev is not None:
            out[name] = round(ts - prev, 2)
        prev = ts
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from website_indexer_ray.pipelines.curate import curate_corpus
    from website_indexer_ray.state.exchange import _pool

    sf_dir = "/tmp/wir_stress/curate_sf"
    docs_path = os.path.join(sf_dir, "documents.parquet")
    t0 = time.monotonic()
    build_documents(n_docs, docs_path)
    print(
        json.dumps(
            {"n_docs": n_docs, "gen_s": round(time.monotonic() - t0, 1)}
        ),
        flush=True,
    )

    shards = _pool(8)
    results = []
    for method in ("minhash", "simhash", "embedding"):
        out_dir = f"/tmp/wir_stress/curate-{method}"
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        ray.get([s.reset_peak.remote() for s in shards])
        t0 = time.monotonic()
        lineage = curate_corpus(sf_dir, out_dir, near_dup_method=method)
        wall = time.monotonic() - t0
        peaks = ray.get([s.peak_bytes.remote() for s in _pool(8)])
        stages = dict(
            zip(
                lineage.column("stage").to_pylist(),
                lineage.column("n_docs").to_pylist(),
            )
        )
        # near-dup drop set = survivors of exact dedup that the keep
        # pass filters out (this is what broadcasts)
        drop_rows = stages.get("after_exact_dedup", 0) - stages.get("kept", 0)
        rec = {
            "metric": f"curate_stress_{method}",
            "n_docs": n_docs,
            "wall_s": round(wall, 1),
            "docs_per_s": round(n_docs / wall, 1),
            "stage_docs": stages,
            "drop_set_rows": drop_rows,
            "stage_walls_s": _stage_walls(out_dir),
            "reducer_peak_mb": round(max(peaks) / 1e6, 1) if peaks else 0.0,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "metric": "curate_stress_summary",
                "n_docs": n_docs,
                "total_s": round(sum(r["wall_s"] for r in results), 1),
                "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
