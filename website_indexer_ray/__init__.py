"""website_indexer_ray — a Ray-Data-native crawl/index engine.

A from-scratch distributed URL-frontier + fetch-scheduler engine with
the query and data-processing capabilities of cfpb/website-indexer
(reference at /root/reference, analyzed in SURVEY.md), built on
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow
batches for fetch/parse/span-interleaving, stateful actor pools for
the sharded cuckoo-filter URL-seen set and per-host politeness, and a
generation-based (breadth-first) frontier loop with per-generation
Parquet checkpoints, per-partition lineage, and lossless resume.

Layout:
  functions/  pure functions: xxh64, URL canonicalization, HTML parse
  fixtures/   deterministic synthetic corpus generator + gold oracle
  state/      cuckoo-filter seen-set shards, politeness, robots cache
  stages/     map_batches stages: predicates, seen-claim, fetch+parse,
              frontier expansion
  sources/    corpus/table readers and checkpointed Parquet sinks
  pipelines/  the crawl engine generation loop; query/export layer;
              training-data ops (dedup, ANN, text analysis)
"""

__version__ = "0.1.0"
