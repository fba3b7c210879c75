"""Seen-claim stage: distributed anti-join against the sharded seen set.

The streaming form of the reference's F2/F3 checks
(/root/reference/crawler/wpull/plugin.py:98-106): each batch of
accepted candidates is routed by ``url_hash % n_shards`` to the
SeenShard actor pool; a shard atomically claims unseen URLs, so
exactly one frontier row per URL survives across all concurrently
running batches — a semi/anti join keyed on url_hash with no shuffle
(SURVEY.md §2.5 J5).

The budgeted variant (max_pages > 0) lives in the engine driver loop
because the reference's budget is order-sensitive (plugin.py:88-100):
it must be applied to candidates in canonical (sorted-URL) order.
"""

from __future__ import annotations

import pyarrow as pa

from website_indexer_ray.state.seen import claim_batch


class SeenClaimStage:
    def __init__(self, shard_handles: list):
        self.shards = shard_handles

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        urls = batch.column("url").to_pylist()
        hashes = batch.column("url_hash").to_pylist()
        mask = claim_batch(self.shards, urls, hashes)
        return batch.filter(pa.array(mask))
