"""Cuckoo filter for the URL-seen set (north_rule).

The reference keeps its URL-seen state as Python lists with O(n)
membership scans plus wpull's SQLite URLTable
(/root/reference/crawler/wpull/plugin.py:81-82,104-106,153-156). At
10^10-URL frontier scale that must become a compact probabilistic
membership structure sharded across actors. A cuckoo filter (Fan et
al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014) is
chosen over a Bloom filter because the reference's external-site
re-enqueue semantics delete entries (URLTable.remove_many,
plugin.py:153-156) — cuckoo filters support deletion, Bloom filters
don't.

Layout: ``nbuckets × bucket_size`` uint16 fingerprints in a numpy
array (0 = empty sentinel). ~2 bytes/key ⇒ 10^10 keys ≈ 20 GB spread
over 32-128 shard actors on a real cluster. Each SeenShard actor pairs
the filter with an exact Python set that arbitrates the filter's false
positives and provides exact snapshots for checkpoint/resume — the
exact set is the Parquet/Lance seen-snapshot's in-memory twin.
"""

from __future__ import annotations

import numpy as np

_FP_MASK = 0xFFFF


def _fp_hash(fp: int) -> int:
    # splitmix64-style scramble of the fingerprint for the alt bucket.
    h = (fp * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 31
    return h


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4, max_kicks: int = 500, seed: int = 7):
        nbuckets = 1
        while nbuckets * bucket_size * 0.95 < capacity:
            nbuckets *= 2
        self.nbuckets = nbuckets
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.table = np.zeros((nbuckets, bucket_size), dtype=np.uint16)
        self.size = 0
        self._rng = np.random.default_rng(seed)

    def _slots(self, h: int) -> tuple[int, int, int]:
        fp = (h >> 48) & _FP_MASK
        if fp == 0:
            fp = 1
        i1 = h & (self.nbuckets - 1)
        i2 = (i1 ^ _fp_hash(fp)) & (self.nbuckets - 1)
        return fp, i1, i2

    def contains(self, h: int) -> bool:
        fp, i1, i2 = self._slots(h)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def insert(self, h: int) -> bool:
        fp, i1, i2 = self._slots(h)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        # kick loop
        i = i1 if self._rng.integers(2) else i2
        cur = fp
        for _ in range(self.max_kicks):
            j = int(self._rng.integers(self.bucket_size))
            cur, self.table[i][j] = int(self.table[i][j]), cur
            i = (i ^ _fp_hash(cur)) & (self.nbuckets - 1)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.size += 1
                return True
        return False  # table full — caller should resize/reshard

    def delete(self, h: int) -> bool:
        fp, i1, i2 = self._slots(h)
        for i in (i1, i2):
            row = self.table[i]
            hit = np.nonzero(row == fp)[0]
            if len(hit):
                row[hit[0]] = 0
                self.size -= 1
                return True
        return False
