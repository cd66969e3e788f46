"""Vectorized Bloom filter — the at-scale replacement for broadcast
``pc.is_in`` value sets in the incremental-ER map scans.

A delta of 10^9 block keys is too big to ship as an Arrow value set to
every task; a 1%-FP Bloom filter of the same keys is ~1.2 GB of bits —
one ``ray.put``, zero-copy via plasma to every worker on a node.
False positives are TOLERABLE at every site that uses this class (see
``er_incremental._isin_scan(approx_ok=True)``): a false-positive
touched block contains no delta member, so delta-only pair generation
emits nothing from it; a false-positive feature row is dropped by the
pair join. Sites where a false positive would LOSE data (dropping
invalidated rows) must keep the exact set.

Hashing: values are mixed to 64 bits (splitmix64 for integers — pure
numpy, no Python loop; blake2b via ``stable_u64`` for strings), then
k probe positions derive from the classic Kirsch-Mitzenmacher
double-hash h1 + i*h2 (mod m), so membership tests cost k gathers over
a shared bit array regardless of set size.
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import stable_u64

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a well-mixed 64-bit permutation."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _to_u64(values) -> np.ndarray:
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return arr.astype(np.uint64, copy=False)
    # strings: stable 64-bit content hash (blake2b prefix) per value —
    # build-side cost only; probes re-hash their own (delta-sized) side
    return np.array([stable_u64(v) for v in arr], dtype=np.uint64)


class BloomFilter:
    """Fixed-size Bloom filter over 64-bit value hashes.

    ``m`` bits / ``k`` probes sized for ``capacity`` items at ``fp_rate``;
    the bit array is a numpy uint8 buffer → zero-copy through the Ray
    object store.
    """

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, int(capacity))
        m = int(math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = np.uint64(max(64, m))
        self.k = max(1, int(round(m / capacity * math.log(2))))
        self.bits = np.zeros((int(self.m) + 7) // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = _splitmix64(hashes)
        h2 = _splitmix64(hashes ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) & _MASK) % self.m

    def add_many(self, values) -> "BloomFilter":
        pos = self._positions(_to_u64(values)).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return self

    def contains_many(self, values) -> np.ndarray:
        """Vectorized membership: bool array; NEVER a false negative."""
        arr = _to_u64(values)
        if arr.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(arr)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return hit.all(axis=0).astype(bool)

    @classmethod
    def build(cls, values, fp_rate: float = 0.01) -> "BloomFilter":
        arr = np.asarray(values)
        return cls(arr.size, fp_rate).add_many(arr)
