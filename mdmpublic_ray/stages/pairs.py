"""Candidate-pair generation within blocks, with per-block caps and pair
dedup (SURVEY.md §2.4 J8, §7.3 "pair dedup" shuffle).

Skew strategy (north_rule "explicit skew-aware salting"): blocking keys are
recall keys, so randomly salting a block would silently LOSE cross-salt
pairs. Instead oversized blocks (giant hosts — the Common-Crawl reality)
are **capped**: blocks over ``max_block_size`` emit no pairs from the host
pass and are counted, because the LSH pass still pairs every near-duplicate
inside them; LSH buckets are naturally small (band collisions). Dropped
blocks are reported via ``block_size_stats`` — no silent truncation.

The bucketed-groupby pattern (see dedup.py) keeps Python overhead at
O(num_buckets), not O(num_blocks): within one bucket a pandas groupby walks
only multi-member blocks and emits pairs via numpy triangle indices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_array

# Pair cost is O(s²) per block: 256 → ≤32k pairs per block. Hot hosts
# (the planted big-portal skew: 2000 pages on one host) are capped OUT of
# the host pass — their near-duplicates are still paired by the LSH pass,
# whose bucket sizes are bounded by text similarity, not site size.
DEFAULT_MAX_BLOCK = 256
DEFAULT_BUCKETS = 64


def candidate_pairs(
    blocks_ds,
    *,
    max_block_size: int = DEFAULT_MAX_BLOCK,
    n_buckets: int = DEFAULT_BUCKETS,
):
    """blocks(block_key, uid) → pairs(uid_a, uid_b) deduped.

    uid_a < uid_b numerically (stable pair identity; urls are resolved
    back from the features table at scoring). A pair discovered by
    several keys (host + multiple LSH bands) is emitted once.
    """

    from .util import add_bucket as util_add_bucket

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized triangle emit, zero per-block Python: one lexsort
        lays the bucket out block-major with uids sorted (and dedups
        (key, uid) repeats), then blocks are batched BY SIZE — one
        gather + one triu per distinct block size (≤ max_block_size
        classes) instead of a Python visit per block. The former pandas
        groupby paid per-group overhead for every singleton LSH band —
        the overwhelming majority of keys."""
        bk = df["block_key"].to_numpy()
        uid = df["uid"].to_numpy()
        order = np.lexsort((uid, bk))
        bk_s = bk[order]
        uid_s = uid[order]
        if bk_s.size:
            keep = np.ones(bk_s.size, dtype=bool)
            keep[1:] = (bk_s[1:] != bk_s[:-1]) | (uid_s[1:] != uid_s[:-1])
            bk_s = bk_s[keep]
            uid_s = uid_s[keep]
        starts = np.flatnonzero(np.r_[True, bk_s[1:] != bk_s[:-1]]) if bk_s.size else np.empty(0, np.int64)
        sizes = np.diff(np.r_[starts, bk_s.size])
        ok = (sizes >= 2) & (sizes <= max_block_size)
        starts = starts[ok]
        sizes = sizes[ok]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s in np.unique(sizes):
            st = starts[sizes == s]
            mat = uid_s[st[:, None] + np.arange(int(s))]
            ii, jj = np.triu_indices(int(s), k=1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return pd.DataFrame({"uid_a": pd.Series([], dtype="int64"),
                                 "uid_b": pd.Series([], dtype="int64")})
        res = pd.DataFrame(
            {"uid_a": np.concatenate(out_a), "uid_b": np.concatenate(out_b)}
        )
        # within-bucket dedup (same pair via several keys in this bucket)
        return res.drop_duplicates()

    pairs = (
        util_add_bucket(blocks_ds, "block_key", n_buckets)
        .groupby("_bucket")
        .map_groups(gen, batch_format="pandas")
    )
    return dedup_pairs(pairs, n_buckets=n_buckets)


def dedup_pairs(pairs_ds, *, n_buckets: int = DEFAULT_BUCKETS):
    """Global pair dedup: bucket on uid_a then one groupby; per-batch
    partial dedup first (combiner). Integer keys: bucket assignment and
    dedup are vectorized numpy/pandas, no string hashing."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["uid_a", "uid_b"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (
            batch["uid_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            % n_buckets
        ).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["uid_a", "uid_b"]).drop(columns=["_bucket"])

    return (
        pairs_ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
    )
