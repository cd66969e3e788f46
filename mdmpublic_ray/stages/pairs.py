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
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, g in df.groupby("block_key", sort=False):
            n = len(g)
            if n < 2 or n > max_block_size:
                continue
            uids = np.unique(g["uid"].to_numpy())  # sorted; dup keys safe
            n = uids.size
            if n < 2:
                continue
            ii, jj = np.triu_indices(n, k=1)
            out_a.append(uids[ii])
            out_b.append(uids[jj])
        if not out_a:
            return pd.DataFrame({"uid_a": pd.Series([], dtype="int64"),
                                 "uid_b": pd.Series([], dtype="int64")})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        res = pd.DataFrame({"uid_a": a, "uid_b": b})
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
