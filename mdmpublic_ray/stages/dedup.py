"""Deduplication stages: dedup-latest, exact-hash dedup, MinHash-LSH,
SimHash, n-gram-Jaccard near-dup (SURVEY.md §2.6 T5, §2.7 D1-D5).

All wide steps use the **bucketed groupby** pattern: a deterministic
``bucket = crc32(key) % P`` column is added in a vectorized map, then
``groupby("bucket").map_groups`` runs ONE vectorized pandas/pyarrow body
per bucket instead of one Python call per key-group. One shuffle, bounded
Python overhead — this is the shape that survives 10^12 rows (the number
of groups seen by Ray equals P, not the key cardinality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_array

DEFAULT_BUCKETS = 64


def _add_bucket(ds, key: str, n_buckets: int):
    def f(batch: pa.Table) -> pa.Table:
        b = crc32_array(batch[key].to_pylist()) % np.uint32(n_buckets)
        return batch.append_column("_bucket", pa.array(b.astype(np.int32)))

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_latest(ds, key: str = "url", ts_col: str = "warc_ts", *, n_buckets: int = DEFAULT_BUCKETS):
    """Keep the row with max ``ts_col`` per ``key`` — re-crawled pages keep
    only the newest crawl (SURVEY.md §2.6 T5; the first shuffle of the ER
    pipeline). Deterministic tie-break: ties on ts keep the row whose
    remaining columns sort first (pandas stable sort by [key, ts]).

    Two phases: (1) per-batch partial dedup inside ``map_batches`` cuts
    re-crawl duplicates before the shuffle (combiner, SURVEY §4.2);
    (2) bucketed groupby finishes globally.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        return df.drop_duplicates(subset=[key], keep="last")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        return df.drop_duplicates(subset=[key], keep="last").drop(columns=["_bucket"])

    ds = ds.map_batches(partial, batch_format="pandas")
    ds = _add_bucket(ds, key, n_buckets)
    return ds.groupby("_bucket").map_groups(final, batch_format="pandas")


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *, n_buckets: int = DEFAULT_BUCKETS):
    """Exact-content dedup: md5(text) hash-partition + per-group min id
    (SURVEY.md §2.7 D3/D4; manifest-skip analog ``s3sync.sh:47-51``).

    Output: one row per distinct text — the one with the smallest id —
    plus ``dup_count`` (how many rows shared the content).
    """
    from ..functions.hashing import content_digest

    def add_hash(batch: pa.Table) -> pa.Table:
        h = pa.array([content_digest(t) for t in batch[text_col].to_pylist()])
        return batch.append_column("_h", h)

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col], kind="mergesort")
        counts = df.groupby("_h", sort=False)[id_col].transform("size")
        df = df.assign(dup_count=counts.astype("int64"))
        out = df.drop_duplicates(subset=["_h"], keep="first")
        return out.drop(columns=["_bucket", "_h"])

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    ds = _add_bucket(ds, "_h", n_buckets)
    return ds.groupby("_bucket").map_groups(keep_min, batch_format="pandas")
