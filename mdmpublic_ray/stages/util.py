"""Shared wide-op building blocks: bucketed groupby and partial (combiner)
aggregation — the two patterns that keep shuffles scalable (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_array

DEFAULT_BUCKETS = 64


def default_partitions(cap: int = 32) -> int:
    """Shuffle-partition count sized to the cluster: Ray's hash-shuffle
    join spawns one aggregator actor per partition, so partitions ≫ CPUs
    just buys actor-startup overhead (measured: P=32 join ≈ 3× slower
    than P=8 on an 8-CPU node for small inputs). At real scale callers
    pass an explicit count sized to data volume instead."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus))


def add_bucket(ds, key: str, n_buckets: int = DEFAULT_BUCKETS, out: str = "_bucket"):
    """Deterministic bucket column from a string or integer key column."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if pa.types.is_integer(col.type):
            b = (col.to_numpy(zero_copy_only=False).astype(np.int64) % n_buckets).astype(
                np.int32
            )
        else:
            b = (crc32_array(col.to_pylist()) % np.uint32(n_buckets)).astype(np.int32)
        return batch.append_column(out, pa.array(b))

    return ds.map_batches(f, batch_format="pyarrow")


def bucketed_map_groups(ds, key: str, fn, *, n_buckets: int = DEFAULT_BUCKETS):
    """One shuffle, O(n_buckets) Python calls: ``fn`` receives the whole
    bucket as a pandas DataFrame (all rows whose key hashes to the bucket)
    and must handle per-key grouping itself (vectorized pandas groupby).
    The ``_bucket`` column is already dropped when ``fn`` runs."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=["_bucket"]))

    return add_bucket(ds, key, n_buckets).groupby("_bucket").map_groups(
        run, batch_format="pandas"
    )


def partial_sum_groupby(ds, keys: list[str], sums: dict[str, str], count_as: str | None):
    """Pre-aggregated grouped sum/count (map-side combine → small shuffle).

    ``sums``: {input_col: output_name} summed per group; ``count_as``: name
    for the per-group row count (None to skip). Per-batch pandas partials
    collapse each batch to ≤ |distinct keys in batch| rows BEFORE the
    groupby shuffle — at web scale this is the difference between shuffling
    10^12 rows and shuffling |keys| × #blocks rows.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False)
        agg = g.agg(**{out: (src, "sum") for src, out in sums.items()})
        if count_as:
            agg[count_as] = g.size()["size"].to_numpy()
        return agg

    aggs = [Sum(out, alias_name=out) for out in sums.values()]
    if count_as:
        aggs.append(Sum(count_as, alias_name=count_as))
    return ds.map_batches(partial, batch_format="pandas").groupby(keys).aggregate(*aggs)


def cents(col, scale: int = 100):
    """Exact fixed-point encoding for float money columns (pyarrow array →
    int64). Sums of these are integers ⇒ bit-identical across any
    execution order AND against the DuckDB oracle — see queries.py."""
    import pyarrow.compute as pc

    return pc.cast(pc.round(pc.multiply(col, float(scale))), pa.int64())
