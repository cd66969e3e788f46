"""Sorted-neighborhood pairing must be EXACT across Ray sort-block
boundaries — the pair set equals a single-scan sliding window over the
global sort order, for any input partitioning."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from mdmpublic_ray.stages.snm import sorted_window_pairs


def brute_pairs(keys: np.ndarray, ids: np.ndarray, window: int) -> set:
    order = np.lexsort((ids, keys))
    ranked = ids[order]
    out = set()
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + window, len(ranked))):
            out.add((int(ranked[i]), int(ranked[j])))
    return out


def got_pairs(ds, window: int, local_rows=0) -> set:
    # local_rows=0 forces the distributed sort + running-tail plan (the
    # web-scale path); the size-aware local plan is asserted equal in
    # test_local_plan_equals_distributed
    res = sorted_window_pairs(
        ds, sort_cols=["k", "id"], id_col="id", window=window,
        local_rows=local_rows,
    ).to_pandas()
    if res.empty:  # zero-row Ray datasets drop their schema via to_pandas
        return set()
    return set(zip(res["id_a"].astype(int), res["id_b"].astype(int)))


@pytest.mark.parametrize("n_parts", [1, 3, 7])
@pytest.mark.parametrize("window", [2, 4, 9])
def test_matches_single_scan(ray_session, n_parts, window):
    rng = np.random.default_rng(7)
    ids = np.arange(200, dtype=np.int64)
    keys = rng.integers(0, 40, size=200).astype(np.int64)  # heavy key ties
    ds = ray.data.from_arrow(pa.table({"id": ids, "k": keys})).repartition(n_parts)
    assert got_pairs(ds, window) == brute_pairs(keys, ids, window)


def test_window_larger_than_blocks(ray_session):
    # window spans several whole sort blocks: running tail must chain
    # through blocks smaller than w-1
    ids = np.arange(12, dtype=np.int64)
    keys = np.zeros(12, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "k": keys})).repartition(10)
    assert got_pairs(ds, 9) == brute_pairs(keys, ids, 9)


def test_tiny_and_invalid(ray_session):
    one = ray.data.from_arrow(
        pa.table({"id": pa.array([5], type=pa.int64()), "k": pa.array([0], type=pa.int64())})
    )
    assert got_pairs(one, 4) == set()
    with pytest.raises(ValueError):
        sorted_window_pairs(one, sort_cols=["k", "id"], id_col="id", window=1)


def test_local_plan_equals_distributed(ray_session):
    """The round-5 size-aware LOCAL plan (driver sort, zero exchange)
    emits the identical pair SET as the distributed range-sort +
    running-tail plan."""
    rng = np.random.default_rng(11)
    ids = np.arange(300, dtype=np.int64)
    keys = rng.integers(0, 50, size=300).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "k": keys})).repartition(5)
    dist = got_pairs(ds, 5, local_rows=0)
    loc = got_pairs(ds, 5, local_rows=10_000)
    assert loc == dist == brute_pairs(keys, ids, 5)
