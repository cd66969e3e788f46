"""MRL quantile summary: rank-error bound, merge equivalence,
determinism, and agreement of the distributed query with the exact
quantile operator."""

import numpy as np
import pytest

from mdmpublic_ray.functions.mrl import (
    mrl_build,
    mrl_from_rows,
    mrl_merge,
    mrl_quantiles,
    mrl_to_rows,
)

QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(values: np.ndarray, q: float, est: float) -> float:
    """|empirical rank of est − target rank| / n."""
    n = values.size
    target = np.floor((n - 1) * q)
    lo = np.searchsorted(np.sort(values), est, side="left")
    hi = np.searchsorted(np.sort(values), est, side="right") - 1
    return min(abs(lo - target), abs(hi - target)) / n


def test_rank_error_bound():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1_000_000, size=200_000).astype(np.float64)
    s = mrl_build(vals, k=256)
    # summary stays bounded: every level holds <= k (+1 leftover)
    assert all(lv.size <= 257 for lv in s["levels"])
    est = mrl_quantiles(s, QS)
    for q, e in zip(QS, est):
        assert _rank_error(vals, q, e) <= 0.02, (q, e)


def test_merge_matches_single_build_error():
    rng = np.random.default_rng(4)
    vals = rng.exponential(1000, size=100_000)
    parts = np.array_split(vals, 23)
    merged = mrl_build(parts[0], k=128)
    for p in parts[1:]:
        merged = mrl_merge(merged, mrl_build(p, k=128), k=128)
    est = mrl_quantiles(merged, QS)
    for q, e in zip(QS, est):
        assert _rank_error(vals, q, e) <= 0.03, (q, e)


def test_deterministic_and_row_roundtrip():
    vals = np.arange(10_000, dtype=np.float64)[::-1]
    a = mrl_build(vals, k=64)
    b = mrl_build(vals, k=64)
    for la, lb in zip(a["levels"], b["levels"]):
        assert np.array_equal(la, lb)
    lv, vv = mrl_to_rows(a)
    rt = mrl_from_rows(lv, vv)
    got = {i: np.sort(arr) for i, arr in enumerate(rt["levels"]) if arr.size}
    want = {i: np.sort(arr) for i, arr in enumerate(a["levels"]) if arr.size}
    assert got.keys() == want.keys()
    for i in got:
        assert np.array_equal(got[i], want[i])


def test_empty_and_small():
    s = mrl_build([], k=16)
    assert np.isnan(mrl_quantiles(s, [0.5])[0])
    s = mrl_build([7.0], k=16)
    assert mrl_quantiles(s, [0.0, 0.5, 1.0]).tolist() == [7.0, 7.0, 7.0]


def test_query_close_to_exact(ray_session):
    """The distributed MRL query's estimates must sit within 3% rank
    error of the exact quantiles on the sf0.01 corpus."""
    import duckdb

    from mdmpublic_ray.pipelines.queries import QUERIES

    SF = "/root/testdata/sf0.01"
    est = QUERIES["docs_len_quantiles_mrl"](SF).to_pandas()
    vals = (
        duckdb.sql(f"SELECT n_chars FROM read_parquet('{SF}/documents.parquet')")
        .fetchdf()["n_chars"]
        .to_numpy()
        .astype(np.float64)
    )
    for q, e in zip(est["q"], est["n_chars_est"]):
        assert _rank_error(vals, float(q), float(e)) <= 0.03, (q, e)
