"""Exact distributed quantiles: the histogram-refinement path must give
EXACTLY the element at rank floor((n-1)*q) of the sorted multiset."""

from fractions import Fraction

import numpy as np
import pytest


QS = [Fraction(1, 4), Fraction(1, 2), Fraction(3, 4), Fraction(9, 10), Fraction(99, 100)]


def _expected(vals, n, qs):
    s = np.sort(vals)
    return [s[int((n - 1) * q.numerator // q.denominator)] for q in qs]


@pytest.mark.parametrize("dist", ["uniform_int", "skewed_int", "float", "few_distinct"])
def test_refinement_matches_sorted_selection(ray_session, dist):
    import ray.data as rd

    from mdmpublic_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(7)
    n = 50_000
    if dist == "uniform_int":
        vals = rng.integers(0, 1_000_000, n)
    elif dist == "skewed_int":
        vals = (rng.pareto(1.5, n) * 1000).astype(np.int64)
    elif dist == "float":
        vals = rng.normal(0.0, 123.4, n)
    else:
        vals = rng.choice([3, 3, 3, 7, 10_000], n)

    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"x": vals})).repartition(16)
    # max_collect=200 forces ≥1 histogram pass (2048 buckets over 50k rows)
    got = exact_quantiles(ds, "x", QS, n_buckets=64, max_collect=200)
    want = _expected(vals, n, QS)
    for (q, gv), wv in zip(got, want):
        assert gv == wv, (dist, float(q), gv, wv)


def test_tiny_and_constant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.quantiles import exact_quantiles

    ds = rd.from_arrow(pa.table({"x": [5] * 1000}))
    got = exact_quantiles(ds, "x", QS, n_buckets=16, max_collect=10)
    assert all(v == 5 for _, v in got)

    ds1 = rd.from_arrow(pa.table({"x": [42]}))
    got1 = exact_quantiles(ds1, "x", [Fraction(1, 2)])
    assert got1[0][1] == 42


@pytest.mark.parametrize("dist", ["uniform_int", "float"])
def test_grouped_refinement_matches_sorted_selection(ray_session, dist):
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.quantiles import grouped_exact_quantiles

    rng = np.random.default_rng(11)
    n = 40_000
    groups = rng.choice(["a", "b", "c", "dd"], n, p=[0.5, 0.3, 0.15, 0.05])
    if dist == "uniform_int":
        vals = rng.integers(0, 500_000, n)
    else:
        vals = rng.normal(10.0, 44.0, n)

    ds = rd.from_arrow(pa.table({"g": groups, "x": vals})).repartition(16)
    # small max_collect forces histogram passes on the bigger groups while
    # the smallest group resolves straight from the collect path
    got = grouped_exact_quantiles(ds, "g", "x", QS, n_buckets=32, max_collect=300)
    by_key = {(g, float(q)): v for g, q, v in got}
    for g in ["a", "b", "c", "dd"]:
        sub = vals[groups == g]
        want = _expected(sub, len(sub), QS)
        for q, wv in zip(QS, want):
            assert by_key[(g, float(q))] == wv, (dist, g, float(q))


def test_grouped_single_member_groups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.quantiles import grouped_exact_quantiles

    ds = rd.from_arrow(pa.table({"g": ["x", "y", "y"], "v": [7, 1, 9]}))
    got = grouped_exact_quantiles(ds, "g", "v", [Fraction(1, 2)])
    assert dict(((g, float(q)), v) for g, q, v in got) == {
        ("x", 0.5): 7,
        ("y", 0.5): 1,
    }
