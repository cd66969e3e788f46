"""HyperLogLog sketch: merge associativity/equivalence, error bound vs
exact distinct counts, and the registered query pair agreeing within the
sketch's standard error."""

import numpy as np
import pytest

from mdmpublic_ray.functions.hll import hll_estimate, hll_fold, hll_merge

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_error_bound(n):
    vals = np.array([f"v{i}" for i in range(n)], dtype=object)
    est = hll_estimate(hll_fold(vals))
    assert abs(est - n) / n < 0.03, (n, est)


def test_split_merge_equals_single_fold():
    vals = np.array([f"x{i}" for i in range(50_000)], dtype=object)
    whole = hll_fold(vals)
    parts = hll_merge([hll_fold(v) for v in np.array_split(vals, 7)])
    assert (whole == parts).all()
    # duplicates across parts change nothing
    with_dups = hll_merge([parts, hll_fold(vals[:1000])])
    assert (with_dups == whole).all()


def test_query_pair_agree(ray_session):
    from mdmpublic_ray.pipelines.queries import QUERIES

    exact = QUERIES["docs_distinct_tokens"](SF)["n_distinct"][0].as_py()
    est = QUERIES["docs_distinct_tokens_hll"](SF)["n_distinct_est"][0].as_py()
    assert exact > 0
    assert abs(est - exact) / exact < 0.03, (exact, est)
