"""Misra-Gries heavy hitters: undercount bound, merge soundness, and
agreement with the exact oracled top-k operator."""

import numpy as np
import pytest

from mdmpublic_ray.functions.heavyhitters import mg_fold, mg_merge, mg_topk

SF = "/root/testdata/sf0.01"


def test_undercount_bound_and_guarantee():
    rng = np.random.default_rng(9)
    # zipf-ish stream: few heavy items + long tail
    heavy = np.repeat([f"h{i}" for i in range(10)], 5000)
    tail = np.array([f"t{i}" for i in rng.integers(0, 200_000, 100_000)])
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    cap = 1000
    counts, err = mg_fold(stream, cap)
    assert err <= len(stream) // cap
    # every heavy item (freq 5000 > err) must be present, undercounted ≤ err
    for i in range(10):
        assert f"h{i}" in counts
        assert 5000 - err <= counts[f"h{i}"] <= 5000


def test_merge_preserves_bound():
    a = np.repeat(["x", "y"], 3000)
    b = np.array([f"z{i}" for i in range(50_000)])
    sa = mg_fold(a, 100)
    sb = mg_fold(b, 100)
    counts, err = mg_merge([sa, sb], 100)
    assert "x" in counts and "y" in counts
    assert 3000 - err <= counts["x"] <= 3000


def test_agrees_with_exact_topk(ray_session):
    from mdmpublic_ray.pipelines.queries import QUERIES

    exact = QUERIES["docs_top_tokens"](SF).to_pandas()
    approx = QUERIES["docs_top_tokens_mg"](SF).to_pandas()
    assert list(approx["token"]) == list(exact["token"])
    # estimated counts are lower bounds within the tracked error
    for (_, er), (_, ar) in zip(exact.iterrows(), approx.iterrows()):
        assert ar["n_est"] <= er["n"] <= ar["n_est"] + ar["err_bound"]
