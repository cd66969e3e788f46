"""Bloom filter: no false negatives ever, bounded false-positive rate,
and the forced-Bloom incremental path equals the exact-set path."""

import numpy as np
import pytest

from mdmpublic_ray.functions.bloom import BloomFilter


def test_no_false_negatives_int64():
    rng = np.random.default_rng(3)
    vals = rng.integers(-(2**62), 2**62, 50_000)
    bf = BloomFilter.build(vals, fp_rate=0.01)
    assert bf.contains_many(vals).all()


def test_fp_rate_bounded():
    rng = np.random.default_rng(4)
    member = rng.integers(0, 2**62, 100_000)
    bf = BloomFilter.build(member, fp_rate=0.01)
    probe = rng.integers(-(2**62), -1, 200_000)  # disjoint range
    fp = bf.contains_many(probe).mean()
    assert fp < 0.03, fp


def test_strings_and_empty():
    bf = BloomFilter.build(np.array(["alpha", "beta", "gamma"]))
    assert bf.contains_many(np.array(["alpha", "beta", "gamma"])).all()
    assert not bf.contains_many(np.array(["delta"]))[0] or True  # FP possible
    assert bf.contains_many(np.array([], dtype=object)).size == 0


def test_incremental_bloom_path_equals_exact(ray_session, tmp_path, monkeypatch):
    """Force the Bloom route for the FP-tolerant filters (BLOOM_MIN=0):
    the incremental result must still equal the full combined run."""
    import pandas as pd
    import ray.data as rd

    import mdmpublic_ray.pipelines.er_incremental as inc_mod
    from mdmpublic_ray.corpus import generate_pages, split_base_delta
    from mdmpublic_ray.pipelines.er import ERConfig, run_er

    pages, _, _ = generate_pages(n_clusters=40, seed=21)
    base, delta = split_base_delta(pages)
    state = str(tmp_path / "state")
    cfg = lambda ck=None, rid="base": ERConfig(
        num_partitions=8, n_buckets=16, checkpoint_dir=ck, run_id=rid
    )
    run_er(rd.from_arrow(base), cfg(state, "base"))

    monkeypatch.setattr(inc_mod, "BLOOM_MIN", 0)
    inc = inc_mod.run_er_incremental(
        rd.from_arrow(delta), cfg(), state_dir=state, prev_run_id="base"
    )
    full = run_er(rd.from_arrow(pages), cfg())

    def cdf(out):
        return (
            out["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(cdf(inc), cdf(full))
