"""Bucketed feature-store scoring path (stages/featurestore.py): output
equality vs the broadcast scorer, bucket routing, probe-miss detection,
and the worker-local decode cache."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mdmpublic_ray.stages.featurestore import (
    _BUCKET_CACHE,
    _load_bucket,
    fs_bucket_of,
    read_store_meta,
    score_pairs_store,
    write_feature_store,
)
from mdmpublic_ray.stages.scoring import DEFAULT_THRESHOLD


@pytest.fixture(scope="module")
def er_bits(ray_session, corpus_dir):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, run_er

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    out = run_er(pages, ERConfig(num_partitions=8, n_buckets=16))
    return out


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(["url_a", "url_b"], kind="mergesort").reset_index(drop=True)


def test_fs_bucket_of_deterministic_and_in_range():
    uids = np.array([-5, 0, 3, 2**62, -(2**62)], dtype=np.int64)
    b1 = fs_bucket_of(uids, 7)
    b2 = fs_bucket_of(uids.copy(), 7)
    assert np.array_equal(b1, b2)
    assert ((b1 >= 0) & (b1 < 7)).all()


def test_store_scoring_matches_broadcast(er_bits, tmp_path):
    """The store-probe plan must emit the exact same scored rows as the
    broadcast plan — same kernels, different physical data movement."""
    store = str(tmp_path / "store")
    meta = write_feature_store(er_bits["features"], store, n_buckets=5)
    assert read_store_meta(store) == meta
    got = score_pairs_store(
        er_bits["pairs"], store, threshold=DEFAULT_THRESHOLD
    ).to_pandas()
    want = er_bits["scored"].to_pandas()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_bucket_files_route_by_uid(er_bits, tmp_path):
    import pyarrow.parquet as pq

    store = str(tmp_path / "store2")
    write_feature_store(er_bits["features"], store, n_buckets=3)
    for k in range(3):
        t = pq.read_table(f"{store}/fs_bucket={k}", columns=["uid"])
        if t.num_rows:
            uids = t["uid"].to_numpy(zero_copy_only=False)
            assert (fs_bucket_of(uids, 3) == k).all()


def test_load_bucket_cache_hit(er_bits, tmp_path):
    store = str(tmp_path / "store3")
    write_feature_store(er_bits["features"], store, n_buckets=2)
    _BUCKET_CACHE.clear()
    p1 = _load_bucket(store, 0, 160)
    p2 = _load_bucket(store, 0, 160)
    assert p1 is p2  # cache hit returns the same decoded payload
    # eviction: fill past capacity, oldest key drops
    for k in range(1, 2):
        _load_bucket(store, k, 160)
    assert len(_BUCKET_CACHE) <= 4
    _BUCKET_CACHE.clear()


def test_score_pairs_dispatches_to_store(er_bits, tmp_path):
    """score_pairs(feature_store_dir=...) past the broadcast threshold
    writes the store if absent and produces the broadcast-identical
    result (the run_er wiring: cfg.checkpoint_dir/<run_id>/feature_store)."""
    import os

    from mdmpublic_ray.stages.featurestore import META_NAME
    from mdmpublic_ray.stages.scoring import score_pairs

    store = str(tmp_path / "auto_store")
    got = score_pairs(
        er_bits["pairs"],
        er_bits["features"],
        threshold=DEFAULT_THRESHOLD,
        broadcast_threshold=0,  # force past broadcast
        feature_store_dir=store,
    ).to_pandas()
    assert os.path.exists(os.path.join(store, META_NAME))  # written on demand
    want = er_bits["scored"].to_pandas()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_probe_miss_raises(er_bits, tmp_path):
    import ray.data as rd

    store = str(tmp_path / "store4")
    write_feature_store(er_bits["features"], store, n_buckets=2)
    bogus = rd.from_arrow(
        pa.table(
            {
                "uid_a": pa.array([123456789], pa.int64()),
                "uid_b": pa.array([987654321], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="probe miss"):
        score_pairs_store(bogus, store, threshold=DEFAULT_THRESHOLD).to_pandas()
