"""The size-aware physical-plan choices (broadcast scorer vs two-sided
shuffle join; local union-find finish vs distributed label-propagation
rounds) must be RESULT-INVARIANT: same scored pairs, same clusters,
whichever path the planner picks."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def small_er(ray_session, corpus_dir):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, run_er

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    out = run_er(pages, ERConfig(num_partitions=8, n_buckets=16))
    return out


def test_broadcast_and_shuffle_scoring_agree(ray_session, small_er):
    from mdmpublic_ray.stages.scoring import score_pairs

    pairs = small_er["pairs"].materialize()
    features = small_er["features"].materialize()
    cols = ["url_a", "url_b", "jaccard", "jw_title", "jw_url", "score", "is_match"]

    def canon(ds) -> pd.DataFrame:
        return (
            ds.to_pandas()[cols]
            .sort_values(["url_a", "url_b"], kind="mergesort")
            .reset_index(drop=True)
        )

    fast = canon(score_pairs(pairs, features, num_partitions=8))
    slow = canon(
        score_pairs(pairs, features, num_partitions=8, broadcast_threshold=0)
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_dedup_broadcast_and_full_shuffle_agree(ray_session, corpus_dir):
    import ray.data as rd

    from mdmpublic_ray.stages.dedup import dedup_latest

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")

    def canon(ds) -> pd.DataFrame:
        return (
            ds.to_pandas()
            .sort_values("url", kind="mergesort")
            .reset_index(drop=True)
        )

    fast = canon(
        dedup_latest(
            pages, "url", "warc_ts", n_buckets=16, broadcast_threshold=1_000_000
        )
    )
    slow = canon(
        dedup_latest(pages, "url", "warc_ts", n_buckets=16, broadcast_threshold=0)
    )
    assert fast["url"].is_unique
    pd.testing.assert_frame_equal(fast, slow)


def test_golden_broadcast_and_join_agree(ray_session, small_er):
    from mdmpublic_ray.stages.golden import golden_records

    clusters = small_er["clusters"].materialize()
    deduped = small_er["deduped"].materialize()

    def canon(ds) -> pd.DataFrame:
        return (
            ds.to_pandas()
            .sort_values("cluster_id", kind="mergesort")
            .reset_index(drop=True)
        )

    fast = canon(golden_records(clusters, deduped, num_partitions=8))
    slow = canon(
        golden_records(clusters, deduped, num_partitions=8, broadcast_threshold=0)
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_local_and_distributed_cc_agree(ray_session, small_er):
    from mdmpublic_ray.stages.cluster import connected_components

    edges = small_er["edges"].materialize()
    nodes = small_er["deduped"].select_columns(["url"]).materialize()

    def canon(ds) -> pd.DataFrame:
        return (
            ds.to_pandas()
            .sort_values("url", kind="mergesort")
            .reset_index(drop=True)
        )

    local = canon(connected_components(edges, nodes, num_partitions=8))
    dist = canon(
        connected_components(edges, nodes, num_partitions=8, local_threshold=0)
    )
    pd.testing.assert_frame_equal(local, dist)
