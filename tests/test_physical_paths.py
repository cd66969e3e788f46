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

    # winner-broadcast path (zero full-row exchange): identical rows
    winner = canon(
        dedup_latest(
            pages.materialize(), "url", "warc_ts", n_buckets=16,
            winner_broadcast_rows=1_000_000,
        )
    )
    pd.testing.assert_frame_equal(winner, slow)


def test_dedup_winner_broadcast_tie_break(ray_session):
    """Two rows at the same (url, max ts) with different payloads must get
    the classic deterministic tie-break (full-column sort, keep last) —
    the winner path routes exactly those keys through the shuffle."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.dedup import dedup_latest

    t0 = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "url": pa.array(["u1", "u1", "u1", "u2", "u3"]),
            "warc_ts": pa.array(
                [t0, t0, dt.datetime(2023, 1, 1), t0, t0], pa.timestamp("us")
            ),
            "text": pa.array(["bbb", "aaa", "older", "t2", "t3"]),
        }
    )
    classic = (
        dedup_latest(rd.from_arrow(t), "url", "warc_ts")
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    winner = (
        dedup_latest(
            rd.from_arrow(t).materialize(), "url", "warc_ts",
            winner_broadcast_rows=10,
        )
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert classic.equals(winner)
    assert winner.loc[winner.url == "u1", "text"].item() == "bbb"


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
    # local_threshold=0 falls through to the MEDIUM plan (int-rank
    # driver closure); zeroing the int caps too forces the distributed
    # min-label rounds — all three must agree bit-for-bit
    medium = canon(
        connected_components(edges, nodes, num_partitions=8, local_threshold=0)
    )
    dist = canon(
        connected_components(
            edges,
            nodes,
            num_partitions=8,
            local_threshold=0,
            int_cc_max_nodes=0,
            int_cc_max_edges=0,
        )
    )
    pd.testing.assert_frame_equal(local, medium)
    pd.testing.assert_frame_equal(local, dist)


def test_cc_caps_derive_from_driver_memory(monkeypatch):
    """Round-3 review item #8: the CC plan caps scale with the driver
    node's memory instead of being hard 128-GiB constants."""
    from mdmpublic_ray.stages.cluster import _default_cc_caps

    monkeypatch.setenv("MDMPUBLIC_DRIVER_MEM_BYTES", str(128 << 30))
    assert _default_cc_caps() == (1_000_000, 8_000_000, 100_000_000)
    monkeypatch.setenv("MDMPUBLIC_DRIVER_MEM_BYTES", str(4 << 30))
    lt, mn, me = _default_cc_caps()
    assert (lt, mn, me) == (31_250, 250_000, 3_125_000)
    # floors hold on an absurdly small driver
    monkeypatch.setenv("MDMPUBLIC_DRIVER_MEM_BYTES", str(1 << 20))
    assert _default_cc_caps() == (10_000, 100_000, 1_000_000)


def test_cc_4gib_driver_routes_to_distributed_plan(ray_session, monkeypatch):
    """On a simulated 4-GiB driver, a graph that a 128-GiB driver would
    close locally (far under 1M edges) must route to the DISTRIBUTED
    min-label rounds: its 270k distinct endpoints exceed the scaled
    medium-plan cap (250k) and its 135k edges exceed the scaled local
    cap (31k). The driver-closure paths are stubbed to fail loudly, and
    the distributed result is verified exactly."""
    import pyarrow as pa
    import ray.data as rd

    import mdmpublic_ray.stages.cluster as cluster

    monkeypatch.setenv("MDMPUBLIC_DRIVER_MEM_BYTES", str(4 << 30))

    def _boom(*a, **k):
        raise AssertionError("driver-side CC plan chosen on a 4-GiB driver")

    monkeypatch.setattr(cluster, "_local_components", _boom)
    monkeypatch.setattr(cluster, "_int_edge_components", _boom)

    n_pairs = 135_000  # 270k endpoints > 250k cap; 135k edges > 31k cap
    urls = [f"u{i:07d}" for i in range(2 * n_pairs)]
    edges = rd.from_arrow(
        pa.table(
            {
                "url_a": pa.array(urls[0::2]),
                "url_b": pa.array(urls[1::2]),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"url": pa.array(urls)}))
    out = cluster.connected_components(edges, nodes, num_partitions=8).to_pandas()
    assert len(out) == 2 * n_pairs
    got = out.set_index("url")["cluster_id"]
    # each disjoint pair clusters to its lexicographic-min member
    for i in (0, 1, 2 * n_pairs - 2, 2 * n_pairs - 1):
        assert got[urls[i]] == urls[i - (i % 2)]
