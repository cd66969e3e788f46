"""Skew-aware salting of hot host blocks (north_rule): the hot-host
pre-pass finds oversized hosts, salted sub-block keys bound every block's
size, and clustering output is unchanged (LSH carries near-dup recall
across salt boundaries)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def skew_corpus(ray_session, tmp_path_factory):
    from mdmpublic_ray.corpus import write_corpus

    d = str(tmp_path_factory.mktemp("skew") / "corpus")
    # hot_host_frac 0.5 → big-portal owns ~half of all pages
    return write_corpus(d, n_clusters=60, seed=7, hot_host_frac=0.5)


def test_hot_host_pre_pass_finds_the_hot_host(ray_session, skew_corpus):
    import ray.data as rd

    from mdmpublic_ray.stages.blocking import hot_host_sizes
    from mdmpublic_ray.stages.dedup import dedup_latest

    pages = rd.read_parquet(skew_corpus["pages"])
    deduped = dedup_latest(pages, "url", "warc_ts", n_buckets=16)
    hot = hot_host_sizes(deduped.select_columns(["url"]), max_block_size=40)
    assert "big-portal.example" in hot
    assert hot["big-portal.example"] > 40
    # normal sites are far below the threshold
    assert all(h == "big-portal.example" for h in hot)


def test_salting_bounds_block_sizes_and_preserves_clusters(ray_session, skew_corpus):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, pairwise_metrics, run_er

    pages = rd.read_parquet(skew_corpus["pages"])
    cap = 40
    salted = run_er(
        pages, ERConfig(num_partitions=8, n_buckets=16, max_block_size=cap)
    )
    stats = salted["block_stats"].to_pandas()
    # every block (host sub-blocks included) is bounded by the cap plus
    # hash-split slack
    assert stats["n_members"].max() <= 2 * cap, stats.sort_values(
        "n_members"
    ).tail()

    unsalted = run_er(
        pages,
        ERConfig(
            num_partitions=8, n_buckets=16, max_block_size=cap, salt_hot_hosts=False
        ),
    )

    def clusters_of(out) -> set:
        df = out["clusters"].to_pandas()
        return set(df.groupby("cluster_id")["url"].apply(frozenset))

    # same partition either way: salting only redistributes candidate
    # generation; true matches still pair via LSH
    assert clusters_of(salted) == clusters_of(unsalted)

    # and the planted truth holds at F1 == 1.0 with salting on
    labels = rd.read_parquet(skew_corpus["labels"])
    m = pairwise_metrics(salted["clusters"], labels, num_partitions=8)
    assert m["f1"] == 1.0, m


def test_salted_host_emits_pairs_capped_host_does_not(ray_session, skew_corpus):
    """With salting, the hot host contributes same-host candidate pairs
    (bounded); with plain capping it contributes none from the host pass."""
    import ray.data as rd

    from mdmpublic_ray.stages.blocking import (
        block_keys_stage,
        features_stage,
        hot_host_sizes,
    )
    from mdmpublic_ray.stages.dedup import dedup_latest
    from mdmpublic_ray.stages.extract import extract_stage
    from mdmpublic_ray.stages.pairs import candidate_pairs

    pages = rd.read_parquet(skew_corpus["pages"])
    deduped = extract_stage(dedup_latest(pages, "url", "warc_ts", n_buckets=16)).materialize()
    features = features_stage(deduped).materialize()
    cap = 40
    hot = hot_host_sizes(deduped.select_columns(["url"]), cap)

    feats_df = features.to_pandas()
    url_of = dict(zip(feats_df["uid"], feats_df["url"]))

    def host_pairs(blocks) -> int:
        p = candidate_pairs(blocks, max_block_size=cap, n_buckets=16).to_pandas()
        ua = p["uid_a"].map(url_of)
        ub = p["uid_b"].map(url_of)
        return int((ua.str.contains("big-portal") & ub.str.contains("big-portal")).sum())

    salted = block_keys_stage(features, hot_hosts=hot, max_block_size=cap)
    unsalted = block_keys_stage(features, hot_hosts=None, max_block_size=cap)
    n_salted = host_pairs(salted)
    n_unsalted = host_pairs(unsalted)
    # unsalted: big-portal block exceeds the cap → only LSH pairs remain;
    # salted sub-blocks add bounded same-host candidates on top
    assert n_salted > n_unsalted


def test_bucketed_join_hot_key_salting_same_result(ray_session):
    """Generic join salting: on a 90%-one-key skew, the salted join must
    emit EXACTLY the unsalted join's rows (inner and left), while
    spreading the hot key over multiple buckets."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.util import bucketed_join

    rng = np.random.default_rng(7)
    n = 2000
    keys = np.where(rng.random(n) < 0.9, 42, rng.integers(0, 50, n)).astype("int64")
    left = rd.from_arrow(pa.table({"k": keys, "lv": np.arange(n, dtype="int64")}))
    right = rd.from_arrow(
        pa.table(
            {
                "rk": np.array([42, 42, 7, 8, 9], dtype="int64"),
                "rv": np.array([1, 2, 3, 4, 5], dtype="int64"),
            }
        )
    )

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["k", "lv", "rv"], kind="mergesort")
            .reset_index(drop=True)
        )

    for how in ("inner", "left"):
        plain = norm(bucketed_join(left, right, "k", "rk", how=how, n_buckets=16))
        salted = norm(
            bucketed_join(
                left, right, "k", "rk", how=how, n_buckets=16,
                hot_keys={42}, hot_salt=4,
            )
        )
        assert plain.equals(salted), how

    # hot key ABSENT from the right side: every hot left row must still
    # appear exactly once in a left join (spread across sub-buckets, all
    # unmatched)
    def norm2(ds):
        return (
            ds.to_pandas()
            .sort_values(["k", "lv"], kind="mergesort")
            .reset_index(drop=True)
        )

    plain = norm2(bucketed_join(left, right, "k", "rv", how="left", n_buckets=16))
    salted = norm2(
        bucketed_join(left, right, "k", "rv", how="left", n_buckets=16,
                      hot_keys={42}, hot_salt=4)
    )
    assert plain.equals(salted)

    import pytest

    with pytest.raises(ValueError):
        bucketed_join(left, right, "k", "rk", how="outer", hot_keys={42})


def test_bucketed_join_salt_exceeding_buckets_no_duplicates(ray_session):
    """hot_salt > n_buckets previously guaranteed two replicas of a hot
    right row could land in one bucket (sub-bucket residue collision mod
    n_buckets) and duplicate joined rows; the effective salt is now capped
    at n_buckets and residues are consecutive, so the row set is exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.util import bucketed_join

    n = 600
    left = rd.from_arrow(
        pa.table(
            {
                "k": np.full(n, 42, dtype="int64"),
                "lv": np.arange(n, dtype="int64"),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "rk": np.array([42, 42], dtype="int64"),
                "rv": np.array([1, 2], dtype="int64"),
            }
        )
    )

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["k", "lv", "rv"], kind="mergesort")
            .reset_index(drop=True)
        )

    # salt (16) far above bucket count (4): every sub-bucket residue pair
    # would have collided under the old multiplicative spread
    plain = norm(bucketed_join(left, right, "k", "rk", n_buckets=4))
    salted = norm(
        bucketed_join(
            left, right, "k", "rk", n_buckets=4, hot_keys={42}, hot_salt=16
        )
    )
    assert len(plain) == 2 * n
    assert plain.equals(salted)


def test_candidate_pairs_matches_bruteforce(ray_session):
    """The size-class-batched triangle emit equals the brute-force
    per-block enumeration: duplicate (key, uid) rows collapse, oversized
    blocks are capped, uid_a < uid_b, multi-key pairs emitted once."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.pairs import candidate_pairs

    rng = np.random.default_rng(7)
    keys, uids = [], []
    for k in range(40):
        size = int(rng.integers(1, 9)) if k != 5 else 30  # key 5 oversized
        members = rng.choice(200, size=size, replace=False)
        for u in members:
            keys.append(k)
            uids.append(int(u))
            if rng.random() < 0.2:  # duplicate (key, uid) rows
                keys.append(k)
                uids.append(int(u))
    blocks = rd.from_arrow(
        pa.table({"block_key": pa.array(keys, pa.int64()),
                  "uid": pa.array(uids, pa.int64())})
    )
    cap = 10
    got = candidate_pairs(blocks, max_block_size=cap, n_buckets=4).to_pandas()
    got_set = set(zip(got["uid_a"], got["uid_b"]))
    exp = set()
    import collections
    by_key = collections.defaultdict(set)
    for k, u in zip(keys, uids):
        by_key[k].add(u)
    for k, mem in by_key.items():
        if not (2 <= len(mem) <= cap):
            continue
        ms = sorted(mem)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                exp.add((ms[i], ms[j]))
    assert got_set == exp
    assert len(got) == len(got_set)  # globally deduped
    assert (got["uid_a"] < got["uid_b"]).all()
