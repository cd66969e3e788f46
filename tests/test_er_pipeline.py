"""End-to-end entity-resolution pipeline tests on the synthetic corpus."""

import pyarrow.parquet as pq
import pytest

from mdmpublic_ray.pipelines.er import ERConfig, pairwise_metrics, run_er


@pytest.fixture(scope="module")
def er_result(ray_session, corpus_dir):
    import ray.data as rd

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    cfg = ERConfig(num_partitions=8, n_buckets=16)
    out = run_er(pages, cfg)
    return out, corpus_dir


def test_dedup_latest_one_row_per_url(er_result):
    out, corpus_dir = er_result
    truth = pq.read_table(f"{corpus_dir}/truth.parquet")
    deduped = out["deduped"].to_pandas()
    assert len(deduped) == truth.num_rows
    assert deduped["url"].is_unique


def test_extraction_byte_identical_through_ray(er_result):
    """The distributed extraction must equal the ground-truth text (which
    the oracle reproduces) for EVERY url — the BASELINE.json invariant."""
    out, corpus_dir = er_result
    pages = pq.read_table(f"{corpus_dir}/pages.parquet")
    # ground truth text for the LATEST crawl of each url (texts of a url's
    # crawls are identical in the corpus)
    want = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    got = out["deduped"].to_pandas()
    assert len(got) > 0
    for url, text in zip(got["url"], got["text"]):
        assert text == want[url], f"extraction mismatch for {url}"


def test_blocking_recall_and_pairs(er_result):
    out, _ = er_result
    pairs = out["pairs"].to_pandas()
    assert len(pairs) > 0
    assert (pairs["uid_a"] < pairs["uid_b"]).all()
    assert not pairs.duplicated(["uid_a", "uid_b"]).any()
    # every uid resolves to exactly one url in the features table
    feats = out["features"].to_pandas()
    assert feats["uid"].is_unique
    known = set(feats["uid"])
    assert set(pairs["uid_a"]).issubset(known)
    assert set(pairs["uid_b"]).issubset(known)


def test_f1_at_least_099(er_result):
    import ray.data as rd

    out, corpus_dir = er_result
    labels = rd.read_parquet(f"{corpus_dir}/labels.parquet")
    m = pairwise_metrics(out["clusters"], labels, num_partitions=8)
    assert m["tp"] + m["fn"] > 0
    assert m["f1"] >= 0.99, m


def test_clusters_match_planted_truth(er_result):
    """Predicted clustering must equal the planted partition (not just F1
    on sampled labels): same set of url-groups."""
    out, corpus_dir = er_result
    truth = pq.read_table(f"{corpus_dir}/truth.parquet").to_pandas()
    pred = out["clusters"].to_pandas()
    t = truth.groupby("cluster_id")["url"].apply(frozenset)
    p = pred.groupby("cluster_id")["url"].apply(frozenset)
    assert set(t) == set(p)


def test_golden_records(er_result):
    out, corpus_dir = er_result
    golden = out["golden"].to_pandas()
    truth = pq.read_table(f"{corpus_dir}/truth.parquet").to_pandas()
    assert len(golden) == truth["cluster_id"].nunique()
    assert golden["cluster_id"].is_unique
    assert (golden["n_members"] >= 1).all()
    # canonical url is a member of its own cluster
    pred = out["clusters"].to_pandas().set_index("url")["cluster_id"]
    for cid, cu in zip(golden["cluster_id"], golden["canonical_url"]):
        assert pred[cu] == cid


def test_contested_dedup_branch_preserves_schema(ray_session):
    """The opt-in contested-key dedup path unions a pandas-round-tripped
    branch with pass-through Arrow blocks; both must carry the INPUT
    schema (timestamp[us] stays us, not ns) or downstream unification
    breaks."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.dedup import dedup_latest

    ts = pa.array(
        [dt.datetime(2024, 1, 1, i) for i in range(6)], pa.timestamp("us")
    )
    tbl = pa.table(
        {
            "url": pa.array(["a", "a", "b", "c", "d", "e"]),
            "warc_ts": ts,
            "text": pa.array([f"t{i}" for i in range(6)]),
        }
    )
    out = dedup_latest(
        rd.from_arrow(tbl), "url", "warc_ts", broadcast_threshold=100
    )
    got = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    assert got.schema.field("warc_ts").type == pa.timestamp("us")
    assert got.num_rows == 5  # "a" deduped to its latest crawl
    latest_a = got.filter(pa.compute.equal(got["url"], "a"))
    assert latest_a["text"].to_pylist() == ["t1"]


def test_blocking_metrics(er_result):
    """Blocking quality on the planted corpus: completeness must be 1.0
    (downstream F1=1.0 requires it), candidates must prune most of the
    all-pairs space, and the counter identities must hold."""
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import blocking_metrics

    out, corpus_dir = er_result
    truth = rd.read_parquet(f"{corpus_dir}/truth.parquet")
    m = blocking_metrics(out["pairs"], truth)
    assert m["pair_completeness"] == 1.0
    assert m["n_true_pairs"] > 0
    assert m["true_in_candidates"] == m["n_true_pairs"]
    assert 0 < m["n_candidates"] < m["n_docs"] * (m["n_docs"] - 1) // 2
    assert m["reduction_ratio"] > 0.5
    assert 0.0 < m["pair_quality"] <= 1.0


def test_snm_pass_superset_and_f1(ray_session, corpus_dir, er_result):
    """snm_window on: candidate pairs are a superset of the default
    two-pass blocking and F1 stays 1.0 (SNM adds recall candidates; the
    scorer keeps precision)."""
    import ray.data as rd

    base_out, _ = er_result
    base_pairs = base_out["pairs"].to_pandas()
    base_set = set(zip(base_pairs["uid_a"], base_pairs["uid_b"]))

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    cfg = ERConfig(num_partitions=8, n_buckets=16, snm_window=4)
    out = run_er(pages, cfg)
    p = out["pairs"].to_pandas()
    snm_set = set(zip(p["uid_a"], p["uid_b"]))
    assert base_set <= snm_set
    assert len(snm_set) > len(base_set)  # the window adds new candidates
    assert len(snm_set) == len(p)  # still globally deduped

    labels = rd.read_parquet(f"{corpus_dir}/labels.parquet")
    m = pairwise_metrics(out["clusters"], labels)
    assert m["f1"] >= 0.99


def test_threshold_sweep(er_result):
    """Tuning curve: exact counter accounting at every threshold, perfect
    F1 at the shipped threshold on the planted corpus, monotone recall."""
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import threshold_sweep

    out, corpus_dir = er_result
    labels = rd.read_parquet(f"{corpus_dir}/labels.parquet")
    sw = threshold_sweep(out["scored"], labels, [0.1, 0.35, 0.9])
    assert list(sw["threshold"]) == [0.1, 0.35, 0.9]
    assert sw.loc[sw.threshold == 0.35, "f1"].iloc[0] == 1.0
    # every labeled pair is accounted for at every threshold
    n = labels.count()
    assert ((sw.tp + sw.fp + sw.fn + sw.tn) == n).all()
    # raising the threshold can only lose matches
    assert sw["recall"].is_monotonic_decreasing
    assert sw["tn"].is_monotonic_increasing


def test_bcubed_metrics(er_result, ray_session):
    """B³ = 1.0 on the planted corpus; known fractional values on a
    hand-built misclustering (truth {a,b},{c}; predicted {a},{b,c})."""
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import bcubed_metrics

    out, corpus_dir = er_result
    truth = rd.read_parquet(f"{corpus_dir}/truth.parquet")
    m = bcubed_metrics(out["clusters"], truth)
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["f1"] == 1.0
    assert m["n"] == truth.count()

    pred = rd.from_arrow(pa.table(
        {"url": ["a", "b", "c"], "cluster_id": ["1", "2", "2"]}
    ))
    tru = rd.from_arrow(pa.table(
        {"url": ["a", "b", "c"], "cluster_id": ["x", "x", "y"]}
    ))
    m = bcubed_metrics(pred, tru, num_partitions=4)
    assert abs(m["precision"] - 2 / 3) < 1e-12
    assert abs(m["recall"] - 2 / 3) < 1e-12
    assert m["n"] == 3


def test_uncertain_pairs(er_result):
    """Labeling queue: bounded, inside the margin, deterministic order."""
    from mdmpublic_ray.pipelines.er import ERConfig, uncertain_pairs

    out, _ = er_result
    thr = ERConfig().threshold
    q = uncertain_pairs(out["scored"], threshold=thr, margin=0.2, k=25).to_pandas()
    assert 0 < len(q) <= 25
    assert (q["dist"] <= 0.2).all()
    assert (q["dist"].to_numpy() == abs(q["score"].to_numpy() - thr)).all()
    assert q["dist"].is_monotonic_increasing
    q2 = uncertain_pairs(out["scored"], threshold=thr, margin=0.2, k=25).to_pandas()
    assert q.equals(q2)
