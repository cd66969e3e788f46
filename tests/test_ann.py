"""ANN / embedding-similarity stages: exact near-dup parity vs DuckDB,
and recall of the LSH-bucketed approximate path vs the brute-force
baseline (SURVEY.md §2.7 D5 embedding cousin; ST5 scorer pattern)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


@pytest.fixture(scope="module")
def brute(ray_session):
    from mdmpublic_ray.stages.ann import knn_cosine

    return _to_pandas(knn_cosine(SF, n_queries=5, k=10))


def test_neardup_matches_duckdb(ray_session):
    from mdmpublic_ray.stages.ann import cosine_neardup_pairs

    got = (
        _to_pandas(cosine_neardup_pairs(SF, tau=0.45))
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = con.execute(
        """
        WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM t a JOIN t b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.e, b.e) >= 0.45
        ORDER BY 1, 2
        """
    ).df()
    assert len(got) > 0, "threshold should yield some pairs at sf0.01"
    pd.testing.assert_frame_equal(got, want.astype("int64"))


def test_neardup_pairs_unique_and_ordered(ray_session):
    from mdmpublic_ray.stages.ann import cosine_neardup_pairs

    df = _to_pandas(cosine_neardup_pairs(SF, tau=0.4))
    assert (df["vec_id_a"] < df["vec_id_b"]).all()
    assert not df.duplicated(["vec_id_a", "vec_id_b"]).any()


def test_lsh_neardup_precision_exact_recall_bounded(ray_session):
    """Planted tight clusters: the LSH-bucketed near-dup join emits a
    SUBSET of the exact tau-join (in-bucket verification is exact →
    precision 1.0 by construction) and recovers most planted pairs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.ann import lsh_neardup_pairs

    rng = np.random.default_rng(7)
    k, per, d = 25, 4, 32
    centers = rng.standard_normal((k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.concatenate(
        [centers[j] + 0.08 * rng.standard_normal((per, d)) for j in range(k)]
    )
    vecs = np.concatenate([vecs, rng.standard_normal((150, d))])  # noise
    ids = np.arange(len(vecs), dtype=np.int64)

    # local exact tau-join
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    tau = 0.8
    ia, ib = np.nonzero(np.triu(sims >= tau, k=1))
    exact = set(zip(ids[ia].tolist(), ids[ib].tolist()))
    assert len(exact) >= k  # the plant produced in-cluster pairs

    tbl = pa.table({"vec_id": ids, "embedding": [v.astype("float32") for v in vecs]})
    # recall bound at the tau=0.8 boundary: p = 1 - acos(0.8)/pi = 0.795,
    # 1-(1-p^6)^10 ~ 0.95 — assert a margined 0.8
    got = _to_pandas(
        lsh_neardup_pairs(
            rd.from_arrow(tbl).repartition(4), tau=tau, n_bits=6, n_tables=10
        )
    )
    got_pairs = set(zip(got["vec_id_a"].tolist(), got["vec_id_b"].tolist()))
    assert got_pairs <= exact  # precision 1.0, always
    assert len(got_pairs) / len(exact) >= 0.8  # recall at these (b, T)
    assert not got.duplicated(["vec_id_a", "vec_id_b"]).any()
    assert got["n_tables_hit"].between(1, 10).all()


def test_lsh_neardup_subset_of_exact_on_testdata(ray_session):
    from mdmpublic_ray.sources.tables import read_table
    from mdmpublic_ray.stages.ann import cosine_neardup_pairs, lsh_neardup_pairs

    exact = _to_pandas(cosine_neardup_pairs(SF, tau=0.45))
    exact_pairs = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    ds = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    got = _to_pandas(lsh_neardup_pairs(ds, tau=0.45, n_bits=4, n_tables=12))
    if len(got):
        assert set(zip(got["vec_id_a"], got["vec_id_b"])) <= exact_pairs


def test_lsh_knn_recall_vs_brute_force(ray_session, brute):
    from mdmpublic_ray.stages.ann import knn_cosine_lsh

    approx = _to_pandas(knn_cosine_lsh(SF, n_queries=5, k=10, n_bits=4))
    truth = set(zip(brute["query_vec_id"], brute["neighbor_vec_id"]))
    got = set(zip(approx["query_vec_id"], approx["neighbor_vec_id"]))
    assert len(truth) == 50
    recall = len(truth & got) / len(truth)
    # 4 bits + Hamming-1 multiprobe scans ~5/16 of a random corpus;
    # recall well above the ~31% scan fraction shows buckets concentrate
    # true neighbors. Floor kept loose: embeddings at sf0.01 are random.
    assert recall >= 0.3, f"recall {recall}"
    # approximate ranks must still be a valid per-query 1..n prefix
    for _, g in approx.groupby("query_vec_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_lsh_knn_is_deterministic(ray_session):
    from mdmpublic_ray.stages.ann import knn_cosine_lsh

    a = _to_pandas(knn_cosine_lsh(SF, n_queries=3, k=5)).sort_values(
        ["query_vec_id", "rank"]
    ).reset_index(drop=True)
    b = _to_pandas(knn_cosine_lsh(SF, n_queries=3, k=5)).sort_values(
        ["query_vec_id", "rank"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_knn_recall_vs_brute_force(ray_session, brute):
    from mdmpublic_ray.stages.ann import knn_cosine_ivf

    approx = _to_pandas(knn_cosine_ivf(SF, n_queries=5, k=10, n_centroids=16, nprobe=4))
    truth = set(zip(brute["query_vec_id"], brute["neighbor_vec_id"]))
    got = set(zip(approx["query_vec_id"], approx["neighbor_vec_id"]))
    recall = len(truth & got) / len(truth)
    # nprobe/K = 4/16 of the corpus scanned; recall above the 25% scan
    # fraction shows the inverted lists concentrate true neighbors.
    assert recall >= 0.3, f"recall {recall}"
    for _, g in approx.groupby("query_vec_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_ivf_knn_is_deterministic(ray_session):
    from mdmpublic_ray.stages.ann import knn_cosine_ivf

    a = _to_pandas(knn_cosine_ivf(SF, n_queries=3, k=5)).sort_values(
        ["query_vec_id", "rank"]
    ).reset_index(drop=True)
    b = _to_pandas(knn_cosine_ivf(SF, n_queries=3, k=5)).sort_values(
        ["query_vec_id", "rank"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_distributed_kmeans(ray_session):
    """Full-corpus Lloyd: on planted well-separated clusters the
    distributed implementation recovers the structure exactly and
    matches a local numpy Lloyd with the same deterministic init."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.ann import distributed_kmeans

    rng = np.random.default_rng(11)
    k, per, d = 3, 60, 16
    centers = np.eye(k, d) * 10.0
    vecs = np.concatenate(
        [centers[j] + 0.05 * rng.standard_normal((per, d)) for j in range(k)]
    ).astype(np.float32)
    truth = np.repeat(np.arange(k), per)
    ids = np.arange(k * per, dtype=np.int64)
    tbl = pa.table({"vec_id": ids, "embedding": [v for v in vecs]})
    ds = rd.from_arrow(tbl).repartition(6)

    assigns, cents = distributed_kmeans(ds, k=k, n_iters=4)
    a = assigns.to_pandas().sort_values("vec_id")["centroid_id"].to_numpy()
    # perfect recovery: bijection between found centroids and truth
    import pandas as pd

    j = pd.DataFrame({"t": truth, "c": a})
    assert (j.groupby("t")["c"].nunique() == 1).all()
    assert j.groupby("c")["t"].nunique().le(1).all()

    # local reference with the identical init (maximin over smallest ids)
    from mdmpublic_ray.stages.ann import maximin_init

    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    c_ref = maximin_init(m, k)
    for _ in range(4):
        lab = np.argmax(m @ c_ref.T, axis=1)
        for jj in range(k):
            sel = m[lab == jj]
            if len(sel):
                v = sel.sum(0)
                c_ref[jj] = v / np.linalg.norm(v)
    assert np.array_equal(a, np.argmax(m @ c_ref.T, axis=1))
    assert np.allclose(cents, c_ref, atol=1e-9)

    # determinism across runs
    a2 = distributed_kmeans(ds, k=k, n_iters=4)[0].to_pandas()
    a2 = a2.sort_values("vec_id")["centroid_id"].to_numpy()
    assert np.array_equal(a, a2)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (stages/ann.py semantic_dedup)
# ---------------------------------------------------------------------------


def _planted_semdedup_ds(n_groups=6, dups_per_group=4, n_noise=40, d=16, seed=7):
    """Tight duplicate groups (cos ~ 1 within, well separated between)
    plus lone noise vectors nowhere near tau of anything."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids, truth = [], [], {}
    vid = 0
    for g in range(n_groups):
        members = []
        for _ in range(dups_per_group):
            v = base[g] + rng.normal(scale=1e-3, size=d)  # cos ~ 0.999+
            vecs.append(v / np.linalg.norm(v))
            members.append(vid)
            ids.append(vid)
            vid += 1
        truth[g] = members
    for _ in range(n_noise):
        v = rng.normal(size=d)
        vecs.append(v / np.linalg.norm(v))
        ids.append(vid)
        vid += 1
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(tbl), truth, np.stack(vecs)


def test_semantic_dedup_planted_truth(ray_session):
    """Every tight planted group collapses to its min-id member; noise
    survives untouched (noise cos is far below tau)."""
    import numpy as np

    from mdmpublic_ray.stages.ann import semantic_dedup

    ds, truth, _ = _planted_semdedup_ds()
    out = semantic_dedup(ds, tau=0.95, k=8, n_iters=4).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    kept = set(out[out["keep"]]["vec_id"])
    n_groups = len(truth)
    for g, members in truth.items():
        surv = kept & set(members)
        assert surv == {min(members)}, (g, surv)
    # noise ids all kept
    max_planted = max(max(m) for m in truth.values())
    noise = out[out["vec_id"] > max_planted]
    assert noise["keep"].all()
    # witness contract: every dropped row names a kept row at >= tau
    dropped = out[~out["keep"]]
    assert dropped["dup_of"].notna().all()
    assert set(dropped["dup_of"].astype("int64")) <= kept


def test_semantic_dedup_invariants(ray_session):
    """(a) no two KEPT rows in one cluster are >= tau; (b) every drop's
    witness is in the SAME cluster, kept, with a smaller id, and really
    at >= tau cosine — precision 1.0 by construction."""
    import numpy as np

    from mdmpublic_ray.stages.ann import semantic_dedup

    ds, _, vecs = _planted_semdedup_ds()
    tau = 0.95
    out = semantic_dedup(ds, tau=tau, k=8, n_iters=4).to_pandas()
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    by_id = out.set_index("vec_id")
    for cid, grp in out.groupby("centroid_id"):
        kept_ids = grp[grp["keep"]]["vec_id"].to_numpy()
        if len(kept_ids) > 1:
            km = m[kept_ids]
            S = km @ km.T
            np.fill_diagonal(S, 0.0)
            assert S.max() < tau, (cid, S.max())
    for _, row in out[~out["keep"]].iterrows():
        w = int(row["dup_of"])
        assert by_id.loc[w, "keep"]
        assert by_id.loc[w, "centroid_id"] == row["centroid_id"]
        assert w < row["vec_id"]
        assert float(m[int(row["vec_id"])] @ m[w]) >= tau


def test_semantic_dedup_deterministic_and_tiling_invariant(ray_session):
    """Same result across runs AND across tile sizes (the tiled greedy
    must equal the one-shot greedy)."""
    from mdmpublic_ray.stages.ann import semantic_dedup

    ds, _, _ = _planted_semdedup_ds()

    def canon(res):
        return (
            res.to_pandas()
            .astype({"dup_of": "Int64"})
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    a = canon(semantic_dedup(ds, tau=0.95, k=8, n_iters=4))
    b = canon(semantic_dedup(ds, tau=0.95, k=8, n_iters=4))
    c = canon(semantic_dedup(ds, tau=0.95, k=8, n_iters=4, tile=3))
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_semantic_dedup_query_runs_on_testdata(ray_session):
    from mdmpublic_ray.pipelines.queries import QUERIES

    out = QUERIES["embeddings_semdedup"](SF).to_pandas()
    assert len(out) == 500  # one row per embedding
    assert set(out.columns) == {"vec_id", "centroid_id", "keep", "dup_of"}
    assert out["keep"].any()


def test_ann_cache_eviction_is_prefix_scoped():
    """Round-4 advice: knn query-cache inserts must not evict semdedup
    centroid entries (and vice versa) — interleaved stages on one worker
    previously cleared each other's cache every batch."""
    from mdmpublic_ray.stages import ann

    ann._ANN_CACHE.clear()
    ann._ANN_CACHE[("knn_queries", "a")] = 1
    ann._ANN_CACHE[("semdedup", "b")] = 2
    ann._ann_cache_evict("knn_queries")
    assert ("semdedup", "b") in ann._ANN_CACHE
    assert ("knn_queries", "a") not in ann._ANN_CACHE
    ann._ann_cache_evict("semdedup")
    assert ann._ANN_CACHE == {}
