"""Optional cosine-over-embedding scoring signal (north-star scoring
recipe: JW on url/title + token-Jaccard + cosine-over-embedding on
text): hashed-embedding kernel semantics, pipeline integration with
F1 preserved, broadcast/join path agreement, and the loud refusals
(emb without dim, incremental, feature store)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mdmpublic_ray.stages.blocking import hashed_embeddings_batch


def test_hashed_embedding_kernel_semantics():
    toks = [
        ["alpha", "beta", "gamma", "alpha"],
        ["alpha", "beta", "gamma", "alpha"],  # identical → cosine 1.0
        ["delta", "epsilon", "zeta", "eta", "theta"],  # disjoint
        [],  # empty → zero vector (guarded norm)
    ]
    m = hashed_embeddings_batch(toks, 64)
    assert m.shape == (4, 64) and m.dtype == np.float32
    norms = np.linalg.norm(m, axis=1)
    assert norms[:3] == pytest.approx([1.0, 1.0, 1.0], abs=1e-6)
    assert norms[3] == 0.0
    cos = m.astype(np.float64) @ m.astype(np.float64).T
    assert cos[0, 1] == pytest.approx(1.0, abs=1e-6)  # float32 storage rounding
    assert abs(cos[0, 2]) < 0.6  # disjoint vocab → far from 1
    # deterministic across calls
    assert np.array_equal(m, hashed_embeddings_batch(toks, 64))


def test_er_with_emb_signal_keeps_f1_and_emits_cos(ray_session, corpus_dir):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, pairwise_metrics, run_er

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    out = run_er(
        pages,
        ERConfig(num_partitions=8, n_buckets=16, emb_dim=64, emb_weight=0.2),
    )
    scored = out["scored"].to_pandas()
    assert "cos_text" in scored.columns
    # convex blend bookkeeping: score = 0.8*base + 0.2*cos exactly
    base = (
        0.7 * scored["jaccard"] + 0.2 * scored["jw_title"] + 0.1 * scored["jw_url"]
    )
    assert np.allclose(scored["score"], 0.8 * base + 0.2 * scored["cos_text"])
    # identical texts (exact re-crawls) have identical token bags → cos 1
    exact = scored[scored["jaccard"] >= 0.9999]
    assert len(exact) > 0
    assert (exact["cos_text"] > 0.9999).all()
    m = pairwise_metrics(out["clusters"], rd.read_parquet(f"{corpus_dir}/labels.parquet"))
    assert m["f1"] == 1.0


def test_emb_broadcast_and_join_paths_agree(ray_session, corpus_dir):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, run_er
    from mdmpublic_ray.stages.scoring import score_pairs

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    out = run_er(
        pages, ERConfig(num_partitions=8, n_buckets=16, emb_dim=32, emb_weight=0.3)
    )
    pairs = out["pairs"].materialize()
    features = out["features"].materialize()
    cols = ["url_a", "url_b", "jaccard", "cos_text", "score", "is_match"]

    def canon(ds) -> pd.DataFrame:
        return (
            ds.to_pandas()[cols]
            .sort_values(["url_a", "url_b"], kind="mergesort")
            .reset_index(drop=True)
        )

    fast = canon(score_pairs(pairs, features, num_partitions=8, emb_weight=0.3))
    slow = canon(
        score_pairs(
            pairs, features, num_partitions=8, emb_weight=0.3, broadcast_threshold=0
        )
    )
    pd.testing.assert_frame_equal(fast, slow, check_exact=False, atol=1e-12)


def test_emb_refusals(ray_session, corpus_dir, tmp_path):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, run_er
    from mdmpublic_ray.pipelines.er_incremental import run_er_incremental
    from mdmpublic_ray.stages.scoring import score_pairs

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    with pytest.raises(ValueError, match="requires emb_dim"):
        run_er(pages, ERConfig(emb_weight=0.2))
    with pytest.raises(ValueError, match="cosine-over-embedding"):
        run_er_incremental(
            pages, ERConfig(emb_dim=64, emb_weight=0.2),
            state_dir=str(tmp_path), prev_run_id="x",
        )
    # a store WRITTEN without the emb column refuses an emb probe
    out_plain = run_er(pages, ERConfig(num_partitions=8, n_buckets=16))
    from mdmpublic_ray.stages.featurestore import write_feature_store

    plain_store = str(tmp_path / "plain_store")
    write_feature_store(out_plain["features"].materialize(), plain_store)
    with pytest.raises(ValueError, match="without the emb column"):
        score_pairs(
            out_plain["pairs"].materialize(),
            out_plain["features"].materialize(),
            emb_weight=0.3,
            broadcast_threshold=0,
            feature_store_dir=plain_store,
        ).materialize()


def test_emb_store_path_agrees_with_broadcast(ray_session, corpus_dir, tmp_path):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, run_er
    from mdmpublic_ray.stages.scoring import score_pairs

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    out = run_er(
        pages, ERConfig(num_partitions=8, n_buckets=16, emb_dim=32, emb_weight=0.3)
    )
    pairs = out["pairs"].materialize()
    features = out["features"].materialize()
    cols = ["url_a", "url_b", "jaccard", "cos_text", "score", "is_match"]

    def canon(ds) -> pd.DataFrame:
        return (
            ds.to_pandas()[cols]
            .sort_values(["url_a", "url_b"], kind="mergesort")
            .reset_index(drop=True)
        )

    fast = canon(score_pairs(pairs, features, num_partitions=8, emb_weight=0.3))
    store = canon(
        score_pairs(
            pairs, features, num_partitions=8, emb_weight=0.3,
            broadcast_threshold=0, feature_store_dir=str(tmp_path / "emb_store"),
        )
    )
    pd.testing.assert_frame_equal(fast, store, check_exact=False, atol=1e-12)


def test_emb_matrix_from_binary_zero_copy_paths():
    """Round-3 review item #6: the packed-float32 unpack is buffer-level.
    Equality across equal-width binary, fixed_size_binary, and a sliced
    array; ragged input raises instead of silently corrupting."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from mdmpublic_ray.stages.scoring import _emb_matrix_from_binary

    rng = np.random.default_rng(7)
    m = rng.standard_normal((5, 8)).astype(np.float32)
    rows = [r.tobytes() for r in m]

    var = pa.array(rows, pa.binary())
    fixed = pa.array(rows, pa.binary(32))
    np.testing.assert_array_equal(_emb_matrix_from_binary(var), m.astype(np.float64))
    np.testing.assert_array_equal(_emb_matrix_from_binary(fixed), m.astype(np.float64))
    # sliced (non-zero offset) arrays honor the offset
    np.testing.assert_array_equal(
        _emb_matrix_from_binary(var.slice(2, 3)), m[2:5].astype(np.float64)
    )
    np.testing.assert_array_equal(
        _emb_matrix_from_binary(fixed.slice(1, 2)), m[1:3].astype(np.float64)
    )
    # chunked input
    ch = pa.chunked_array([var.slice(0, 2), var.slice(2, 3)])
    np.testing.assert_array_equal(_emb_matrix_from_binary(ch), m.astype(np.float64))

    ragged = pa.array([b"\x00" * 4, b"\x00" * 8], pa.binary())
    with pytest.raises(TypeError, match="equal-width"):
        _emb_matrix_from_binary(ragged)


# ---------------------------------------------------------------------------
# Learned embedding model (stages/embmodel.py — ST5 model-holding state)
# ---------------------------------------------------------------------------


def test_embedding_model_fixture_loads_and_separates():
    """The checked-in trained model: deterministic load, unit-norm
    output, near-dup inputs at cosine ≈ 1, unrelated inputs well apart."""
    from mdmpublic_ray.stages.blocking import hashed_embeddings_batch
    from mdmpublic_ray.stages.embmodel import EmbeddingModel, default_model_path

    m = EmbeddingModel.load(default_model_path())
    assert (m.in_dim, m.out_dim) == (64, 32)
    base = [f"tok{i}" for i in range(40)]
    docs = [
        base,
        base[:-2],                      # near-dup: two tokens dropped
        [f"other{i}" for i in range(40)],  # unrelated vocab
    ]
    X = hashed_embeddings_batch(docs, 64)
    E = m(X)
    assert E.shape == (3, 32) and E.dtype == np.float32
    assert np.allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-5)
    cos = E @ E.T
    assert cos[0, 1] > 0.9          # near-dup stays near
    assert cos[0, 2] < cos[0, 1] - 0.1  # unrelated clearly lower
    # deterministic across loads
    E2 = EmbeddingModel.load(default_model_path())(X)
    assert np.array_equal(E, E2)


def test_embedding_model_gpu_device_falls_back_to_cpu():
    """device='gpu' on a box with no GPU backend must fall back to CPU
    numpy with identical outputs — never raise, never hang."""
    from mdmpublic_ray.stages.blocking import hashed_embeddings_batch
    from mdmpublic_ray.stages.embmodel import (
        EmbeddingModel,
        default_model_path,
        resolve_num_gpus,
    )

    X = hashed_embeddings_batch([["a", "b", "c"], ["d", "e"]], 64)
    cpu = EmbeddingModel.load(default_model_path(), device="cpu")
    gpu = EmbeddingModel.load(default_model_path(), device="gpu")
    assert gpu.device == "cpu"  # no cupy in this environment
    assert np.array_equal(cpu(X), gpu(X))
    # a num_gpus request on a GPU-less cluster clamps to 0 (stage stays
    # schedulable) instead of hanging unschedulable
    assert resolve_num_gpus(1.0) == 0.0
    assert resolve_num_gpus(0.0) == 0.0


def test_er_model_scoring_gpu_request_falls_back(ray_session, corpus_dir):
    """Round-3 review item #2's done-condition: the flagship runs with a
    LEARNED model loaded in the features actors (ERConfig.emb_model_path),
    a num_gpus request on this GPU-less cluster falls back to CPU, and
    the result is device-invariant and still F1 = 1.0."""
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, pairwise_metrics, run_er
    from mdmpublic_ray.stages.embmodel import default_model_path

    common = dict(
        num_partitions=8, n_buckets=16, emb_dim=64, emb_weight=0.25,
        threshold=0.5, emb_model_path=default_model_path(),
    )
    out_cpu = run_er(
        rd.read_parquet(f"{corpus_dir}/pages.parquet"), ERConfig(**common)
    )
    out_gpu_req = run_er(
        rd.read_parquet(f"{corpus_dir}/pages.parquet"),
        ERConfig(**common, emb_model_gpus=1.0),
    )
    m = pairwise_metrics(
        out_cpu["clusters"], rd.read_parquet(f"{corpus_dir}/labels.parquet")
    )
    assert m["f1"] == 1.0

    def canon(ds):
        df = ds.to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(
        canon(out_cpu["golden"]), canon(out_gpu_req["golden"])
    )
