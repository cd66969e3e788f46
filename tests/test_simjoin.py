"""Exact similarity joins (stages/simjoin.py): equivalence to brute force
plus the bounded-per-task-work guarantees that make them scale-safe."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mdmpublic_ray.functions import text as T
from mdmpublic_ray.stages.simjoin import cosine_pairs_tiled, jaccard_set_join


def _brute_jaccard_pairs(ids, texts, blocks, threshold):
    sets = [frozenset(T.tokens(t)) for t in texts]
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if blocks is not None and blocks[i] != blocks[j]:
                continue
            if T.jaccard(sets[i], sets[j]) >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b))
    return out


def _mk_docs(rng, n=120, n_blocks=2):
    """Synthetic corpus with planted near-dup families + a stopword-like
    hot token in almost every doc (exercises the hot-token ordering)."""
    vocab = [f"w{k}" for k in range(150)]
    ids, texts, blocks = [], [], []
    doc_id = 0
    while doc_id < n:
        fam = [vocab[rng.integers(0, len(vocab))] for _ in range(12)]
        members = 1 + int(rng.integers(0, 3))
        blk = f"b{int(rng.integers(0, n_blocks))}"
        for _ in range(min(members, n - doc_id)):
            toks = list(fam)
            for _ in range(int(rng.integers(0, 3))):
                toks[int(rng.integers(0, len(toks)))] = vocab[int(rng.integers(0, len(vocab)))]
            if rng.random() < 0.9:
                toks.append("the")  # hot token
            ids.append(doc_id)
            texts.append(" ".join(toks))
            blocks.append(blk)
            doc_id += 1
    return ids, texts, blocks


@pytest.mark.parametrize("threshold", [0.5, 0.7])
@pytest.mark.parametrize("use_blocks", [True, False])
def test_jaccard_set_join_matches_brute_force(ray_session, threshold, use_blocks):
    import ray.data as rd

    rng = np.random.default_rng(7)
    ids, texts, blocks = _mk_docs(rng)
    cols = {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    if use_blocks:
        cols["blk"] = pa.array(blocks)
    ds = rd.from_arrow(pa.table(cols))
    got_ds = jaccard_set_join(
        ds,
        id_col="doc_id",
        text_col="text",
        block_col="blk" if use_blocks else None,
        threshold=threshold,
        hot_top=4,
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]) for r in got_ds.take_all()
    }
    want = _brute_jaccard_pairs(ids, texts, blocks if use_blocks else None, threshold)
    assert got == want


def test_jaccard_set_join_empty_and_tiny_docs(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["", "", "only one", "only one"]),
            }
        )
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in jaccard_set_join(
            ds, id_col="doc_id", text_col="text", threshold=0.5
        ).take_all()
    }
    # empty docs never pair (SQL NULL semantics); identical docs do
    assert got == {(3, 4)}


def test_jaccard_set_join_cap_drops_are_not_silent(ray_session):
    """A candidate group over max_group_size is dropped by the
    candidate_pairs cap (and would be surfaced by block_size_stats) —
    the join must degrade by dropping, not by O(n²) blowup."""
    import ray.data as rd

    # 40 identical docs: every prefix token's group = all 40 docs
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "text": pa.array(["alpha beta gamma delta"] * 40),
            }
        )
    )
    got = jaccard_set_join(
        ds, id_col="doc_id", text_col="text", threshold=0.5, max_group_size=10
    ).count()
    assert got == 0  # capped out, not 780 pairs


def _brute_cosine_pairs(ids, mat, tau):
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ m.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= tau:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


@pytest.mark.parametrize("n_blocks", [1, 3, 4])
def test_cosine_pairs_tiled_matches_brute_force(ray_session, n_blocks):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n, d = 200, 16
    base = rng.standard_normal((20, d))
    mat = base[rng.integers(0, 20, n)] + 0.35 * rng.standard_normal((n, d))
    ids = list(range(0, 2 * n, 2))  # non-contiguous ids
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(map(float, row)) for row in mat]),
            }
        )
    )
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_pairs_tiled(ds, tau=0.8, n_blocks=n_blocks).take_all()
    }
    want = _brute_cosine_pairs(ids, mat, 0.8)
    assert got == want


def test_cosine_tiles_bound_per_task_rows(ray_session):
    """Every tile group holds at most its two blocks' rows — the bounded
    per-task memory guarantee (no whole-corpus task input)."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    n, d, B = 400, 8, 4
    ids = np.arange(n, dtype=np.int64)
    mat = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, row)) for row in mat]),
        }
    )
    from mdmpublic_ray.stages.simjoin import tile_emit

    emitted = tile_emit(tbl, B)
    # replication factor is exactly B
    assert emitted.num_rows == n * B
    tiles = emitted["tile"].to_numpy()
    sizes = np.bincount(tiles, minlength=B * B)
    # every tile's input is ≈ 2N/B rows (its two blocks), never O(N)
    assert sizes.max() <= 2 * int(np.ceil(n / B))
    # and the full pipeline built on it still runs
    ds = rd.from_arrow(tbl)
    assert cosine_pairs_tiled(ds, tau=2.0, n_blocks=B).count() == 0  # tau>1
