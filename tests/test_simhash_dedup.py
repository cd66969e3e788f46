"""SimHash near-dup clustering: kernel bit-identity, band recall
guarantee, and planted-truth cluster equality."""

import numpy as np
import pyarrow as pa
import pytest

from mdmpublic_ray.functions.hashing import hamming64, simhash64, stable_u64
from mdmpublic_ray.stages.simhash_dedup import (
    DEFAULT_MAX_HAMMING,
    N_BANDS,
    band_keys,
    hamming64_batch,
    simhash_batch,
    simhash_clusters_ds,
)


def test_simhash_batch_matches_scalar():
    rng = np.random.default_rng(7)
    lists = [
        rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
        for n in (0, 1, 2, 5, 37, 400)
    ]
    got = simhash_batch(lists)
    want = np.array([simhash64(a) for a in lists], dtype=np.uint64)
    assert (got == want).all()


def test_simhash_batch_all_empty():
    assert (simhash_batch([np.empty(0, np.uint64)] * 3) == 0).all()
    assert simhash_batch([]).size == 0


def test_hamming_batch_matches_scalar():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1 << 63, size=64, dtype=np.uint64)
    b = rng.integers(0, 1 << 63, size=64, dtype=np.uint64)
    got = hamming64_batch(a, b)
    want = [hamming64(int(x), int(y)) for x, y in zip(a, b)]
    assert got.tolist() == want


def test_band_recall_within_hamming_3():
    """Pigeonhole: ≤ N_BANDS-1 flipped bits leave ≥1 band untouched."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 1 << 63, size=200, dtype=np.uint64)
    flipped = base.copy()
    for i in range(base.size):
        for bit in rng.choice(64, size=DEFAULT_MAX_HAMMING, replace=False):
            flipped[i] ^= np.uint64(1) << np.uint64(bit)
    kb, kf = band_keys(base), band_keys(flipped)
    shared = (kb == kf).any(axis=1)
    assert shared.all()
    assert kb.shape == (200, N_BANDS)


def _planted_docs(n_clusters=40, words_per_doc=60, seed=5):
    """Deterministic corpus: each cluster = a base doc + a near-dup with
    one substituted word; different clusters use disjoint vocabularies."""
    rng = np.random.default_rng(seed)
    rows_id, rows_text, truth = [], [], []
    did = 0
    for c in range(n_clusters):
        vocab = [f"w{c}_{i}" for i in range(200)]
        words = list(rng.choice(vocab, size=words_per_doc, replace=True))
        a = " ".join(words)
        words2 = list(words)
        words2[int(rng.integers(words_per_doc))] = f"w{c}_sub"
        b = " ".join(words2)
        rows_id += [did, did + 1]
        rows_text += [a, b]
        truth.append((did, did + 1))
        did += 2
    tbl = pa.table(
        {"doc_id": pa.array(rows_id, pa.int64()), "text": pa.array(rows_text)}
    )
    return tbl, truth


def test_planted_near_dups_cluster_together(ray_session):
    import ray.data as rd

    tbl, truth = _planted_docs()
    out = simhash_clusters_ds(rd.from_arrow(tbl)).to_pandas()
    rep = dict(zip(out["doc_id"], out["rep_id"]))
    assert len(out) == tbl.num_rows
    # every planted pair lands in one component
    for a, b in truth:
        assert rep[a] == rep[b], (a, b, rep[a], rep[b])
    # rep_id is the numeric min of its component
    for a, b in truth:
        assert rep[a] == min(
            d for d, r in rep.items() if r == rep[a]
        )
    # unrelated clusters stay separate (disjoint vocabularies ⇒ far hashes)
    reps = {rep[a] for a, _ in truth}
    assert len(reps) == len(truth)


def test_no_near_dups_is_identity(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    texts = [
        " ".join(f"u{i}_{int(w)}" for w in rng.integers(0, 5000, size=50))
        for i in range(30)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(30), pa.int64()), "text": pa.array(texts)}
    )
    out = simhash_clusters_ds(rd.from_arrow(tbl)).to_pandas()
    assert (out["doc_id"] == out["rep_id"]).all()


def test_simhash_text_batch_matches_fingerprint_query():
    """The clustering stage's fingerprints equal the q_docs_simhash path
    (same tokens → same token hashes → same simhash)."""
    from mdmpublic_ray.functions import text as T
    from mdmpublic_ray.stages.simhash_dedup import simhash_text_batch

    texts = ["Hello, hello world!", "", "one two three two one", "x"]
    got = simhash_text_batch(texts)
    for s, g in zip(texts, got):
        th = np.array([stable_u64(t) for t in T.tokens(s)], dtype=np.uint64)
        assert int(g) == simhash64(th)
