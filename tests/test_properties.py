"""Property-based tests (hypothesis) for the scalar/hashing function
library — the determinism and algebraic invariants conformance rests on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mdmpublic_ray.functions import hashing as H
from mdmpublic_ray.functions import text as T
from mdmpublic_ray.functions.urls import canonical_host

texts = st.text(max_size=80)
tokens_lists = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), max_size=30
)


@given(texts, texts)
@settings(max_examples=200, deadline=None)
def test_jaro_winkler_bounds_and_symmetry(a, b):
    x = T.jaro_winkler(a, b)
    assert 0.0 <= x <= 1.0
    assert x == T.jaro_winkler(b, a)
    assert T.jaro_winkler(a, a) == (1.0 if a else 0.0) or a == ""


@given(texts)
@settings(max_examples=100, deadline=None)
def test_jaro_winkler_identity(a):
    if a:
        assert T.jaro_winkler(a, a) == 1.0


@given(tokens_lists, tokens_lists)
@settings(max_examples=100, deadline=None)
def test_jaccard_bounds_and_symmetry(a, b):
    sa, sb = frozenset(a), frozenset(b)
    j = T.jaccard(sa, sb)
    assert 0.0 <= j <= 1.0
    assert j == T.jaccard(sb, sa)
    if sa == sb:
        assert j == 1.0


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_stable_hashes_deterministic_and_in_range(s):
    assert H.stable_u32(s) == H.stable_u32(s)
    assert 0 <= H.stable_u32(s) < 2**32
    assert H.stable_u64(s) == H.stable_u64(s)
    assert 0 <= H.stable_u64(s) < 2**64


@given(tokens_lists)
@settings(max_examples=100, deadline=None)
def test_minhash_signature_identity(toks):
    a, b = H.minhash_permutations(32, seed=1)
    sh = H.shingle_hashes(toks, 3)
    s1 = H.minhash_signature(sh, a, b)
    s2 = H.minhash_signature(sh.copy(), a, b)
    assert np.array_equal(s1, s2)
    assert s1.shape == (32,)
    # batch kernel agrees with the single-doc kernel
    batch = H.minhash_signatures_batch([sh], a, b)
    assert np.array_equal(batch[0], s1)


@given(st.lists(tokens_lists, max_size=8))
@settings(max_examples=50, deadline=None)
def test_minhash_batch_matches_singles(docs):
    a, b = H.minhash_permutations(16, seed=9)
    shingles = [H.shingle_hashes(d, 3) for d in docs]
    batch = H.minhash_signatures_batch(shingles, a, b)
    for i, sh in enumerate(shingles):
        assert np.array_equal(batch[i], H.minhash_signature(sh, a, b))


@given(st.integers(min_value=0, max_value=2**62))
@settings(max_examples=100, deadline=None)
def test_lsh_band_ids_positive_and_stable(seed):
    rng = np.random.default_rng(seed % 2**32)
    sig = rng.integers(0, 2**32, size=64, dtype=np.uint32)
    ids1 = H.lsh_band_ids(sig, 16)
    ids2 = H.lsh_band_ids(sig.copy(), 16)
    assert np.array_equal(ids1, ids2)
    assert (ids1 >= 0).all()
    # distinct bands with identical rows still get distinct keys
    flat = np.zeros(64, dtype=np.uint32)
    idf = H.lsh_band_ids(flat, 16)
    assert len(set(idf.tolist())) == 16


@given(st.text(alphabet="abcxyz:/._-0123456789", max_size=60))
@settings(max_examples=200, deadline=None)
def test_canonical_host_idempotent_ish(u):
    h = canonical_host(u)
    if h:
        # feeding the host back as a url yields the same host
        assert canonical_host(f"https://{h}/x") == h


@given(tokens_lists)
@settings(max_examples=100, deadline=None)
def test_rolling_fingerprints_deterministic_and_bounded(toks):
    f1 = T.rolling_fingerprints(toks)
    f2 = T.rolling_fingerprints(list(toks))
    assert f1 == f2
    assert len(f1) <= 8
    assert f1 == sorted(f1)


@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=40))
@settings(max_examples=150, deadline=None)
def test_jaro_winkler_batch_matches_scalar(pairs):
    got = T.jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
    for i, (a, b) in enumerate(pairs):
        assert got[i] == T.jaro_winkler(a, b)


@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=40))
@settings(max_examples=150, deadline=None)
def test_jaro_winkler_coded_matches_scalar(pairs):
    """The encode-once (dictionary-coded) kernel is bit-identical to the
    scalar on arbitrary unicode, including empty/equal/prefix cases."""
    import pyarrow as pa
    import pyarrow.compute as pc

    a = pa.array([x for x, _ in pairs], pa.string())
    b = pa.array([y for _, y in pairs], pa.string())
    d = pc.dictionary_encode(pa.concat_arrays([a, b]))
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    flat, offs = T.encode_flat_u32_arrow(d.dictionary)
    # the transcode round-trips every distinct string
    for i, s in enumerate(d.dictionary.to_pylist()):
        assert flat[offs[i] : offs[i + 1]].tolist() == [ord(c) for c in s]
    n = len(pairs)
    got = T.jaro_winkler_coded(flat, offs, codes[:n], codes[n:], chunk=7)
    for i, (x, y) in enumerate(pairs):
        assert got[i] == T.jaro_winkler(x, y)


def test_jw_arrow_matches_scalar_with_nulls_and_chunks():
    import pyarrow as pa

    from mdmpublic_ray.stages.scoring import _jw_arrow

    a = pa.chunked_array([["abc", None], ["héllo wörld", "", "same"]])
    b = pa.chunked_array([["abd"], [None, "hello world", "x", "same"]])
    got = _jw_arrow(a, b)
    exp = [T.jaro_winkler(x or "", y or "") for x, y in zip(a.to_pylist(), b.to_pylist())]
    assert got.tolist() == exp


sketch_sets = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), max_size=40, unique=True
)


@given(st.lists(st.tuples(sketch_sets, sketch_sets), min_size=1, max_size=20),
       st.integers(min_value=1, max_value=200))
@settings(max_examples=150, deadline=None)
def test_sketch_jaccard_batch_matches_scalar(pairs, k):
    import pyarrow as pa

    from mdmpublic_ray.stages.scoring import (
        pad_sketch_column, sketch_jaccard, sketch_jaccard_batch)

    sk_a = [np.array(sorted(a), dtype=np.uint64) for a, _ in pairs]
    sk_b = [np.array(sorted(b), dtype=np.uint64) for _, b in pairs]
    mat_a, len_a = pad_sketch_column(pa.array([x.tobytes() for x in sk_a], pa.binary()))
    mat_b, len_b = pad_sketch_column(pa.array([x.tobytes() for x in sk_b], pa.binary()))
    got = sketch_jaccard_batch(mat_a, len_a, mat_b, len_b, k)
    for i in range(len(pairs)):
        assert got[i] == sketch_jaccard(sk_a[i], sk_b[i], k)


# ---------------------------------------------------------------------------
# Vectorized similarity-hash kernels (poly64 + splitmix64): the flat/batch
# forms must be bit-identical to their scalar counterparts — these parity
# properties are what lets the hot path run without per-row Python.
# ---------------------------------------------------------------------------


def _flat_utf8(strs):
    bufs = [s.encode("utf-8", "surrogatepass") for s in strs]
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    off = np.zeros(len(strs) + 1, dtype=np.int64)
    if strs:
        np.cumsum([len(b) for b in bufs], out=off[1:])
    return data, off


@given(st.lists(st.text(max_size=40), max_size=20))
@settings(max_examples=150, deadline=None)
def test_hash_utf8_flat_matches_scalar(strs):
    data, off = _flat_utf8(strs)
    got = H.hash_utf8_flat(data, off)
    assert got.shape == (len(strs),)
    for i, s in enumerate(strs):
        assert int(got[i]) == H.fast_u64(s)


def test_hash_utf8_flat_nonzero_base_and_empties():
    """Sliced views (nonzero offsets[0]) and empty items mixed with
    content hash identically to the scalar — including the all-empty
    batch, which must agree with the mixed-batch empty hash."""
    strs = ["", "a", "", "abc", ""]
    data, off = _flat_utf8(strs)
    junk = np.frombuffer(b"JUNKJUNK", dtype=np.uint8)
    got = H.hash_utf8_flat(np.concatenate([junk, data]), off + 8)
    for i, s in enumerate(strs):
        assert int(got[i]) == H.fast_u64(s)
    all_empty = H.hash_utf8_flat(np.empty(0, dtype=np.uint8),
                                 np.zeros(4, dtype=np.int64))
    assert all_empty.tolist() == [H.fast_u64("")] * 3


@given(st.lists(tokens_lists, max_size=8), st.integers(min_value=1, max_value=5))
@settings(max_examples=100, deadline=None)
def test_shingle_hashes_flat_matches_scalar(docs, k):
    th = np.array(
        [H.fast_u64(w) for d in docs for w in d], dtype=np.uint64
    )
    toff = np.zeros(len(docs) + 1, dtype=np.int64)
    if docs:
        np.cumsum([len(d) for d in docs], out=toff[1:])
    sh, soff = H.shingle_hashes_flat(th, toff, k)
    for i, d in enumerate(docs):
        seg = sh[soff[i] : soff[i + 1]]
        exp = H.shingle_hashes(d, k)
        assert seg.tolist() == exp.tolist()
        assert (np.diff(seg.astype(np.uint64)) > 0).all()  # sorted unique


@given(st.lists(tokens_lists, max_size=8))
@settings(max_examples=60, deadline=None)
def test_minhash_flat_matches_batch(docs):
    a, b = H.minhash_permutations(16, seed=5)
    th = np.array(
        [H.fast_u64(w) for d in docs for w in d], dtype=np.uint64
    )
    toff = np.zeros(len(docs) + 1, dtype=np.int64)
    if docs:
        np.cumsum([len(d) for d in docs], out=toff[1:])
    sh, soff = H.shingle_hashes_flat(th, toff, 3)
    flat = H.minhash_signatures_flat(sh, soff, a, b)
    sets = [sh[soff[i] : soff[i + 1]] for i in range(len(docs))]
    assert np.array_equal(flat, H.minhash_signatures_batch(sets, a, b))


@given(st.lists(st.one_of(st.none(), st.text(max_size=50)), max_size=15))
@settings(max_examples=100, deadline=None)
def test_tokens_hashed_arrow_matches_tokens(rows):
    import pyarrow as pa

    arr = pa.chunked_array([rows[: len(rows) // 2], rows[len(rows) // 2 :]],
                           pa.string())
    tok_list, th, toff = T.tokens_hashed_arrow(arr)
    assert toff.shape == (len(rows) + 1,)
    for i, s in enumerate(rows):
        exp = T.tokens(s or "")
        assert tok_list[i].as_py() == exp
        assert th[toff[i] : toff[i + 1]].tolist() == [H.fast_u64(w) for w in exp]


@given(st.lists(tokens_lists, max_size=6), st.integers(min_value=2, max_value=32))
@settings(max_examples=60, deadline=None)
def test_hashed_embeddings_batch_matches_naive(docs, dim):
    from mdmpublic_ray.stages.blocking import hashed_embeddings_batch

    got = hashed_embeddings_batch(docs, dim)
    assert got.shape == (len(docs), dim)
    for i, d in enumerate(docs):
        m = np.zeros(dim)
        for w in d:
            hv = H.fast_u64(w)
            m[hv % dim] += 1.0 - 2.0 * ((hv >> 32) & 1)
        nrm = np.linalg.norm(m) or 1.0
        assert np.allclose(got[i], (m / nrm).astype(np.float32), atol=1e-7)


def test_lsh_band_ids_batch_matches_scalar_rows():
    rng = np.random.default_rng(3)
    sigs = rng.integers(0, 2**32, size=(7, 64), dtype=np.uint32)
    got = H.lsh_band_ids_batch(sigs, 16)
    assert got.shape == (7, 16)
    assert (got >= 0).all() and (got < (1 << 62)).all()
    for i in range(7):
        assert got[i].tolist() == H.lsh_band_ids(sigs[i], 16).tolist()
    # distinct bands with identical rows still get distinct keys
    flat = H.lsh_band_ids_batch(np.zeros((1, 64), dtype=np.uint32), 16)[0]
    assert len(set(flat.tolist())) == 16


def test_fixed_u32_matrix_buffer_path_and_slices():
    import pyarrow as pa

    from mdmpublic_ray.stages.blocking import fixed_u32_matrix

    rows = np.arange(24, dtype=np.uint32).reshape(6, 4)
    arr = pa.array([r.tobytes() for r in rows], pa.binary())
    assert np.array_equal(fixed_u32_matrix(arr), rows)
    assert np.array_equal(fixed_u32_matrix(arr.slice(2, 3)), rows[2:5])
    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 4)])
    assert np.array_equal(fixed_u32_matrix(chunked), rows)


def test_hash_string_column_bit_identical_to_scalar():
    """hash_string_column (Arrow-buffer batch kernel keying the dedup
    winner and golden attach machinery) is bit-identical to fast_u64
    row-by-row, including empty strings, slices and large_string."""
    import numpy as np
    import pyarrow as pa

    from mdmpublic_ray.functions.hashing import fast_u64, hash_string_column

    vals = ["", "a", "http://h0.example.com/p/1", "ünïcode-path/χ", "x" * 300]
    arr = pa.array(vals, pa.string())
    got = hash_string_column(arr)
    want = np.array([fast_u64(s) for s in vals], dtype=np.uint64)
    assert np.array_equal(got, want)
    # sliced array (non-zero offset) and large_string agree
    assert np.array_equal(hash_string_column(arr.slice(2, 2)), want[2:4])
    assert np.array_equal(
        hash_string_column(pa.array(vals, pa.large_string())), want
    )
    # chunked input
    ch = pa.chunked_array([vals[:2], vals[2:]], pa.string())
    assert np.array_equal(hash_string_column(ch), want)
