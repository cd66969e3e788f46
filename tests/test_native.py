"""Native (C) kernel equivalence: functions/_native.c must be
BIT-IDENTICAL to the numpy kernels it replaces, on the same inputs —
including empty strings, single-char strings, unicode, empty sketches
and k smaller/larger than the union. The numpy paths stay the fallback
(no compiler → same values), so every test here compares the two paths
directly by toggling the loader."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import mdmpublic_ray.functions.text as T
import mdmpublic_ray.stages.scoring as S
from mdmpublic_ray.functions import native


@pytest.fixture()
def lib():
    lb = native.get_lib()
    if lb is None:
        pytest.skip("no C compiler / native kernels unavailable")
    return lb


@pytest.fixture()
def numpy_fallback():
    """Force the numpy path for the duration of a test."""
    saved = (native._LIB, native._TRIED)
    native._LIB, native._TRIED = None, True
    yield
    native._LIB, native._TRIED = saved


def _coded(strs_a, strs_b):
    a = pa.array(strs_a, pa.string())
    b = pa.array(strs_b, pa.string())
    d = pc.dictionary_encode(pa.concat_arrays([a, b]))
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    flat, offs = T.encode_flat_u32_arrow(d.dictionary)
    n = len(strs_a)
    return flat, offs, codes[:n], codes[n:]


def _rand_strings(rng, n):
    alphabet = list("abcdefgh ÀÉ中日🎉xyz-/.")
    out = ["", "a", "b", "ab", "ba", "xy", "https://w.co/a", "https://w.co/b"]
    while len(out) < n:
        ln = int(rng.integers(0, 90))
        out.append("".join(rng.choice(alphabet, size=ln)))
    return out


def test_jw_native_matches_numpy_and_scalar(lib):
    rng = np.random.default_rng(7)
    strs = _rand_strings(rng, 300)
    ia = rng.integers(0, len(strs), 3000)
    ib = rng.integers(0, len(strs), 3000)
    sa = [strs[i] for i in ia]
    sb = [strs[i] for i in ib]
    flat, offs, ca, cb = _coded(sa, sb)
    got = T.jaro_winkler_coded(flat, offs, ca, cb)
    saved = (native._LIB, native._TRIED)
    native._LIB, native._TRIED = None, True
    try:
        ref = T.jaro_winkler_coded(flat, offs, ca, cb)
    finally:
        native._LIB, native._TRIED = saved
    assert np.array_equal(got, ref)
    scalar = np.array([T.jaro_winkler(x, y) for x, y in zip(sa, sb)])
    assert np.array_equal(got, scalar)


def test_sketch_rows_native_matches_numpy_and_scalar(lib):
    rng = np.random.default_rng(3)
    sketches = [
        np.unique(rng.integers(0, 2**64, size=int(rng.integers(0, 200)),
                               dtype=np.uint64))
        for _ in range(200)
    ]
    sketches.append(np.array([], dtype=np.uint64))
    sketches.append(np.array([0, 1, 2**64 - 2], dtype=np.uint64))
    ia = rng.integers(0, len(sketches), 1500)
    ib = rng.integers(0, len(sketches), 1500)
    mat_a, len_a = S.pad_sketch_column(
        pa.array([sketches[i].tobytes() for i in ia], pa.binary())
    )
    mat_b, len_b = S.pad_sketch_column(
        pa.array([sketches[i].tobytes() for i in ib], pa.binary())
    )
    for k in (1, 7, 160, 500):
        got = S.sketch_jaccard_batch(mat_a, len_a, mat_b, len_b, k)
        saved = (native._LIB, native._TRIED)
        native._LIB, native._TRIED = None, True
        try:
            ref = S.sketch_jaccard_batch(mat_a, len_a, mat_b, len_b, k)
        finally:
            native._LIB, native._TRIED = saved
        assert np.array_equal(got, ref), f"k={k}"
        scal = np.array(
            [S.sketch_jaccard(sketches[x], sketches[y], k)
             for x, y in zip(ia, ib)]
        )
        assert np.array_equal(got, scal), f"k={k}"


def test_sketch_idx_native_matches_scalar(lib):
    rng = np.random.default_rng(11)
    sketches = [
        np.unique(rng.integers(0, 2**64, size=int(rng.integers(0, 170)),
                               dtype=np.uint64))
        for _ in range(120)
    ]
    sketches.append(np.array([], dtype=np.uint64))
    width = max(len(s) for s in sketches)
    mat = np.full((len(sketches), width), S.SKETCH_PAD, dtype=np.uint64)
    for i, s in enumerate(sketches):
        mat[i, : len(s)] = s
    lens = np.array([len(s) for s in sketches], dtype=np.int64)
    ia = rng.integers(0, len(sketches), 1000).astype(np.int64)
    ib = rng.integers(0, len(sketches), 1000).astype(np.int64)
    out = np.empty(len(ia), dtype=np.float64)
    lib.sketch_jacc_idx(
        native.ptr(mat, native._p_u64), np.int64(width),
        native.ptr(lens, native._p_i64),
        native.ptr(ia, native._p_i64), native.ptr(ib, native._p_i64),
        np.int64(len(ia)), np.int64(160), native.ptr(out, native._p_f64),
    )
    scal = np.array(
        [S.sketch_jaccard(sketches[x], sketches[y], 160)
         for x, y in zip(ia, ib)]
    )
    assert np.array_equal(out, scal)


def test_score_broadcast_batch_identical_both_paths(lib):
    """The full scorer batch fn emits an identical Arrow table whether
    the native kernels or the numpy fallbacks run."""
    rng = np.random.default_rng(5)
    n_docs = 60
    uids = np.sort(rng.choice(10**9, size=n_docs, replace=False)).astype(np.int64)
    urls = pa.array([f"https://s{i % 7}.ex.org/p{i}" for i in range(n_docs)])
    titles = pa.array(
        ["common prefix title %d tail" % (i % 11) for i in range(n_docs)]
    )
    k = 160
    sketches = [
        np.unique(rng.integers(0, 2**64, size=int(rng.integers(1, 150)),
                               dtype=np.uint64))
        for _ in range(n_docs)
    ]
    mat = np.full((n_docs, k), S.SKETCH_PAD, dtype=np.uint64)
    for i, s in enumerate(sketches):
        mat[i, : len(s)] = s
    lens = np.array([len(s) for s in sketches], dtype=np.int64)

    def _pack(col):
        d = pc.dictionary_encode(col)
        flat, offs = T.encode_flat_u32_arrow(d.dictionary)
        return (
            d.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            flat, offs,
        )

    payload = (uids, urls, _pack(urls), _pack(titles), mat, lens, None)

    class Ref:
        def hex(self):
            return "test-native-eq"

    S._FEAT_CACHE.clear()
    S._FEAT_CACHE["test-native-eq"] = payload
    ia = rng.integers(0, n_docs, 500)
    ib = rng.integers(0, n_docs, 500)
    batch = pa.table(
        {"uid_a": pa.array(uids[ia]), "uid_b": pa.array(uids[ib])}
    )
    got = S._score_broadcast_batch(batch, Ref(), 0.35, k)
    saved = (native._LIB, native._TRIED)
    native._LIB, native._TRIED = None, True
    try:
        ref_tbl = S._score_broadcast_batch(batch, Ref(), 0.35, k)
    finally:
        native._LIB, native._TRIED = saved
        S._FEAT_CACHE.clear()
    assert got.equals(ref_tbl)
