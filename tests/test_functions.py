"""Scalar-function library unit tests (hashing / text / urls). No Ray."""

import numpy as np

from mdmpublic_ray.functions import hashing as H
from mdmpublic_ray.functions import text as T
from mdmpublic_ray.functions.urls import canonical_host, canonical_url


def test_stable_hashes_are_stable():
    assert H.stable_u32("abc") == H.stable_u32("abc")
    assert H.stable_u64("abc") == H.stable_u64("abc")
    assert H.content_digest("abc") == "900150983cd24fb0d6963f7d28e17f72"  # md5("abc")
    assert H.stable_u32("abc") != H.stable_u32("abd")


def test_minhash_similarity_tracks_jaccard():
    a, b = H.minhash_permutations(128, seed=42)
    t1 = T.tokens("the quick brown fox jumps over the lazy dog " * 10)
    t2 = list(t1)
    t2[5] = "cat"  # small edit
    t3 = T.tokens("completely different words here entirely " * 10)
    s1 = H.minhash_signature(H.shingle_hashes(t1), a, b)
    s2 = H.minhash_signature(H.shingle_hashes(t2), a, b)
    s3 = H.minhash_signature(H.shingle_hashes(t3), a, b)
    sim12 = (s1 == s2).mean()
    sim13 = (s1 == s3).mean()
    assert sim12 > 0.5
    assert sim13 < 0.2


def test_minhash_batch_matches_single():
    a, b = H.minhash_permutations(64, seed=1)
    docs = ["alpha beta gamma delta epsilon zeta", "", "one two three four five six seven"]
    sets = [H.shingle_hashes(T.tokens(d)) for d in docs]
    batch = H.minhash_signatures_batch(sets, a, b)
    for i, s in enumerate(sets):
        assert np.array_equal(batch[i], H.minhash_signature(s, a, b))


def test_lsh_band_ids_agree_for_identical_sigs():
    a, b = H.minhash_permutations(128, seed=42)
    s = H.minhash_signature(H.shingle_hashes(T.tokens("x y z w v u t s r q")), a, b)
    k1 = list(H.lsh_band_ids(s, 32))
    k2 = list(H.lsh_band_ids(s.copy(), 32))
    assert k1 == k2 and len(k1) == 32


def test_simhash_close_for_similar_docs():
    t1 = T.tokens("the quick brown fox jumps over the lazy dog " * 5)
    t2 = t1[:-1] + ["cat"]
    h1 = H.simhash64(np.array([H.stable_u64(t) for t in t1], dtype=np.uint64))
    h2 = H.simhash64(np.array([H.stable_u64(t) for t in t2], dtype=np.uint64))
    assert H.hamming64(h1, h2) < 12


def test_jaro_winkler():
    assert T.jaro_winkler("martha", "marhta") > 0.95
    assert T.jaro_winkler("abc", "abc") == 1.0
    assert T.jaro_winkler("abc", "xyz") == 0.0
    assert 0.8 < T.jaro_winkler("dixon", "dicksonx") < 0.82


def test_jaccard_and_tokens():
    assert T.tokens("Hello, WORLD-42!") == ["hello", "world", "42"]
    assert T.jaccard({"a", "b"}, {"b", "c"}) == 1 / 3
    assert T.jaccard(set(), set()) == 1.0
    assert T.normalize_ws("  a\t b\n\nc ") == "a b c"


def test_quality_and_langid():
    q = T.quality_features("The quick brown fox. The end.")
    assert q["n_tokens"] == 6.0
    assert 0 < q["stopword_ratio"] < 1
    assert T.langid("the cat and the dog of the house") == "en"
    assert T.langid("el perro y la casa de que un ser") == "es"
    assert T.langid("") == "und"


def test_urls():
    assert canonical_host("https://WWW.Example.COM:8080/a/b?q=1") == "example.com"
    assert canonical_url("http://www.example.com/a/b/") == "example.com/a/b"
    assert canonical_url("https://example.com/") == "example.com/"
    assert canonical_host("not a url") == ""


def test_rolling_fingerprints_deterministic():
    toks = T.tokens("one two three four five six seven eight nine ten")
    f1 = T.rolling_fingerprints(toks)
    f2 = T.rolling_fingerprints(list(toks))
    assert f1 == f2 and len(f1) <= 8


class TestPackageCanonicalizer:
    def test_versions_extras_separators(self):
        from mdmpublic_ray.functions.text import canonicalize_package_list as c

        s = "Numpy==1.26.4, pandas>=2.0 ; ray[data]~=2.49 torch@file:///x Pillow pillow==9"
        assert c(s) == "numpy,pandas,pillow,ray,torch"
        assert c("") == ""
        assert c("A_b.c==1 a-b-c") == "a-b-c"

    def test_idempotent_and_order_insensitive(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from mdmpublic_ray.functions.text import canonicalize_package_list as c

        name = st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzABC-_.0123456789", min_size=1, max_size=12
        )
        pkg = st.builds(
            lambda n, v: n + v,
            name,
            st.sampled_from(["", "==1.0", ">=2", "~=3.1", "[extra]==4"]),
        )

        @settings(max_examples=100, deadline=None)
        @given(st.lists(pkg, max_size=8))
        def run(pkgs):
            s = " ".join(pkgs)
            canon = c(s)
            assert c(canon) == canon  # idempotent
            import random

            sh = pkgs[:]
            random.Random(0).shuffle(sh)
            assert c(" ".join(sh)) == canon  # order-insensitive

        run()


# ---------------------------------------------------------------------------
# chunk_token_windows (functions/text.py) — RAG sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_token_windows_window_algebra():
    import pyarrow as pa

    from mdmpublic_ray.functions.text import chunk_token_windows

    toks = [f"t{i}" for i in range(10)]
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([" ".join(toks)])})
    out = chunk_token_windows(t, size=4, stride=3).to_pandas()
    # starts 0,3,6,9 -> windows [0:4),[3:7),[6:10),[9:10)
    assert list(out["chunk_idx"]) == [0, 1, 2, 3]
    assert list(out["n_tokens"]) == [4, 4, 4, 1]
    assert out["chunk_text"][0] == "t0 t1 t2 t3"
    assert out["chunk_text"][1] == "t3 t4 t5 t6"
    assert out["chunk_text"][3] == "t9"
    # every chunk is a substring of the source (single-space separated)
    src = " ".join(toks)
    assert all(c in src for c in out["chunk_text"])


def test_chunk_token_windows_unicode_and_edges():
    import pyarrow as pa

    from mdmpublic_ray.functions.text import chunk_token_windows

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["héllo wörld ünïcode", "", "one"]),
        }
    )
    out = chunk_token_windows(t, size=2, stride=2).to_pandas()
    by = {(r.doc_id, r.chunk_idx): r for r in out.itertuples()}
    assert by[(1, 0)].chunk_text == "héllo wörld"
    assert by[(1, 1)].chunk_text == "ünïcode"
    # empty text = one empty token (regexp_split_to_array('',' ') parity)
    assert by[(2, 0)].chunk_text == "" and by[(2, 0)].n_tokens == 1
    assert by[(3, 0)].chunk_text == "one" and by[(3, 0)].n_tokens == 1


def test_chunk_token_windows_sliced_input():
    """The kernel reads the arrow buffers directly — it must honor a
    non-zero array offset (sliced batch)."""
    import pyarrow as pa

    from mdmpublic_ray.functions.text import chunk_token_windows

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b c", "d e", "f", "g h i j"]),
        }
    ).slice(1, 2)
    out = chunk_token_windows(t, size=2, stride=1).to_pandas()
    assert set(out["doc_id"]) == {2, 3}
    assert out[out["doc_id"] == 2]["chunk_text"].tolist() == ["d e", "e"]
    assert out[out["doc_id"] == 3]["chunk_text"].tolist() == ["f"]


def test_chunk_token_windows_large_string_and_nulls():
    """Round-3 advice guards: large_string offsets are read as int64 (not
    silently misparsed as int32), nulls chunk as empty text, and a
    non-string column raises a clear TypeError."""
    import pyarrow as pa
    import pytest

    from mdmpublic_ray.functions.text import chunk_token_windows

    texts = ["a b c d e", None, "x y"]
    t32 = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()), "text": pa.array(texts)}
    )
    t64 = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    a = chunk_token_windows(t32, size=2, stride=2).to_pandas()
    b = chunk_token_windows(t64, size=2, stride=2).to_pandas()
    assert a.equals(b)
    # null text behaves as '' (one empty token)
    null_rows = a[a["doc_id"] == 2]
    assert null_rows["chunk_text"].tolist() == [""]
    assert null_rows["n_tokens"].tolist() == [1]

    bad = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array([42], pa.int64())}
    )
    with pytest.raises(TypeError, match="string"):
        chunk_token_windows(bad)


def test_chunk_token_windows_oversize_batch_splits_not_large_string():
    """Round-4 advice: a batch whose chunk output would cross the int32
    offset bound is SPLIT recursively so every output batch stays plain
    ``string`` (a one-off large_string batch fails Arrow/Ray schema
    unification against other batches downstream)."""
    import pyarrow as pa

    from mdmpublic_ray.functions import text as textmod
    from mdmpublic_ray.functions.text import chunk_token_windows

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b c d", "e f", "g h i", "j"]),
        }
    )
    want = chunk_token_windows(t, size=2, stride=1).to_pandas()
    old = textmod._CHUNK_TEXT_MAX_BYTES
    textmod._CHUNK_TEXT_MAX_BYTES = 14  # forces the split path
    try:
        got = chunk_token_windows(t, size=2, stride=1)
    finally:
        textmod._CHUNK_TEXT_MAX_BYTES = old
    assert got["chunk_text"].type == pa.string()
    assert got.to_pandas().equals(want)

    # a single doc over the bound cannot split — loud error, not a
    # silently schema-breaking large_string batch
    import pytest

    one = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["a b c d e"])}
    )
    textmod._CHUNK_TEXT_MAX_BYTES = 2
    try:
        with pytest.raises(ValueError, match="int32"):
            chunk_token_windows(one, size=3, stride=3)
    finally:
        textmod._CHUNK_TEXT_MAX_BYTES = old
