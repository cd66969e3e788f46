"""Pairwise scoring: exact-ish Jaccard from bottom-k sketches + Jaro-Winkler
on url/title (SURVEY.md §7.1 M4; BASELINE.json north_star scorers).

Features are joined onto pairs with Ray's hash-shuffle ``Dataset.join``
(both sides large ⇒ no broadcast). The scorer itself is a stateless
``map_batches`` whose kernels are fully batch-vectorized: bottom-k
Jaccard as one sort + adjacent-duplicate count over a padded uint64
matrix, Jaro-Winkler as a numpy char-position scan over
dictionary-coded strings (``functions.text.jaro_winkler_coded`` —
strings are transcoded to u32 codepoints ONCE, at broadcast build or
per batch side, never per pair) — no per-pair Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import encode_flat_u32_arrow, jaro_winkler_coded
from .util import pruned_scan

# score = weighted blend; is_match is thresholded on the blend. With the
# optional cosine-over-embedding signal (emb_weight > 0, see score_pairs)
# the blend becomes convex: (1-w)·base + w·cos_text.
W_JACCARD, W_TITLE, W_URL = 0.7, 0.2, 0.1
DEFAULT_THRESHOLD = 0.35


def sketch_jaccard(a: np.ndarray, b: np.ndarray, k: int) -> float:
    """Jaccard estimate from two bottom-k shingle sketches.

    Standard bottom-k estimator: restrict to the k smallest of the union;
    |both present| / k. When both sketches are complete shingle sets
    (docs with < k shingles) this IS the exact Jaccard.
    """
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    union = np.union1d(a, b)  # sorted
    kk = min(k, union.size)
    cut = union[:kk]
    inter = np.intersect1d(cut, a, assume_unique=True)
    both = np.isin(inter, b, assume_unique=True).sum()
    return float(both) / float(kk)


# Pad value for sketch matrices: >= every real hash, so a row's first
# len_a+len_b sorted slots hold exactly the real value multiset.
SKETCH_PAD = np.uint64(0xFFFFFFFFFFFFFFFF)


def sketch_jaccard_batch(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray, k: int
) -> np.ndarray:
    """Vectorized ``sketch_jaccard`` over padded uint64 matrices.

    ``A``/``B``: (n × ka/kb) rows padded with ``SKETCH_PAD``; ``la``/``lb``
    valid lengths. Rows must be SORTED-unique (sketches are bottom-k of a
    sorted-unique hash set), matching the scalar estimator's
    ``assume_unique``. Identical values per pair, no per-pair Python: sort
    the concatenated row, count adjacent duplicates (= values present in
    both sides) whose distinct rank falls inside the bottom-kk union cut.
    The native kernel (functions/_native.c sketch_jacc_rows) replaces the
    sort with a per-row two-pointer merge when available — same estimator,
    no (n × width) temporaries.
    """
    n = la.size
    if n == 0:
        return np.zeros(0)
    from ..functions import native as _nat

    lib = _nat.get_lib()
    if lib is not None:
        A_c = np.ascontiguousarray(A, dtype=np.uint64)
        B_c = np.ascontiguousarray(B, dtype=np.uint64)
        la_c = np.ascontiguousarray(la, dtype=np.int64)
        lb_c = np.ascontiguousarray(lb, dtype=np.int64)
        out = np.empty(n, dtype=np.float64)
        lib.sketch_jacc_rows(
            _nat.ptr(A_c, _nat._p_u64), np.int64(A_c.shape[1]),
            _nat.ptr(la_c, _nat._p_i64),
            _nat.ptr(B_c, _nat._p_u64), np.int64(B_c.shape[1]),
            _nat.ptr(lb_c, _nat._p_i64),
            np.int64(n), np.int64(k), _nat.ptr(out, _nat._p_f64),
        )
        return out
    s = np.sort(np.concatenate([A, B], axis=1), axis=1)
    tot = la + lb
    width = s.shape[1]
    valid = np.arange(width) < tot[:, None]
    dup = np.zeros((n, width), dtype=bool)
    dup[:, 1:] = s[:, 1:] == s[:, :-1]
    dup &= valid
    # narrow accumulator (int16 while width allows) — 4× less memory
    # traffic than the default int64 cumsum, which dominates this kernel
    rdt = np.int16 if width < 32767 else np.int64
    rank = np.cumsum(~dup & valid, axis=1, dtype=rdt)
    union = rank[:, -1].astype(np.int64)
    kk = np.minimum(k, union)
    both = np.count_nonzero(dup & (rank <= kk[:, None].astype(rdt)), axis=1)
    out = both / np.maximum(kk, 1)
    out[tot == 0] = 1.0
    return out


def pad_sketch_column(col, width: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Arrow binary column (uint64-packed sketches) → (padded matrix, lens).

    Zero-copy from the Arrow values buffer into one vectorized scatter —
    no per-row ``np.frombuffer``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_binary(col.type):
        col = col.cast(pa.binary())
    n = len(col)
    if n == 0:
        return np.full((0, width or 1), SKETCH_PAD, dtype=np.uint64), np.zeros(0, np.int64)
    # BinaryArray buffers: [validity, int32 offsets, data]; offsets are
    # relative to the data buffer and already account for array slicing.
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[col.offset : col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts = offs[:-1].astype(np.int64) // 8
    lens = (offs[1:].astype(np.int64) - offs[:-1]) // 8
    flat = data[: (len(data) // 8) * 8].view(np.uint64)
    w = width or max(int(lens.max()), 1)
    cols = np.arange(w)
    if flat.size == 0:
        return np.full((n, w), SKETCH_PAD, dtype=np.uint64), lens
    # one clamped gather + one masked overwrite — ~5× faster than a
    # boolean-mask scatter (no (n×w) bool temporaries, single pass)
    take = starts[:, None] + cols
    np.minimum(take, flat.size - 1, out=take)
    mat = flat[take]
    np.copyto(mat, SKETCH_PAD, where=cols >= lens[:, None])
    return mat, lens


# Below this many feature rows the features table is broadcast (ray.put
# once, zero-copy per worker) instead of shuffle-joined twice — the
# broadcast-vs-shuffle join selection every planner does on side size.
# Beyond it prefer the bucketed on-disk feature store
# (stages/featurestore.py): pairs-only shuffle + per-task bucket probe —
# pass ``feature_store_dir`` to get that plan. The two shuffle joins
# remain the store-less fallback; their cost shape is bad at web scale
# (the joined intermediate carries BOTH sketches per pair, ~2.7 KB ×
# pairs — measured 65 GB through the shuffle for a 24M-pair corpus, vs
# a pairs-sized store shuffle).
# 128-GiB calibration point, memory-scaled like the other plan caps
# (round 4): the payload is ~1.6 KB/row (bottom-k sketch dominates), so
# 6M rows ≈ 9.6 GB — ONE shared-memory plasma object; the scorer's
# per-worker payload is numpy/Arrow views of it (zero-copy ray.get), so
# worker count does not multiply the cost. Measured at the 4M-page soak
# (3.23M features / 107.8M pairs): broadcast 72.2 s vs store/join
# ~280 s — the old hard 1M cap was 3.9× off on this box. The effective
# cap scales with the driver node's Ray "memory" resource (~0.7×
# system RAM), so the 6M base lands at ~4.1M rows here; the bucketed
# feature store remains the beyond-memory answer.
BROADCAST_FEATURES_THRESHOLD = 6_000_000


def broadcast_features_rows() -> int:
    """Memory-scaled effective broadcast cap (see constant above).

    ``GRAFT_FORCE_STORE_SCORING=1`` returns 0 — an ops/bench hook that
    forces the beyond-broadcast plan so the 100-TB path can be soaked
    on corpora that would otherwise take the broadcast fast path."""
    import os

    if os.environ.get("GRAFT_FORCE_STORE_SCORING"):
        return 0
    from .util import memory_scaled_cap

    return memory_scaled_cap(BROADCAST_FEATURES_THRESHOLD, lo=100_000)


def scored_schema(with_cos: bool = False) -> pa.Schema:
    """The scored-pairs output schema — the ONE definition shared by
    ``score_pairs`` consumers that must fabricate typed empty results
    (er.py, er_incremental.py). ``with_cos`` adds the optional
    cosine-over-embedding column (present iff ``emb_weight > 0``)."""
    fields = [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("jaccard", pa.float64()),
        ("jw_title", pa.float64()),
        ("jw_url", pa.float64()),
    ]
    if with_cos:
        fields.append(("cos_text", pa.float64()))
    fields += [("score", pa.float64()), ("is_match", pa.bool_())]
    return pa.schema(fields)


def _emb_matrix_from_binary(col: pa.Array) -> np.ndarray:
    """(n,) binary column of packed float32 rows → (n, d) float64.

    Zero-copy on the hot path: the features stage always emits equal-width
    null-free ``pa.binary()`` (blocking._binary_from_flat), so the values
    buffer is viewed as float32 directly — no ``to_pylist`` / join
    (round-3 review item). Ragged or null-bearing input (hand-built test
    tables only) falls back to a per-row decode."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0))
    if pa.types.is_fixed_size_binary(col.type) and col.null_count == 0:
        w = col.type.byte_width
        flat = np.frombuffer(col.buffers()[1], dtype=np.uint8)[
            col.offset * w : (col.offset + n) * w
        ]
        return flat.view(np.float32).reshape(n, -1).astype(np.float64)
    if pa.types.is_binary(col.type):
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ]
        lens = offs[1:] - offs[:-1]
        w = int(lens[0]) if n else 0
        if col.null_count == 0 and w % 4 == 0 and w > 0 and bool((lens == w).all()):
            flat = np.frombuffer(col.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
            return flat.reshape(n, w).view(np.float32).astype(np.float64)
    raise TypeError(
        "emb column must be an equal-width, null-free binary/fixed_size_binary "
        f"column of packed float32 rows; got {col.type} with "
        f"{col.null_count} nulls"
    )


def _blend(jac, jwt, jwu, cos, emb_weight: float):
    base = W_JACCARD * jac + W_TITLE * jwt + W_URL * jwu
    if cos is None or not emb_weight:
        return base
    # convex blend: emb_weight=0 reproduces the base score exactly
    return (1.0 - emb_weight) * base + emb_weight * cos


def score_pairs(
    pairs_ds,
    features_ds,
    *,
    num_partitions: int | None = None,
    threshold: float = DEFAULT_THRESHOLD,
    sketch_k: int = 160,
    broadcast_threshold: int | None = None,
    feature_store_dir: str | None = None,
    emb_weight: float = 0.0,
    prebuilt_broadcast_ref=None,
):
    """pairs(url_a, url_b) ⋈ features ×2 → scored pairs
    (url_a, url_b, jaccard, jw_title, jw_url, [cos_text], score, is_match).

    ``emb_weight > 0`` adds the north-star cosine-over-embedding signal:
    features must carry the ``emb`` column (features_stage ``emb_dim``),
    per-pair cosine is a vectorized row dot of the L2-normalized hashed
    embeddings, and the score becomes the convex blend
    (1-w)·(0.7·jac + 0.2·jw_title + 0.1·jw_url) + w·cos. Supported on
    all three physical paths; a store WRITTEN without the emb column
    refuses an emb_weight probe loudly (featurestore meta ``has_emb``)
    rather than silently dropping the signal.

    Physical plan is size-aware: features under ``broadcast_threshold``
    rows ride the object store into a scorer actor pool (zero shuffles);
    larger features use the bucketed feature store when
    ``feature_store_dir`` is given (written there if absent — pairs-only
    shuffle, per-task bucket probe, stages/featurestore.py), else two
    bucketed hash joins. Pass ``broadcast_threshold=0`` to force a
    non-broadcast path (tests do).
    """
    from .util import default_partitions

    # full cluster width: the per-bucket merge + per-pair scoring loop is
    # CPU-bound, so fewer-but-bigger buckets serialize it (measured: P=3
    # was 1.5× slower than P=32 on 110k pairs).
    num_partitions = num_partitions or default_partitions()

    # Ray sizes shuffle output blocks by BYTES, so a few hundred thousand
    # 16-byte pair rows collapse into ONE block — and map parallelism is
    # block-bound, serializing this CPU-heavy stage onto one core
    # (measured: 231k pairs scored in 40s on 1 block vs ~2s re-blocked).
    # Re-block by ROW count before scoring; repartition of a tiny table
    # is milliseconds.
    try:
        n_pairs = pairs_ds.count()  # materialized upstream in run_er → free
        # ≥4096 rows/block so tiny pair sets still fan out; ~16k rows/block
        # past 64 blocks — 6.4M pairs as 1024 blocks spent ~15% of the
        # stage on per-task overhead vs 391 blocks (measured 13.8 → 11.7 s
        # at 32 CPUs), while 391 still keeps every core busy
        rows_per_block = 4096 if n_pairs < 1 << 20 else 16384
        target_blocks = max(2, min(1024, n_pairs // rows_per_block + 1))
        if pairs_ds.num_blocks() < target_blocks:
            pairs_ds = pairs_ds.repartition(target_blocks)
    except Exception:
        pass

    if broadcast_threshold is None:
        broadcast_threshold = broadcast_features_rows()
    # features is a materialized stage in run_er → count() is free
    if broadcast_threshold and features_ds.count() <= broadcast_threshold:
        return _score_broadcast(
            pairs_ds, features_ds, threshold, sketch_k, emb_weight=emb_weight,
            prebuilt_ref=prebuilt_broadcast_ref,
        )
    if feature_store_dir:
        import os as _os

        from .featurestore import (
            META_NAME,
            score_pairs_store,
            write_feature_store,
        )

        if not _os.path.exists(_os.path.join(feature_store_dir, META_NAME)):
            write_feature_store(features_ds, feature_store_dir)
        # an emb_weight request against a store written without the emb
        # column fails loudly inside score_pairs_store (meta has_emb)
        return score_pairs_store(
            pairs_ds, feature_store_dir, threshold=threshold, sketch_k=sketch_k,
            emb_weight=emb_weight,
        )
    def _side(t: pa.Table, s: str) -> pa.Table:
        cols = {
            f"uid_f{s}": t["uid"], f"url_{s}": t["url"],
            f"title_{s}": t["title"], f"sketch_{s}": t["sketch"],
        }
        if emb_weight:
            cols[f"emb_{s}"] = t["emb"]
        return pa.table(cols)

    fa = features_ds.map_batches(
        lambda t: _side(t, "a"), batch_format="pyarrow"
    )
    fb = features_ds.map_batches(
        lambda t: _side(t, "b"), batch_format="pyarrow"
    )
    from .util import bucketed_join

    joined = bucketed_join(
        bucketed_join(pairs_ds, fa, "uid_a", "uid_fa", n_buckets=num_partitions),
        fb,
        "uid_b",
        "uid_fb",
        n_buckets=num_partitions,
    )
    # the join's groupby output re-collapses into byte-sized blocks; the
    # scorer below is CPU-bound per ROW, so re-block again (same reason
    # as the pairs_ds repartition above — a 10M-pair join output landing
    # in a handful of blocks serializes scoring onto a few cores)
    try:
        joined = joined.repartition(
            max(2, min(1024, pairs_ds.count() // 4096 + 1))
        )
    except Exception:
        pass

    def score(batch: pa.Table) -> pa.Table:
        mat_a, len_a = pad_sketch_column(batch["sketch_a"])
        mat_b, len_b = pad_sketch_column(batch["sketch_b"])
        jac = sketch_jaccard_batch(mat_a, len_a, mat_b, len_b, sketch_k)
        jwt = _jw_arrow(batch["title_a"], batch["title_b"])
        jwu = _jw_arrow(batch["url_a"], batch["url_b"])
        cos = None
        if emb_weight:
            ea = _emb_matrix_from_binary(batch["emb_a"])
            eb = _emb_matrix_from_binary(batch["emb_b"])
            cos = np.einsum("ij,ij->i", ea, eb) if len(ea) else np.zeros(0)
        sc = _blend(jac, jwt, jwu, cos, emb_weight)
        # output urls in lexicographic order, Arrow-native (pair identity
        # is uid-ordered upstream; all features are symmetric)
        ua, ub = batch["url_a"].combine_chunks(), batch["url_b"].combine_chunks()
        lt = pc.less_equal(ua, ub)
        cols = {
            "url_a": pc.if_else(lt, ua, ub),
            "url_b": pc.if_else(lt, ub, ua),
            "jaccard": pa.array(jac),
            "jw_title": pa.array(jwt),
            "jw_url": pa.array(jwu),
        }
        if cos is not None:
            cols["cos_text"] = pa.array(cos)
        cols["score"] = pa.array(sc)
        cols["is_match"] = pa.array(sc >= threshold)
        return pa.table(cols)

    return joined.map_batches(score, batch_format="pyarrow")


# Per-worker-process cache of the broadcast feature table, keyed by the
# object ref hex. Scoring runs as stateless TASKS (full-width instantly,
# no actor-pool ramp). The payload is Arrow arrays + one contiguous
# uint64 sketch matrix, sorted by uid — ray.get maps the buffers
# ZERO-COPY from shared memory per node, and per-batch row lookup is a
# vectorized searchsorted instead of a Python dict probe per pair.
_FEAT_CACHE: dict = {}


def _feat_payload(features_ref):
    key = features_ref.hex()
    if key not in _FEAT_CACHE:
        import ray

        _FEAT_CACHE.clear()  # one live broadcast per worker is plenty
        _FEAT_CACHE[key] = ray.get(features_ref)
    return _FEAT_CACHE[key]


def pack_string_column(col: pa.Array):
    """Dictionary-code + u32-transcode a string column ONCE (at payload
    build — driver for the broadcast plan, decode task for the feature
    store) so scorer batches never touch Python strings. Returns
    (row → dict-index codes, flat u32 codepoints, int64 offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    d = pc.dictionary_encode(col)
    flat, offs = encode_flat_u32_arrow(d.dictionary)
    return (
        d.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        flat,
        offs,
    )


def coded_jw_pair(pack_a, pack_b, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Jaro-Winkler between rows ``ia`` of ``pack_a`` and rows ``ib`` of
    ``pack_b`` (both from :func:`pack_string_column`), with zero string
    round-trips. When the packs differ the two dictionaries are merged
    by offsetting the b-side codes — equal strings across packs then
    hold DIFFERENT codes, so they skip the equal-code shortcut and are
    computed the long way, which yields the same 1.0 (the native greedy
    scan touches O(len) chars for an equal pair)."""
    ca, fa, oa = pack_a
    cb, fb, ob = pack_b
    if pack_a is pack_b:
        return jaro_winkler_coded(fa, oa, ca[ia], cb[ib])
    flat = np.concatenate([fa, fb])
    offs = np.concatenate([oa, oa[-1] + ob[1:]])
    return jaro_winkler_coded(flat, offs, ca[ia], cb[ib] + (oa.size - 1))


def _jw_arrow(a, b) -> np.ndarray:
    """Jaro-Winkler over two Arrow string arrays with ZERO Python string
    round-trips: dictionary-encode the concatenation (equal strings ⇒
    equal codes), transcode the distinct values once
    (``encode_flat_u32_arrow``), then run the coded kernel — equality
    short-circuit, combo dedup and length-sorted chunking all happen on
    integer codes (round-2 review item: ``to_pylist`` dropped)."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    if a.null_count:
        a = pc.fill_null(a, "")
    if b.null_count:
        b = pc.fill_null(b, "")
    d = pc.dictionary_encode(pa.concat_arrays([a, b]))
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    flat, offs = encode_flat_u32_arrow(d.dictionary)
    return jaro_winkler_coded(flat, offs, codes[:n], codes[n:])


def _score_broadcast_batch(
    batch: pa.Table, features_ref, threshold: float, sketch_k: int,
    emb_weight: float = 0.0,
) -> pa.Table:
    uids, urls, upack, tpack, mat, lens, emb = _feat_payload(features_ref)
    ia = np.searchsorted(uids, batch["uid_a"].to_numpy(zero_copy_only=False))
    ib = np.searchsorted(uids, batch["uid_b"].to_numpy(zero_copy_only=False))
    # score each DISTINCT (uid_a, uid_b) once — hot-host sub-blocks and
    # multi-band LSH emit the same pair into a batch repeatedly, and the
    # sketch/JW kernels are the cost — then expand by the inverse map.
    key = ia.astype(np.int64) * np.int64(len(uids)) + ib
    ukey, inv = np.unique(key, return_inverse=True)
    uia = (ukey // len(uids)).astype(np.int64)
    uib = (ukey % len(uids)).astype(np.int64)
    from ..functions import native as _nat

    _lib = _nat.get_lib()
    if _lib is not None:
        # indexed native kernel: reads sketch rows in place — skips the
        # (pairs × sketch_k×8 × 2) gather that made this stage the
        # memory-bus hot spot (2.6 KB/pair at k=160)
        jac = np.empty(uia.size, dtype=np.float64)
        # no-ops when already contiguous/typed (the payload builder
        # guarantees it; this guards hand-built payloads in tests)
        mat = np.ascontiguousarray(mat, dtype=np.uint64)
        lens = np.ascontiguousarray(lens, dtype=np.int64)
        _lib.sketch_jacc_idx(
            _nat.ptr(mat, _nat._p_u64), np.int64(mat.shape[1]),
            _nat.ptr(lens, _nat._p_i64),
            _nat.ptr(uia, _nat._p_i64), _nat.ptr(uib, _nat._p_i64),
            np.int64(uia.size), np.int64(sketch_k),
            _nat.ptr(jac, _nat._p_f64),
        )
        jac = jac[inv]
    else:
        jac = sketch_jaccard_batch(
            mat[uia], lens[uia], mat[uib], lens[uib], sketch_k
        )[inv]
    # url/title strings were dictionary-coded + u32-transcoded ONCE at
    # broadcast build; per batch the JW kernel sees only integer codes.
    tcodes, tflat, toffs = tpack
    ucodes, uflat, uoffs = upack
    jwt = jaro_winkler_coded(tflat, toffs, tcodes[uia], tcodes[uib])[inv]
    jwu = jaro_winkler_coded(uflat, uoffs, ucodes[uia], ucodes[uib])[inv]
    cos = None
    if emb_weight and emb is not None:
        cos = np.einsum("ij,ij->i", emb[uia], emb[uib])[inv]
    sc = _blend(jac, jwt, jwu, cos, emb_weight)
    # output urls in lexicographic order, Arrow-native (pair identity is
    # uid-ordered upstream; all features are symmetric)
    ua_r = urls.take(pa.array(ia))
    ub_r = urls.take(pa.array(ib))
    lt = pc.less_equal(ua_r, ub_r)
    cols = {
        "url_a": pc.if_else(lt, ua_r, ub_r),
        "url_b": pc.if_else(lt, ub_r, ua_r),
        "jaccard": pa.array(jac),
        "jw_title": pa.array(jwt),
        "jw_url": pa.array(jwu),
    }
    if cos is not None:
        cols["cos_text"] = pa.array(cos)
    cols["score"] = pa.array(sc)
    cols["is_match"] = pa.array(sc >= threshold)
    return pa.table(cols)


def build_broadcast_features_ref(features_ds, *, sketch_k: int = 160,
                                 emb_weight: float = 0.0):
    """Build (and ``ray.put``) the broadcast feature payload the scorer
    actors consume — exposed separately from ``_score_broadcast`` so
    run_er can PREBUILD it on a driver thread concurrently with the
    blocks/pairs stages (the build needs only ``features``; its ~1 s of
    driver pull + encode otherwise sits on the critical path between
    pairs and scoring at every width — pure floor F)."""
    return _score_broadcast(
        None, features_ds, 0.0, sketch_k, emb_weight=emb_weight,
        _build_only=True,
    )


def _score_broadcast(pairs_ds, features_ds, threshold: float, sketch_k: int,
                     emb_weight: float = 0.0, prebuilt_ref=None,
                     _build_only: bool = False):
    import ray

    # Pad sketches to fixed width IN THE WORKERS (parallel, per batch);
    # the driver then only concatenates fixed-width buffers — a memcpy —
    # instead of paying the full-corpus pad (page-fault bound, measured
    # seconds at ~50k rows on the driver vs parallel in the map).
    fb_type = pa.binary(sketch_k * 8)

    def to_fixed(t: pa.Table) -> pa.Table:
        mat, lens = pad_sketch_column(t["sketch"], width=sketch_k)
        skfix = pa.Array.from_buffers(
            fb_type, mat.shape[0], [None, pa.py_buffer(mat.tobytes())]
        )
        cols = {
            "uid": t["uid"],
            "url": t["url"],
            "title": t["title"],
            "skfix": skfix,
            "slen": pa.array(lens),
        }
        if emb_weight:
            cols["emb"] = t["emb"]
        return pa.table(cols)

    if prebuilt_ref is not None:
        ref = prebuilt_ref
        return _apply_broadcast_scorer(
            pairs_ds, ref, threshold, sketch_k, emb_weight
        )
    feat_cols = ["uid", "url", "title", "sketch"] + (["emb"] if emb_weight else [])
    # materialize + one parallel ray.get: the iter_batches stream pulls
    # driver-serially (measured ~5x slower on the ~MB/row sketch
    # payload at 242k pages — this pull IS the broadcast-path floor)
    import ray as _ray

    _feat_mat = (
        pruned_scan(features_ds, feat_cols)
        .map_batches(to_fixed, batch_format="pyarrow")
        .materialize()
    )
    tbl = pa.concat_tables(
        [b for b in _ray.get(_feat_mat.to_arrow_refs()) if b.num_rows]
    ).combine_chunks()
    tbl = tbl.take(pc.sort_indices(tbl["uid"]))
    sk = tbl["skfix"].combine_chunks()
    mat = np.frombuffer(
        sk.buffers()[1], dtype=np.uint64, count=len(sk) * sketch_k,
        offset=sk.offset * sketch_k * 8,
    ).reshape(len(sk), sketch_k)
    _pack = pack_string_column
    urls_arr = tbl["url"].combine_chunks()
    emb_mat = _emb_matrix_from_binary(tbl["emb"]) if emb_weight else None
    ref = ray.put(
        (
            tbl["uid"].to_numpy(zero_copy_only=False),
            urls_arr,  # kept for emitting output url strings
            _pack(urls_arr),
            _pack(tbl["title"].combine_chunks()),
            mat,
            tbl["slen"].to_numpy(zero_copy_only=False),
            emb_mat,
        )
    )
    if _build_only:
        return ref
    return _apply_broadcast_scorer(pairs_ds, ref, threshold, sketch_k, emb_weight)


def _apply_broadcast_scorer(pairs_ds, ref, threshold, sketch_k, emb_weight):
    import functools

    return pairs_ds.map_batches(
        functools.partial(
            _score_broadcast_batch,
            features_ref=ref,
            threshold=threshold,
            sketch_k=sketch_k,
            emb_weight=emb_weight,
        ),
        batch_format="pyarrow",
        # 2048 (not 8192): pair batches are tiny rows; smaller batches keep
        # every worker busy on modest pair counts
        batch_size=2048,
    )
