"""Pairwise scoring: exact-ish Jaccard from bottom-k sketches + Jaro-Winkler
on url/title (SURVEY.md §7.1 M4; BASELINE.json north_star scorers).

Features are joined onto pairs with Ray's hash-shuffle ``Dataset.join``
(both sides large ⇒ no broadcast). The scorer itself is a stateless
``map_batches`` with numpy set-intersection per pair — pairs are the
bounded output of capped blocking, so per-pair Python cost is acceptable;
the heavy per-*document* work happened once in the features stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import jaro_winkler

# score = weighted blend; is_match is thresholded on the blend.
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


# Below this many feature rows the features table is broadcast (ray.put
# once, zero-copy per worker) instead of shuffle-joined twice — the
# broadcast-vs-shuffle join selection every planner does on side size.
# Budget is BYTES, not rows: a feature row is ~1.4 KB (sketch_k×8 + url/
# title), so 1M rows ≈ 1.4 GB — one shared-memory copy per NODE, fine on
# 128 GB workers. The shuffle join is the fallback beyond that, but note
# its cost shape: the joined intermediate carries BOTH sketches per pair
# (~2.7 KB × pairs — measured 65 GB through the shuffle for a 24M-pair
# corpus, vs a 310 MB broadcast). The true beyond-broadcast design is a
# bucketed on-disk feature store probed per pair partition; until feature
# tables exceed node memory, broadcast is strictly better.
BROADCAST_FEATURES_THRESHOLD = 1_000_000


def score_pairs(
    pairs_ds,
    features_ds,
    *,
    num_partitions: int | None = None,
    threshold: float = DEFAULT_THRESHOLD,
    sketch_k: int = 160,
    broadcast_threshold: int = BROADCAST_FEATURES_THRESHOLD,
):
    """pairs(url_a, url_b) ⋈ features ×2 → scored pairs
    (url_a, url_b, jaccard, jw_title, jw_url, score, is_match).

    Physical plan is size-aware: features under ``broadcast_threshold``
    rows ride the object store into a scorer actor pool (zero shuffles);
    larger features go through two bucketed hash joins. Pass
    ``broadcast_threshold=0`` to force the shuffle path (tests do).
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
        target_blocks = max(2, min(1024, n_pairs // 4096 + 1))
        if pairs_ds.num_blocks() < target_blocks:
            pairs_ds = pairs_ds.repartition(target_blocks)
    except Exception:
        pass

    # features is a materialized stage in run_er → count() is free
    if broadcast_threshold and features_ds.count() <= broadcast_threshold:
        return _score_broadcast(pairs_ds, features_ds, threshold, sketch_k)
    fa = features_ds.map_batches(
        lambda t: pa.table(
            {"uid_fa": t["uid"], "url_a": t["url"], "title_a": t["title"],
             "sketch_a": t["sketch"]}
        ),
        batch_format="pyarrow",
    )
    fb = features_ds.map_batches(
        lambda t: pa.table(
            {"uid_fb": t["uid"], "url_b": t["url"], "title_b": t["title"],
             "sketch_b": t["sketch"]}
        ),
        batch_format="pyarrow",
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
        return _score_kernel(
            batch["url_a"].to_pylist(),
            batch["url_b"].to_pylist(),
            batch["title_a"].to_pylist(),
            batch["title_b"].to_pylist(),
            [np.frombuffer(s, dtype=np.uint64) for s in batch["sketch_a"].to_pylist()],
            [np.frombuffer(s, dtype=np.uint64) for s in batch["sketch_b"].to_pylist()],
            threshold,
            sketch_k,
        )

    return joined.map_batches(score, batch_format="pyarrow")


def _score_kernel(ua, ub, ta, tb, sa, sb, threshold: float, sketch_k: int) -> pa.Table:
    """``sa``/``sb``: per-pair uint64 sketch arrays (views are fine).
    Emits each pair with url_a < url_b lexicographically (pair identity is
    uid-ordered upstream; scoring features are symmetric, so swapping
    sides never changes the score)."""
    swap = [i for i in range(len(ua)) if ub[i] < ua[i]]
    if swap:
        ua, ub, ta, tb, sa, sb = list(ua), list(ub), list(ta), list(tb), list(sa), list(sb)
        for i in swap:
            ua[i], ub[i] = ub[i], ua[i]
            ta[i], tb[i] = tb[i], ta[i]
            sa[i], sb[i] = sb[i], sa[i]
    n = len(ua)
    jac = np.empty(n, dtype=np.float64)
    jwt = np.empty(n, dtype=np.float64)
    jwu = np.empty(n, dtype=np.float64)
    for i in range(n):
        jac[i] = sketch_jaccard(sa[i], sb[i], sketch_k)
        jwt[i] = jaro_winkler(ta[i], tb[i])
        jwu[i] = jaro_winkler(ua[i], ub[i])
    sc = W_JACCARD * jac + W_TITLE * jwt + W_URL * jwu
    return pa.table(
        {
            "url_a": pa.array(ua, pa.string()),
            "url_b": pa.array(ub, pa.string()),
            "jaccard": pa.array(jac),
            "jw_title": pa.array(jwt),
            "jw_url": pa.array(jwu),
            "score": pa.array(sc),
            "is_match": pa.array(sc >= threshold),
        }
    )


# Per-worker-process cache of the broadcast feature index, keyed by the
# object ref hex. Scoring runs as stateless TASKS (full-width instantly,
# no actor-pool ramp); each worker builds the url→row index once on first
# touch. The sketch payload is one contiguous uint64 matrix — ray.get
# maps it ZERO-COPY from shared memory per node (a dict of per-url tuples
# would be re-pickled per worker: measured ~45 MB × pool size of pure
# unpickle overhead).
_FEAT_CACHE: dict = {}


def _feat_index(features_ref):
    key = features_ref.hex()
    if key not in _FEAT_CACHE:
        import ray

        uids, urls, titles, mat, lens = ray.get(features_ref)
        _FEAT_CACHE.clear()  # one live broadcast per worker is plenty
        _FEAT_CACHE[key] = (
            {u: i for i, u in enumerate(uids)},
            urls,
            titles,
            mat,
            lens,
        )
    return _FEAT_CACHE[key]


def _score_broadcast_batch(
    batch: pa.Table, features_ref, threshold: float, sketch_k: int
) -> pa.Table:
    idx, urls, titles, mat, lens = _feat_index(features_ref)
    ia = [idx[u] for u in batch["uid_a"].to_pylist()]
    ib = [idx[u] for u in batch["uid_b"].to_pylist()]
    return _score_kernel(
        [urls[i] for i in ia],
        [urls[i] for i in ib],
        [titles[i] for i in ia],
        [titles[i] for i in ib],
        [mat[i, : lens[i]] for i in ia],
        [mat[i, : lens[i]] for i in ib],
        threshold,
        sketch_k,
    )


def _score_broadcast(pairs_ds, features_ds, threshold: float, sketch_k: int):
    import ray

    uids: list[int] = []
    urls: list[str] = []
    titles: list[str] = []
    sketch_rows: list[bytes] = []
    for b in features_ds.select_columns(["uid", "url", "title", "sketch"]).iter_batches(
        batch_format="pyarrow"
    ):
        uids.extend(b["uid"].to_pylist())
        urls.extend(b["url"].to_pylist())
        titles.extend(b["title"].to_pylist())
        sketch_rows.extend(b["sketch"].to_pylist())
    n = len(urls)
    lens = np.array([len(s) // 8 for s in sketch_rows], dtype=np.int64)
    mat = np.zeros((n, sketch_k), dtype=np.uint64)
    for i, s in enumerate(sketch_rows):
        row = np.frombuffer(s, dtype=np.uint64)
        mat[i, : row.size] = row
    import functools

    ref = ray.put((uids, urls, titles, mat, lens))
    return pairs_ds.map_batches(
        functools.partial(
            _score_broadcast_batch,
            features_ref=ref,
            threshold=threshold,
            sketch_k=sketch_k,
        ),
        batch_format="pyarrow",
        # 2048 (not 8192): pair batches are tiny rows; smaller batches keep
        # every worker busy on modest pair counts
        batch_size=2048,
    )
