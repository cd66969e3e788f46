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
# once, read per scorer actor) instead of shuffle-joined twice — the
# broadcast-vs-shuffle join selection every planner does on side size.
BROADCAST_FEATURES_THRESHOLD = 50_000


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

    # features is a materialized stage in run_er → count() is free
    if broadcast_threshold and features_ds.count() <= broadcast_threshold:
        return _score_broadcast(pairs_ds, features_ds, threshold, sketch_k)
    fa = features_ds.map_batches(
        lambda t: pa.table(
            {"url": t["url"], "title_a": t["title"], "sketch_a": t["sketch"]}
        ),
        batch_format="pyarrow",
    )
    fb = features_ds.map_batches(
        lambda t: pa.table(
            {"url": t["url"], "title_b": t["title"], "sketch_b": t["sketch"]}
        ),
        batch_format="pyarrow",
    )
    from .util import bucketed_join

    fa = fa.map_batches(
        lambda t: t.rename_columns(["url_fa", "title_a", "sketch_a"]),
        batch_format="pyarrow",
    )
    fb = fb.map_batches(
        lambda t: t.rename_columns(["url_fb", "title_b", "sketch_b"]),
        batch_format="pyarrow",
    )
    joined = bucketed_join(
        bucketed_join(pairs_ds, fa, "url_a", "url_fa", n_buckets=num_partitions),
        fb,
        "url_b",
        "url_fb",
        n_buckets=num_partitions,
    )

    def score(batch: pa.Table) -> pa.Table:
        return _score_kernel(
            batch["url_a"].to_pylist(),
            batch["url_b"].to_pylist(),
            batch["title_a"].to_pylist(),
            batch["title_b"].to_pylist(),
            batch["sketch_a"].to_pylist(),
            batch["sketch_b"].to_pylist(),
            threshold,
            sketch_k,
        )

    return joined.map_batches(score, batch_format="pyarrow")


def _score_kernel(ua, ub, ta, tb, sa, sb, threshold: float, sketch_k: int) -> pa.Table:
    n = len(ua)
    jac = np.empty(n, dtype=np.float64)
    jwt = np.empty(n, dtype=np.float64)
    jwu = np.empty(n, dtype=np.float64)
    for i in range(n):
        jac[i] = sketch_jaccard(
            np.frombuffer(sa[i], dtype=np.uint64),
            np.frombuffer(sb[i], dtype=np.uint64),
            sketch_k,
        )
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


class _BroadcastScorer:
    """Actor: features dict from the object store (once per actor, ST5
    pattern), per-batch pair lookup + shared scoring kernel."""

    def __init__(self, features_ref, threshold: float, sketch_k: int):
        import ray

        self.feat = ray.get(features_ref)  # url -> (title, sketch_bytes)
        self.threshold = threshold
        self.sketch_k = sketch_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ua = batch["url_a"].to_pylist()
        ub = batch["url_b"].to_pylist()
        fa = [self.feat[u] for u in ua]
        fb = [self.feat[u] for u in ub]
        return _score_kernel(
            ua,
            ub,
            [f[0] for f in fa],
            [f[0] for f in fb],
            [f[1] for f in fa],
            [f[1] for f in fb],
            self.threshold,
            self.sketch_k,
        )


def _score_broadcast(pairs_ds, features_ds, threshold: float, sketch_k: int):
    import ray

    feat: dict[str, tuple] = {}
    for b in features_ds.select_columns(["url", "title", "sketch"]).iter_batches(
        batch_format="pyarrow"
    ):
        for u, t, s in zip(
            b["url"].to_pylist(), b["title"].to_pylist(), b["sketch"].to_pylist()
        ):
            feat[u] = (t, s)
    ref = ray.put(feat)
    return pairs_ds.map_batches(
        _BroadcastScorer,
        fn_constructor_args=(ref, threshold, sketch_k),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 8),
        num_cpus=1,
    )
