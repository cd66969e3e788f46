"""Bucketed on-disk feature store: the beyond-broadcast scoring path.

``score_pairs`` has two physical plans (scoring.py): broadcast the
feature table when it fits a node's memory, else two bucketed hash
joins. The join fallback has a bad cost shape at web scale — the joined
intermediate carries BOTH ~1.3 KB sketch payloads per candidate pair
(measured 65 GB through the shuffle for a 24M-pair corpus vs a 310 MB
broadcast). This module is the design BASELINE.md §"broadcast threshold"
documents as the true fix: persist features ONCE as uid-bucketed
parquet (a stage checkpoint, exactly like the reference pipeline's
per-stage snapshots, `jenkins_scripts/jenkins/collect_files.sh` ancestry
via SURVEY §2.1 S7/S10), then shuffle only the 16-byte uid PAIRS,
grouped by (bucket(uid_a), bucket(uid_b)), and let each scoring task
PROBE the two bucket files it needs:

- exchange bytes ∝ pairs × 16 B (+ small group keys), never pairs ×
  sketch bytes — the 65 GB shuffle becomes ~400 MB at 24M pairs;
- store reads ∝ n_buckets × bucket_bytes per side worst case, bounded,
  column-pruned, and served from a per-worker-process LRU cache (hot
  buckets decode once per worker, not once per task);
- bucket files are written with `partition_cols` so a 100-TB store is
  resumable / appendable per bucket directory.

Scoring semantics are IDENTICAL to the other two paths (same kernels:
``sketch_jaccard_batch`` + dictionary-coded Jaro-Winkler); equality of
outputs against the broadcast path is asserted in
tests/test_featurestore.py.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

META_NAME = "_feature_store.json"


def fs_bucket_of(uid: np.ndarray, n_buckets: int) -> np.ndarray:
    """uid (int64 url-hash, blocking.doc_uid) → store bucket id.

    The SHARED routing function of writer and prober — change it and
    every existing store is invalidated, so it lives in exactly one
    place. Plain modulo over the unsigned view: uids are already
    64-bit hashes, so residues are balanced.
    """
    return (uid.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def write_feature_store(features_ds, store_dir: str, *, n_buckets: int = 64) -> dict:
    """features(uid, url, title, sketch) → ``store_dir/fs_bucket=K/*.parquet``.

    One extra column (``fs_bucket``) + one partitioned write — no
    shuffle: each map task appends its rows to the bucket directories
    it touches, which is what makes the store appendable at 100 TB
    (a failed writer re-runs only its own input shard). Returns the
    manifest dict (also written as ``_feature_store.json``).
    """

    def tag(t: pa.Table) -> pa.Table:
        uid = t["uid"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "fs_bucket", pa.array(fs_bucket_of(uid, n_buckets), pa.int64())
        )

    tagged = features_ds.map_batches(tag, batch_format="pyarrow")
    tagged.write_parquet(store_dir, partition_cols=["fs_bucket"])
    schema = features_ds.schema()
    meta = {
        "n_buckets": int(n_buckets),
        "version": 1,
        # the optional cosine-over-embedding column (features_stage
        # emb_dim) rides along in the partitioned write; record it so
        # probers can validate emb_weight requests against the layout
        "has_emb": "emb" in (schema.names if schema else []),
    }
    with open(os.path.join(store_dir, META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


def read_store_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, META_NAME)) as f:
        return json.load(f)


# Per-worker-process cache of DECODED bucket payloads:
# (uids sorted, urls Arrow, titles Arrow, sketch matrix, sketch lens).
# Small LRU — each entry is ~bucket_bytes; 4 buckets × (store/64) stays
# far under a worker's heap while giving task-to-task reuse on hot
# (ka, kb) groups.
_BUCKET_CACHE: dict = {}
_BUCKET_CACHE_MAX = 4


def _load_bucket(store_dir: str, k: int, sketch_k: int, with_emb: bool = False):
    key = (store_dir, int(k), bool(with_emb))
    hit = _BUCKET_CACHE.pop(key, None)
    if hit is not None:
        _BUCKET_CACHE[key] = hit  # re-insert = move to MRU position
        return hit
    import pyarrow.parquet as pq

    from .scoring import _emb_matrix_from_binary, pad_sketch_column

    cols = ["uid", "url", "title", "sketch"] + (["emb"] if with_emb else [])
    tbl = pq.read_table(
        os.path.join(store_dir, f"fs_bucket={int(k)}"),
        columns=cols,
    ).combine_chunks()
    tbl = tbl.take(pc.sort_indices(tbl["uid"]))
    mat, lens = pad_sketch_column(tbl["sketch"], width=sketch_k)
    payload = (
        tbl["uid"].to_numpy(zero_copy_only=False),
        tbl["url"].combine_chunks(),
        tbl["title"].combine_chunks(),
        mat,
        lens,
        _emb_matrix_from_binary(tbl["emb"]) if with_emb else None,
    )
    while len(_BUCKET_CACHE) >= _BUCKET_CACHE_MAX:
        _BUCKET_CACHE.pop(next(iter(_BUCKET_CACHE)))  # evict LRU
    _BUCKET_CACHE[key] = payload
    return payload


def _score_group(
    uid_a: np.ndarray,
    uid_b: np.ndarray,
    pa_payload,
    pb_payload,
    threshold: float,
    sketch_k: int,
    emb_weight: float = 0.0,
) -> pa.Table:
    """Score one (bucket_a, bucket_b) pair group against two decoded
    bucket payloads. Same kernels and distinct-pair dedup as the
    broadcast scorer (scoring._score_broadcast_batch), generalized to
    two payloads."""
    from .scoring import _blend, _jw_arrow, sketch_jaccard_batch

    uids_a, urls_a, titles_a, mat_a, lens_a, emb_a = pa_payload
    uids_b, urls_b, titles_b, mat_b, lens_b, emb_b = pb_payload
    ia = np.clip(np.searchsorted(uids_a, uid_a), 0, max(len(uids_a) - 1, 0))
    ib = np.clip(np.searchsorted(uids_b, uid_b), 0, max(len(uids_b) - 1, 0))
    # a pair uid absent from its store bucket means the store and the
    # pairs stage disagree about the corpus — fail loudly, a silent
    # wrong-row gather would score the wrong documents
    if len(uids_a) == 0 or not np.array_equal(uids_a[ia], uid_a):
        raise ValueError("feature store probe miss: uid_a not in bucket")
    if len(uids_b) == 0 or not np.array_equal(uids_b[ib], uid_b):
        raise ValueError("feature store probe miss: uid_b not in bucket")
    key = ia.astype(np.int64) * np.int64(len(uids_b)) + ib
    ukey, inv = np.unique(key, return_inverse=True)
    uia = (ukey // len(uids_b)).astype(np.int64)
    uib = (ukey % len(uids_b)).astype(np.int64)
    jac = sketch_jaccard_batch(mat_a[uia], lens_a[uia], mat_b[uib], lens_b[uib], sketch_k)[inv]
    # _jw_arrow dictionary-encodes the two gathered sides TOGETHER, so
    # equal strings share a code even across buckets (the cross-
    # dictionary edge the per-bucket coded packs could not give us).
    jwt = _jw_arrow(titles_a.take(pa.array(uia)), titles_b.take(pa.array(uib)))[inv]
    jwu = _jw_arrow(urls_a.take(pa.array(uia)), urls_b.take(pa.array(uib)))[inv]
    cos = None
    if emb_weight and emb_a is not None and emb_b is not None:
        cos = np.einsum("ij,ij->i", emb_a[uia], emb_b[uib])[inv]
    sc = _blend(jac, jwt, jwu, cos, emb_weight)
    ua_r = urls_a.take(pa.array(ia))
    ub_r = urls_b.take(pa.array(ib))
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


def score_pairs_store(
    pairs_ds,
    store_dir: str,
    *,
    threshold: float,
    sketch_k: int = 160,
    n_shuffle_buckets: int | None = None,
    emb_weight: float = 0.0,
):
    """pairs(uid_a, uid_b) × feature store → scored pairs (same schema
    as ``scoring.score_pairs``).

    Physical plan: tag each pair with its (bucket(uid_a), bucket(uid_b))
    group key, ONE bucketed shuffle of the 16-byte pair rows, then each
    task probes the ≤2 store buckets per group it holds (worker-local
    LRU decode cache). Nothing feature-sized is ever shuffled.
    """
    from .util import bucketed_map_groups, default_partitions

    meta = read_store_meta(store_dir)
    n_buckets = int(meta["n_buckets"])
    if emb_weight and not meta.get("has_emb"):
        raise ValueError(
            "emb_weight > 0 but this feature store was written without the "
            "emb column (features_stage emb_dim=0) — rebuild the store from "
            "emb-bearing features"
        )
    n_shuffle = n_shuffle_buckets or max(default_partitions() * 4, 32)

    def tag(t: pa.Table) -> pa.Table:
        ka = fs_bucket_of(t["uid_a"].to_numpy(zero_copy_only=False), n_buckets)
        kb = fs_bucket_of(t["uid_b"].to_numpy(zero_copy_only=False), n_buckets)
        return t.append_column(
            "fs_gkey", pa.array(ka * n_buckets + kb, pa.int64())
        )

    tagged = pairs_ds.map_batches(tag, batch_format="pyarrow")

    def run_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = {
                "url_a": pd.Series([], dtype=str),
                "url_b": pd.Series([], dtype=str),
                "jaccard": pd.Series([], dtype=np.float64),
                "jw_title": pd.Series([], dtype=np.float64),
                "jw_url": pd.Series([], dtype=np.float64),
            }
            if emb_weight:
                cols["cos_text"] = pd.Series([], dtype=np.float64)
            cols["score"] = pd.Series([], dtype=np.float64)
            cols["is_match"] = pd.Series([], dtype=bool)
            return pd.DataFrame(cols)
        outs = []
        # group keys arrive pre-hashed into this shuffle bucket; iterate
        # each exact (ka, kb) group so every probe touches ≤2 buckets
        for gkey, g in df.groupby("fs_gkey", sort=True):
            ka, kb = int(gkey) // n_buckets, int(gkey) % n_buckets
            pl_a = _load_bucket(store_dir, ka, sketch_k, with_emb=bool(emb_weight))
            pl_b = (
                pl_a
                if kb == ka
                else _load_bucket(store_dir, kb, sketch_k, with_emb=bool(emb_weight))
            )
            outs.append(
                _score_group(
                    g["uid_a"].to_numpy(),
                    g["uid_b"].to_numpy(),
                    pl_a,
                    pl_b,
                    threshold,
                    sketch_k,
                    emb_weight=emb_weight,
                ).to_pandas()
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_map_groups(tagged, "fs_gkey", run_bucket, n_buckets=n_shuffle)
