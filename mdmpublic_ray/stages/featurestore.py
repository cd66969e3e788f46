"""Bucketed feature store: the beyond-broadcast scoring path.

``score_pairs`` has three physical plans (scoring.py): broadcast the
feature table when it fits a node's memory, two bucketed hash joins as
the store-less fallback, and THIS plan for web scale. The join fallback
has a bad cost shape — the joined intermediate carries BOTH ~1.3 KB
sketch payloads per candidate pair (measured 65 GB through the shuffle
for a 24M-pair corpus vs a 310 MB broadcast). The store plan instead:

- persists features ONCE as uid-bucketed parquet (a stage checkpoint,
  exactly like the reference pipeline's per-stage snapshots,
  ``jenkins_scripts/jenkins/collect_files.sh`` ancestry via SURVEY
  §2.1 S7/S10), written with ``partition_cols`` so a 100-TB store is
  resumable / appendable per bucket directory;
- DECODES each bucket exactly once, cluster-wide, into the Ray object
  store (one remote task per bucket → scoring-ready payload in plasma:
  sorted uids, padded sketch matrix, dictionary-coded url/title packs).
  This is the build side of a distributed hash join, sharded across the
  cluster's aggregate plasma — the thing a single-node broadcast cannot
  be at 100 TB. Workers map payloads in ZERO-COPY (``ray.get`` of numpy
  /Arrow views over shared memory), so neither worker count nor task
  count multiplies the decode cost — the round-4 soak measured the
  per-task re-decode of the previous design at 3.9× the broadcast plan;
- shuffles only the 16-byte uid PAIRS, grouped by (bucket(uid_a),
  bucket(uid_b)); each task probes the ≤2 payloads per group it holds.
  Exchange bytes ∝ pairs × 16 B, never pairs × sketch bytes.

Scoring semantics are IDENTICAL to the other two paths (same kernels:
bottom-k sketch Jaccard — the two-matrix indexed native form — and
dictionary-coded Jaro-Winkler via ``scoring.coded_jw_pair``); equality
of outputs against the broadcast path is asserted in
tests/test_featurestore.py.

Multi-node note: payload refs ride the map closure and are fetched with
``ray.get`` inside the task, so Ray's locality-aware scheduling does not
steer tasks toward their buckets; on a real cluster each node pulls a
bucket at most once into its local plasma (then every task on that node
maps it zero-copy), which bounds transfer at n_nodes × bucket_bytes
worst case. A locality-steered variant would pass the two refs as task
arguments; measured single-node there is no difference.
"""

from __future__ import annotations

import json
import os

import numpy as np
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


def _decode_payload(store_dir: str, k: int, sketch_k: int, with_emb: bool):
    """Read + decode ONE store bucket into a scoring-ready payload:
    (uids sorted, urls Arrow, url pack, title pack, padded sketch
    matrix, lens, emb matrix|None) — the per-bucket analogue of the
    broadcast payload (scoring._score_broadcast), packs included so
    scoring tasks never touch Python strings."""
    import pyarrow.parquet as pq

    from .scoring import (
        _emb_matrix_from_binary,
        pack_string_column,
        pad_sketch_column,
    )

    path = os.path.join(store_dir, f"fs_bucket={int(k)}")
    if not os.path.isdir(path):
        # partitioned writes create directories only for non-empty
        # buckets; an absent one is a valid empty bucket
        empty_pack = (
            np.zeros(0, np.int64),
            np.zeros(0, np.uint32),
            np.zeros(1, np.int64),
        )
        return (
            np.zeros(0, np.int64),
            pa.array([], pa.string()),
            empty_pack,
            empty_pack,
            np.zeros((0, sketch_k), np.uint64),
            np.zeros(0, np.int64),
            np.zeros((0, 1)) if with_emb else None,
        )
    cols = ["uid", "url", "title", "sketch"] + (["emb"] if with_emb else [])
    tbl = pq.read_table(path, columns=cols).combine_chunks()
    tbl = tbl.take(pc.sort_indices(tbl["uid"])).combine_chunks()
    mat, lens = pad_sketch_column(tbl["sketch"], width=sketch_k)
    urls = tbl["url"].combine_chunks()
    return (
        tbl["uid"].to_numpy(zero_copy_only=False),
        urls,
        pack_string_column(urls),
        pack_string_column(tbl["title"].combine_chunks()),
        np.ascontiguousarray(mat, dtype=np.uint64),
        np.ascontiguousarray(lens, dtype=np.int64),
        _emb_matrix_from_binary(tbl["emb"]) if with_emb else None,
    )


# Per-worker-process LRU of direct-read decoded payloads (the storeless
# fallback / test path — the distributed plan caches by object REF, see
# _payload_from_ref, where entries are zero-copy plasma views).
_BUCKET_CACHE: dict = {}
_BUCKET_CACHE_MAX = 4


def _load_bucket(store_dir: str, k: int, sketch_k: int, with_emb: bool = False):
    key = (store_dir, int(k), bool(with_emb))
    hit = _BUCKET_CACHE.pop(key, None)
    if hit is not None:
        _BUCKET_CACHE[key] = hit  # re-insert = move to MRU position
        return hit
    payload = _decode_payload(store_dir, k, sketch_k, with_emb)
    while len(_BUCKET_CACHE) >= _BUCKET_CACHE_MAX:
        _BUCKET_CACHE.pop(next(iter(_BUCKET_CACHE)))  # evict LRU
    _BUCKET_CACHE[key] = payload
    return payload


# Per-worker cache of deserialized payload handles keyed by object-ref
# hex. ray.get of a plasma object is zero-copy (numpy/Arrow buffers view
# shared memory), so entries cost tuple-of-views only — the cache avoids
# repeated deserialization, not data copies, and can safely span every
# bucket a worker touches.
_REF_CACHE: dict = {}
_REF_CACHE_MAX = 256


def _payload_from_ref(ref):
    key = ref.hex()
    hit = _REF_CACHE.pop(key, None)
    if hit is None:
        import ray

        hit = ray.get(ref)
    _REF_CACHE[key] = hit
    while len(_REF_CACHE) > _REF_CACHE_MAX:
        _REF_CACHE.pop(next(iter(_REF_CACHE)))
    return hit


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
    two payloads: the two-matrix indexed native Jaccard reads sketch
    rows in place (no per-pair gather), and Jaro-Winkler runs on the
    per-bucket dictionary packs (scoring.coded_jw_pair)."""
    from ..functions import native as _nat
    from .scoring import _blend, coded_jw_pair, sketch_jaccard_batch

    uids_a, urls_a, upack_a, tpack_a, mat_a, lens_a, emb_a = pa_payload
    uids_b, urls_b, upack_b, tpack_b, mat_b, lens_b, emb_b = pb_payload
    ia = np.clip(np.searchsorted(uids_a, uid_a), 0, max(len(uids_a) - 1, 0))
    ib = np.clip(np.searchsorted(uids_b, uid_b), 0, max(len(uids_b) - 1, 0))
    # a pair uid absent from its store bucket means the store and the
    # pairs stage disagree about the corpus — fail loudly, a silent
    # wrong-row gather would score the wrong documents
    if len(uids_a) == 0 or not np.array_equal(uids_a[ia], uid_a):
        raise ValueError("feature store probe miss: uid_a not in bucket")
    if len(uids_b) == 0 or not np.array_equal(uids_b[ib], uid_b):
        raise ValueError("feature store probe miss: uid_b not in bucket")
    # score each DISTINCT (uid_a, uid_b) once, expand by the inverse map
    key = ia.astype(np.int64) * np.int64(len(uids_b)) + ib
    ukey, inv = np.unique(key, return_inverse=True)
    uia = (ukey // len(uids_b)).astype(np.int64)
    uib = (ukey % len(uids_b)).astype(np.int64)
    lib = _nat.get_lib()
    if lib is not None:
        jac = np.empty(uia.size, dtype=np.float64)
        lib.sketch_jacc_idx2(
            _nat.ptr(mat_a, _nat._p_u64), np.int64(mat_a.shape[1]),
            _nat.ptr(lens_a, _nat._p_i64),
            _nat.ptr(mat_b, _nat._p_u64), np.int64(mat_b.shape[1]),
            _nat.ptr(lens_b, _nat._p_i64),
            _nat.ptr(uia, _nat._p_i64), _nat.ptr(uib, _nat._p_i64),
            np.int64(uia.size), np.int64(sketch_k),
            _nat.ptr(jac, _nat._p_f64),
        )
        jac = jac[inv]
    else:
        jac = sketch_jaccard_batch(
            mat_a[uia], lens_a[uia], mat_b[uib], lens_b[uib], sketch_k
        )[inv]
    jwt = coded_jw_pair(tpack_a, tpack_b, uia, uib)[inv]
    jwu = coded_jw_pair(upack_a, upack_b, uia, uib)[inv]
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

    Physical plan: one remote decode task per store bucket builds the
    scoring payloads in plasma (each decoded ONCE cluster-wide); pairs
    are tagged with their (bucket(uid_a), bucket(uid_b)) group key, ONE
    bucketed shuffle of the 16-byte pair rows, then each task probes the
    ≤2 payload refs per group it holds — zero-copy shared-memory views,
    Arrow in and Arrow out (no pandas string materialization on a
    100M-row output). Nothing feature-sized is ever shuffled.
    """
    import ray

    from .scoring import scored_schema
    from .util import add_bucket, default_partitions

    meta = read_store_meta(store_dir)
    n_buckets = int(meta["n_buckets"])
    if emb_weight and not meta.get("has_emb"):
        raise ValueError(
            "emb_weight > 0 but this feature store was written without the "
            "emb column (features_stage emb_dim=0) — rebuild the store from "
            "emb-bearing features"
        )
    n_shuffle = n_shuffle_buckets or max(default_partitions() * 4, 32)

    # one decode task per bucket; refs stay in plasma until scoring ends
    decode = ray.remote(num_cpus=1)(_decode_payload)
    payload_refs = [
        decode.remote(store_dir, k, sketch_k, bool(emb_weight))
        for k in range(n_buckets)
    ]

    def tag(t: pa.Table) -> pa.Table:
        ka = fs_bucket_of(t["uid_a"].to_numpy(zero_copy_only=False), n_buckets)
        kb = fs_bucket_of(t["uid_b"].to_numpy(zero_copy_only=False), n_buckets)
        return t.append_column(
            "fs_gkey", pa.array(ka * n_buckets + kb, pa.int64())
        )

    tagged = pairs_ds.map_batches(tag, batch_format="pyarrow")
    out_schema = scored_schema(with_cos=bool(emb_weight))

    def run_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        if t.num_rows == 0:
            return out_schema.empty_table()
        # exact (ka, kb) groups laid out contiguously: one int sort
        t = t.take(pc.sort_indices(t["fs_gkey"])).combine_chunks()
        gk = t["fs_gkey"].to_numpy(zero_copy_only=False)
        ua = t["uid_a"].to_numpy(zero_copy_only=False)
        ub = t["uid_b"].to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(gk)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [gk.size]])
        outs = []
        for s, e in zip(starts, ends):
            ka, kb = int(gk[s]) // n_buckets, int(gk[s]) % n_buckets
            pl_a = _payload_from_ref(payload_refs[ka])
            pl_b = pl_a if kb == ka else _payload_from_ref(payload_refs[kb])
            outs.append(
                _score_group(
                    ua[s:e], ub[s:e], pl_a, pl_b, threshold, sketch_k,
                    emb_weight=emb_weight,
                )
            )
        return pa.concat_tables(outs).combine_chunks()

    return (
        add_bucket(tagged, "fs_gkey", n_shuffle)
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pyarrow")
    )
