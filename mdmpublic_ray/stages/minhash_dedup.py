"""MinHash-LSH near-duplicate clustering of the ``documents`` table —
the training-data dedup op (D5) applied outside the ER pipeline: shingle
→ minhash → band-bucket groupby → candidate pairs → exact-ish sketch
Jaccard verify → connected components → (doc_id, rep_id).

Reuses the ER engine's stages with doc_id (as string) standing in for
url; rep_id is the minimum doc_id of the near-dup component.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import hashing as H
from ..functions import text as T
from ..sources.tables import read_table
from .cluster import connected_components
from .pairs import candidate_pairs
from .scoring import sketch_jaccard
from .util import pruned_scan

NUM_PERM = 128
N_BANDS = 32  # 32×4: steeper LSH curve than ER (dedup wants high precision)
SKETCH_K = 160


_PERMS: dict = {}


def _doc_perms(seed: int):
    if seed not in _PERMS:
        _PERMS[seed] = H.minhash_permutations(NUM_PERM, seed=seed)
    return _PERMS[seed]


class _DocFeatures:
    """Kept as a callable class for signature stability; state is the
    per-process cached permutation family, so it also runs fine as a
    plain task (no actor ramp)."""

    def __init__(self, seed: int = 42):
        self.a, self.b = _doc_perms(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .blocking import _binary_from_flat

        ids = batch["doc_id"].to_pylist()
        _, th, toff = T.tokens_hashed_arrow(batch["text"])
        sh, soff = H.shingle_hashes_flat(th, toff, 3)
        sigs = H.minhash_signatures_flat(sh, soff, self.a, self.b)
        take = np.minimum(soff[1:] - soff[:-1], SKETCH_K)
        idx = np.repeat(soff[:-1], take) + (
            np.arange(int(take.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(take) - take, take)
        )
        n = len(ids)
        return pa.table(
            {
                "doc_key": pa.array([str(i) for i in ids], pa.string()),
                "uid": pa.array([int(i) for i in ids], pa.int64()),
                "sketch": _binary_from_flat(
                    sh[idx].tobytes(), (take * 8).astype(np.int64)
                ),
                "sig": _binary_from_flat(
                    np.ascontiguousarray(sigs).tobytes(),
                    np.full(n, sigs.shape[1] * 4, dtype=np.int64),
                ),
            }
        )


# Below this many docs the sketch table is broadcast (ray.put once) and
# pair verification is a zero-shuffle map — the same size-aware plan
# selection as stages/scoring.py. The two bucketed joins remain the
# beyond-broadcast path (forced with broadcast_threshold=0 in tests).
BROADCAST_SKETCH_THRESHOLD = 500_000

_SKETCH_CACHE: dict = {}


def _sketch_payload(ref):
    key = ref.hex()
    if key not in _SKETCH_CACHE:
        import ray

        _SKETCH_CACHE.clear()
        _SKETCH_CACHE[key] = ray.get(ref)
    return _SKETCH_CACHE[key]


def _sketch_broadcast_ref(feats):
    """(sorted uids, padded uint64 sketch matrix, lens) in the object
    store — fixed-width padding happens in the workers (parallel); the
    driver only concatenates fixed-width buffers (memcpy)."""
    import pyarrow.compute as pc
    import ray

    from .scoring import pad_sketch_column

    fb_type = pa.binary(SKETCH_K * 8)

    def to_fixed(t: pa.Table) -> pa.Table:
        mat, lens = pad_sketch_column(t["sketch"], width=SKETCH_K)
        skfix = pa.Array.from_buffers(
            fb_type, mat.shape[0], [None, pa.py_buffer(mat.tobytes())]
        )
        return pa.table(
            {"uid": t["uid"], "skfix": skfix, "slen": pa.array(lens)}
        )

    tbl = pa.concat_tables(
        [
            pa.table(b)
            for b in pruned_scan(feats, ["uid", "sketch"])
            .map_batches(to_fixed, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ]
    ).combine_chunks()
    tbl = tbl.take(pc.sort_indices(tbl["uid"]))
    sk = tbl["skfix"].combine_chunks()
    mat = np.frombuffer(
        sk.buffers()[1],
        dtype=np.uint64,
        count=len(sk) * SKETCH_K,
        offset=sk.offset * SKETCH_K * 8,
    ).reshape(len(sk), SKETCH_K)
    return ray.put(
        (
            tbl["uid"].to_numpy(zero_copy_only=False),
            mat,
            tbl["slen"].to_numpy(zero_copy_only=False),
        )
    )


def near_dup_clusters(
    sf_dir: str,
    *,
    threshold: float = 0.6,
    num_partitions=None,
    broadcast_threshold: int = BROADCAST_SKETCH_THRESHOLD,
    docs_ds=None,
):
    """documents → (doc_id, rep_id): rep_id = min doc_id of the component.
    ``docs_ds`` overrides the table read (restricted-oracle harness)."""
    from .util import default_partitions

    P = num_partitions or default_partitions()
    docs = (
        docs_ds
        if docs_ds is not None
        else read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )
    feats = docs.map_batches(
        _DocFeatures(), batch_format="pyarrow", batch_size=1024
    ).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        from .blocking import fixed_u32_matrix

        uids = np.asarray(batch["uid"].to_numpy(zero_copy_only=False), np.int64)
        if uids.size == 0:
            return pa.table(
                {
                    "block_key": pa.array([], pa.int64()),
                    "uid": pa.array([], pa.int64()),
                }
            )
        band = H.lsh_band_ids_batch(fixed_u32_matrix(batch["sig"]), N_BANDS)
        return pa.table(
            {
                "block_key": pa.array(band.reshape(-1), pa.int64()),
                "uid": pa.array(np.repeat(uids, N_BANDS), pa.int64()),
            }
        )

    blocks = feats.map_batches(explode, batch_format="pyarrow")
    pairs = candidate_pairs(blocks).materialize()

    if pairs.count() == 0:
        edges = None
    elif broadcast_threshold and feats.count() <= broadcast_threshold:
        # zero-shuffle verify: sketches ride the object store once,
        # pair batches look them up by searchsorted
        ref = _sketch_broadcast_ref(feats)

        def verify_broadcast(t: pa.Table) -> pa.Table:
            from .scoring import sketch_jaccard_batch

            uids, mat, lens = _sketch_payload(ref)
            ia = np.searchsorted(uids, t["uid_a"].to_numpy(zero_copy_only=False))
            ib = np.searchsorted(uids, t["uid_b"].to_numpy(zero_copy_only=False))
            jac = sketch_jaccard_batch(mat[ia], lens[ia], mat[ib], lens[ib], SKETCH_K)
            sel = t.take(np.nonzero(jac >= threshold)[0])
            return pa.table(
                {
                    "url_a": sel["uid_a"].cast(pa.string()),
                    "url_b": sel["uid_b"].cast(pa.string()),
                }
            )

        edges = pairs.map_batches(
            verify_broadcast, batch_format="pyarrow", batch_size=2048
        ).materialize()
        if edges.count() == 0:
            edges = None
    else:
        from .util import bucketed_join

        fa = feats.map_batches(
            lambda t: pa.table({"ka": t["uid"], "sketch_a": t["sketch"]}),
            batch_format="pyarrow",
        )
        fb = feats.map_batches(
            lambda t: pa.table({"kb": t["uid"], "sketch_b": t["sketch"]}),
            batch_format="pyarrow",
        )
        joined = bucketed_join(
            bucketed_join(pairs, fa, "uid_a", "ka", n_buckets=P),
            fb,
            "uid_b",
            "kb",
            n_buckets=P,
        )

        def verify(t: pa.Table) -> pa.Table:
            from .scoring import pad_sketch_column, sketch_jaccard_batch

            mat_a, len_a = pad_sketch_column(t["sketch_a"])
            mat_b, len_b = pad_sketch_column(t["sketch_b"])
            jac = sketch_jaccard_batch(mat_a, len_a, mat_b, len_b, SKETCH_K)
            keep = np.nonzero(jac >= threshold)[0]
            sel = t.take(keep)
            return pa.table(
                {
                    "url_a": sel["uid_a"].cast(pa.string()),
                    "url_b": sel["uid_b"].cast(pa.string()),
                }
            )

        edges = joined.map_batches(verify, batch_format="pyarrow").materialize()
        if edges.count() == 0:
            edges = None

    nodes = feats.map_batches(
        lambda t: pa.table({"url": t["doc_key"]}), batch_format="pyarrow"
    )

    def to_out(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pc.cast(t["url"], pa.int64()),
                "rep_id": pc.cast(t["cluster_id"], pa.int64()),
            }
        )

    if edges is None:
        return nodes.map_batches(
            lambda t: pa.table({"url": t["url"], "cluster_id": t["url"]}),
            batch_format="pyarrow",
        ).map_batches(to_out, batch_format="pyarrow")

    # NOTE doc_keys compare lexically as strings during label propagation;
    # min-label is therefore the lexicographic min. rep_id below re-derives
    # the NUMERIC min per component so output is stable and intuitive.
    clusters = connected_components(edges, nodes, num_partitions=P)
    out = clusters.map_batches(to_out, batch_format="pyarrow")

    def numeric_min(df: pd.DataFrame) -> pd.DataFrame:
        rep = df.groupby("rep_id", sort=False)["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": df["doc_id"], "rep_id": rep.astype("int64")})

    from .util import bucketed_map_groups

    return bucketed_map_groups(out, "rep_id", numeric_min)
