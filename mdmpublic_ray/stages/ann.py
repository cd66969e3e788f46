"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a float64 matmul per Arrow batch
against a broadcast query matrix (``ray.put`` once, read per actor), with
distributed partial top-k (each batch emits only its local top-k per
query; a tiny grouped merge finishes). Scale path: ``knn_lsh`` buckets
vectors by random-hyperplane signs (signed random projections) so each
query only scans its bucket ± Hamming-1 probes.

The scorer holds the query matrix as actor state (ST5, SURVEY.md §2.3) —
loaded once per actor, not per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table, read_table_arrow
from .util import bucketed_map_groups


def _embedding_matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero loops)."""
    arr = tbl[col].combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_batch(batch: pa.Table, *, queries_ref, k: int) -> pa.Table:
    """Per batch, cosine sims vs the broadcast queries → local top-k
    rows (query_vec_id, neighbor_vec_id, sim).

    Stateless TASK, not an actor (round-3 bench regression fix): the
    query payload is tiny by definition (n_queries × d floats), so a
    per-worker ``_ANN_CACHE`` fetch replaces actor ``__init__`` state —
    warm Ray workers are reused with zero pool-spawn latency, which
    dominated this query's wall at bench scale."""
    import ray

    key = ("knn_queries", queries_ref.hex())
    cached = _ANN_CACHE.get(key)
    if cached is None:
        qids, qmat = ray.get(queries_ref)
        cached = (qids, _normalize(qmat))
        _ann_cache_evict("knn_queries")
        _ANN_CACHE[key] = cached
    qids, q = cached

    vids = batch["vec_id"].to_numpy(zero_copy_only=False)
    m = _normalize(_embedding_matrix(batch))  # (n, d)
    sims = m @ q.T  # (n, nq)
    out_q, out_n, out_s = [], [], []
    k = min(k + 1, sims.shape[0])  # +1: self may be in batch
    for j, qid in enumerate(qids):
        col = sims[:, j]
        idx = np.argpartition(-col, k - 1)[:k] if k < col.size else np.arange(col.size)
        for i in idx:
            if vids[i] == qid:
                continue
            out_q.append(qid)
            out_n.append(int(vids[i]))
            out_s.append(float(col[i]))
    return pa.table(
        {
            "query_vec_id": pa.array(out_q, pa.int64()),
            "neighbor_vec_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )


def knn_cosine(sf_dir: str, *, n_queries: int = 5, k: int = 10):
    """Brute-force cosine top-k for queries = vec_id < n_queries.

    Output: (query_vec_id, neighbor_vec_id, rank), rank 1..k by
    (sim desc, neighbor_vec_id asc) — a total order, so results are
    deterministic and oracle-comparable without shipping floats.
    """
    import ray

    q = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        pa.compute.less(pa.compute.field("vec_id"), n_queries)
    )
    queries_ref = ray.put(
        (q["vec_id"].to_numpy(zero_copy_only=False), _embedding_matrix(q))
    )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    import functools

    partial = ds.map_batches(
        functools.partial(_topk_batch, queries_ref=queries_ref, k=k),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )

    return bucketed_map_groups(partial, "query_vec_id", _merge_topk(k), n_buckets=8)


def _merge_topk(k: int):
    """Grouped merge of per-batch partial top-k → global top-k with rank
    1..k by (sim desc, neighbor id asc) — a total order, deterministic."""

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_vec_id", sort=False):
            g = g.sort_values(["sim", "neighbor_vec_id"], ascending=[False, True],
                              kind="mergesort").head(k)
            out.append(
                pd.DataFrame(
                    {
                        "query_vec_id": qid,
                        "neighbor_vec_id": g["neighbor_vec_id"].to_numpy(),
                        "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                    }
                )
            )
        cols = ["query_vec_id", "neighbor_vec_id", "rank"]
        if not out:
            return pd.DataFrame(columns=cols).astype(
                {"query_vec_id": "int64", "neighbor_vec_id": "int64", "rank": "int64"}
            )
        return pd.concat(out)[cols]

    return merge


class _NearDupPairs:
    """Actor: emit (vec_id_a < vec_id_b) pairs with cosine >= tau between
    this batch and the broadcast corpus matrix (exact all-pairs baseline
    for embedding-cosine near-dup detection; each unordered pair is seen
    from both endpoints' batches and the a < b filter keeps exactly one).

    Scale note: the broadcast side is O(corpus); this exact form is the
    small/oracle baseline. At 100 TB the same batch kernel runs *within
    LSH buckets* (``lsh_buckets`` partitioning below), so each batch only
    multiplies against its bucket's matrix."""

    def __init__(self, mat_ref, tau: float):
        import ray

        ids, mat = ray.get(mat_ref)
        self.ids = ids
        self.m = _normalize(mat)  # (N, d)
        self.tau = tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        b = _normalize(_embedding_matrix(batch))
        sims = b @ self.m.T  # (nb, N)
        ib, jn = np.nonzero(sims >= self.tau)
        a = vids[ib]
        bb = self.ids[jn]
        keep = a < bb
        return pa.table(
            {
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(bb[keep], pa.int64()),
            }
        )


def cosine_neardup_pairs(sf_dir: str, *, tau: float = 0.45):
    """All pairs of embeddings with cosine similarity >= tau — the
    embedding-cosine near-duplicate detector (dedup family, SURVEY.md
    §2.7 D5 cousin). Exact (matches the DuckDB cross-join oracle);
    output is integer ids only, so the value-hash compare is float-free."""
    import ray

    full = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    mat_ref = ray.put(
        (full["vec_id"].to_numpy(zero_copy_only=False), _embedding_matrix(full))
    )
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(
        _NearDupPairs,
        fn_constructor_kwargs={"mat_ref": mat_ref, "tau": tau},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )


class _MultiTableLSHAssign:
    """Multi-table signed-random-projection assignment for the near-dup
    JOIN scale path: T independent b-bit signatures per vector, one
    output row per (vector, table) with key = (table << b) | signature.
    The T× row expansion IS the LSH cost model — T copies of the data
    through ONE keyed exchange instead of the exact plan's O(N²/B)
    tile multiplies; bucket population ~ N/2^b bounds per-group work."""

    def __init__(self, planes_ref, n_tables: int, n_bits: int):
        import ray

        self.planes = ray.get(planes_ref)  # (T*b, d)
        self.t, self.b = n_tables, n_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        m = _normalize(_embedding_matrix(batch))
        bits = (m @ self.planes.T) > 0  # (n, T*b)
        sigs = bits.reshape(n, self.t, self.b) @ (
            1 << np.arange(self.b, dtype=np.int64)
        )  # (n, T)
        keys = (np.arange(self.t, dtype=np.int64) << self.b) | sigs
        out = batch.take(pa.array(np.repeat(np.arange(n), self.t)))
        return out.append_column("lsh_key", pa.array(keys.reshape(-1)))


def lsh_neardup_pairs(
    ds,
    *,
    tau: float = 0.45,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 5,
):
    """LSH-bucketed embedding near-dup join — the 100-TB scale path the
    exact plans (broadcast ``cosine_neardup_pairs``, triangle-tiled
    ``simjoin``) cannot take: candidate pairs form only WITHIN a
    (table, signature) bucket, verified by exact cosine there, then
    deduped across tables in one pair-keyed exchange.

    Properties: output ⊆ the exact tau-join (in-bucket verification is
    exact — precision 1.0 by construction); recall is the standard
    multi-table LSH bound 1-(1-p^b)^T with p = 1 - θ/π, tunable via
    (n_bits, n_tables). ``n_tables_hit`` per surviving pair is the
    collision-count diagnostic. No broadcast of the corpus, no O(N²)
    tiles: cost is T× data through one keyed exchange + per-bucket
    (~N/2^b) dense multiplies + one pair-keyed dedup exchange."""
    import ray

    from .util import bucketed_map_groups, grouped_agg

    rng = np.random.default_rng(seed)
    d = len(ds.take(1)[0]["embedding"])
    planes_ref = ray.put(rng.standard_normal((n_tables * n_bits, d)))

    assigned = ds.map_batches(
        _MultiTableLSHAssign,
        fn_constructor_kwargs={
            "planes_ref": planes_ref,
            "n_tables": n_tables,
            "n_bits": n_bits,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def bucket_pairs(df):
        out_a, out_b = [], []
        for _, g in df.groupby("lsh_key", sort=False):
            if len(g) < 2:
                continue
            ids = g["vec_id"].to_numpy()
            m = _normalize(np.stack(g["embedding"].to_numpy()))
            sims = m @ m.T
            ia, ib = np.nonzero(np.triu(sims >= tau, k=1))
            a, b = ids[ia], ids[ib]
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            out_a.append(a2)
            out_b.append(b2)
        import pandas as pd

        if not out_a:
            return pd.DataFrame(
                {"vec_id_a": np.array([], np.int64), "vec_id_b": np.array([], np.int64)}
            )
        return pd.DataFrame(
            {
                "vec_id_a": np.concatenate(out_a).astype(np.int64),
                "vec_id_b": np.concatenate(out_b).astype(np.int64),
            }
        )

    cand = bucketed_map_groups(
        assigned.select_columns(["lsh_key", "vec_id", "embedding"]),
        "lsh_key",
        bucket_pairs,
    )
    # a pair colliding in k tables appears k times → dedup + diagnostic
    return grouped_agg(
        cand, ["vec_id_a", "vec_id_b"], {"n_tables_hit": ("vec_id_b", "count")}
    )


class _LSHAssign:
    """Sign-of-random-projection bucket id per vector (scale path)."""

    def __init__(self, planes_ref):
        import ray

        self.planes = ray.get(planes_ref)  # (n_bits, d)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        bits = (m @ self.planes.T) > 0  # (n, n_bits)
        ids = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        return batch.append_column("bucket_id", pa.array(ids.astype(np.int64)))


def _sign_bits_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))


class _BatchTopKLSH:
    """Actor: bucket-pruned cosine top-k. A corpus row is scored for a
    query only when its ``bucket_id`` is in the query's probe set (own
    bucket ± Hamming-1). Everything outside the probe sets was already
    filtered before this stage, so the scan itself shrinks — the IVF-style
    scale path (probe few partitions instead of the full corpus)."""

    def __init__(self, queries_ref, k: int):
        import ray

        qids, qmat, probe_sets = ray.get(queries_ref)
        self.qids = qids
        self.q = _normalize(qmat)
        self.probes = probe_sets  # list[np.ndarray] of allowed bucket ids
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        bids = batch["bucket_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_embedding_matrix(batch.drop_columns(["bucket_id"])))
        sims = m @ self.q.T  # (n, nq)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            allowed = np.isin(bids, self.probes[j])
            allowed &= vids != qid
            idx = np.flatnonzero(allowed)
            if idx.size == 0:
                continue
            col = sims[idx, j]
            kk = min(self.k, col.size)
            top = np.argpartition(-col, kk - 1)[:kk] if kk < col.size else np.arange(col.size)
            for t in top:
                out_q.append(qid)
                out_n.append(int(vids[idx[t]]))
                out_s.append(float(col[t]))
        return pa.table(
            {
                "query_vec_id": pa.array(out_q, pa.int64()),
                "neighbor_vec_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def knn_cosine_lsh(
    sf_dir: str,
    *,
    n_queries: int = 5,
    k: int = 10,
    n_bits: int = 4,
    seed: int = 42,
    extra: pa.Table | None = None,
):
    """Approximate top-k: random-hyperplane LSH buckets + Hamming-1
    multiprobe. The corpus scan is pruned to the union of all queries'
    probe buckets (at 4 bits / Hamming-1 each query probes 5 of 16
    buckets), then scored per batch and merged like ``knn_cosine``.
    Recall vs the brute-force baseline is asserted in tests."""
    import ray

    q = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        pa.compute.less(pa.compute.field("vec_id"), n_queries)
    )
    qmat = _embedding_matrix(q)
    dim = qmat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    q_buckets = _sign_bits_ids(_normalize(qmat), planes)
    probe_sets = [
        np.unique(np.concatenate(([b], b ^ (1 << np.arange(n_bits, dtype=np.int64)))))
        for b in q_buckets
    ]
    union_buckets = np.unique(np.concatenate(probe_sets))
    queries_ref = ray.put(
        (q["vec_id"].to_numpy(zero_copy_only=False), qmat, probe_sets)
    )
    planes_ref = ray.put(planes)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if extra is not None:
        # planted corpus rows (restricted-oracle harness): byte-identical
        # copies of query vectors provably share the query's bucket —
        # identical input ⇒ identical hyperplane signs — so the exact
        # top-k is reachable by construction and the driver's SQL oracle
        # can state it (queries.py q_knn_cosine_lsh)
        import ray.data as rd

        ds = ds.union(rd.from_arrow(extra))
    bucketed = ds.map_batches(
        _LSHAssign,
        fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    allowed = set(int(b) for b in union_buckets)
    pruned = bucketed.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["bucket_id"], value_set=pa.array(sorted(allowed), pa.int64()))
        ),
        batch_format="pyarrow",
    )
    partial = pruned.map_batches(
        _BatchTopKLSH,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )
    return bucketed_map_groups(partial, "query_vec_id", _merge_topk(k), n_buckets=8)


def _kmeans_centroids(
    ds, n_centroids: int, n_iters: int, *, train_cap: int = 100_000
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained on a bounded
    DETERMINISTIC sample (crc32(vec_id)-gated — stable across runs and
    cluster sizes), Lloyd iterations run locally in numpy. This is the
    FAISS-style scale shape: the quantizer never needs the full corpus
    (``train_cap`` vectors bound driver memory — 100k × d floats), and
    only the single assignment pass touches all data."""
    n = ds.count()  # metadata fast-path on parquet reads
    if n > train_cap:
        # crc32 is uniform: keep ≈ train_cap rows, deterministically
        per_mil = max(1, int(1_000_000 * train_cap / n))
        from ..functions.hashing import crc32_array

        def gate(t: pa.Table, _p=per_mil) -> pa.Table:
            h = crc32_array(t["vec_id"].to_pylist()) % np.uint32(1_000_000)
            return t.filter(pa.array(h < _p))

        sample_ds = ds.map_batches(gate, batch_format="pyarrow")
    else:
        sample_ds = ds
    sample = pa.concat_tables(list(sample_ds.iter_batches(batch_format="pyarrow")))
    ids = sample["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    m = _normalize(_embedding_matrix(sample))[order]

    cents = m[:n_centroids].copy()  # deterministic init: smallest vec_ids
    k = cents.shape[0]
    for _ in range(n_iters):
        a = np.argmax(m @ cents.T, axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, a, m)
        counts = np.bincount(a, minlength=k)
        nz = counts > 0
        cents[nz] = _normalize(sums[nz] / counts[nz, None])
    return cents


class _IVFAssign:
    """Nearest-centroid list id per vector (IVF partitioning key)."""

    def __init__(self, cents_ref):
        import ray

        self.c = ray.get(cents_ref)  # (K, d), unit rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(batch))
        a = np.argmax(m @ self.c.T, axis=1).astype(np.int64)
        return batch.append_column("bucket_id", pa.array(a))


class _IVFScore:
    """Fused assign → prune → partial-top-k in ONE actor stage: assign
    each corpus vector its inverted-list id, drop vectors outside the
    union of the queries' probe lists, score the survivors against the
    broadcast query matrix. One scan, one actor pool — no intermediate
    blocks ever hit the object store."""

    def __init__(self, cents_ref, queries_ref, k: int):
        import ray

        self.c = ray.get(cents_ref)
        qids, qmat, probe_sets = ray.get(queries_ref)
        self.scorer = _BatchTopKLSH.__new__(_BatchTopKLSH)
        self.scorer.qids = qids
        self.scorer.q = _normalize(qmat)
        self.scorer.probes = probe_sets
        self.scorer.k = k
        self.allowed = np.unique(np.concatenate(probe_sets))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(batch))
        a = np.argmax(m @ self.c.T, axis=1).astype(np.int64)
        batch = batch.append_column("bucket_id", pa.array(a))
        batch = batch.filter(pa.array(np.isin(a, self.allowed)))
        return self.scorer(batch)


def knn_cosine_ivf(
    sf_dir: str,
    *,
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 5,
    extra: pa.Table | None = None,
):
    """IVF approximate top-k: spherical-k-means coarse quantizer →
    inverted lists keyed by nearest centroid → each query scans only its
    ``nprobe`` closest lists. The list id doubles as the partitioning
    key at 100 TB (write one parquet dir per list; a query touches
    nprobe directories). Same pruned-scan + partial-top-k + grouped
    merge machinery as the LSH path; recall vs brute force is asserted
    in tests."""
    import ray

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if extra is not None:
        # planted corpus rows (restricted-oracle harness): a copy of a
        # query vector gets the query's own argmax centroid, which is
        # always in the query's probe list (top-nprobe includes top-1) —
        # exact recall by construction, SQL-statable result
        import ray.data as rd

        ds = ds.union(rd.from_arrow(extra))
    cents = _kmeans_centroids(ds, n_centroids, n_iters)

    q = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        pa.compute.less(pa.compute.field("vec_id"), n_queries)
    )
    qmat = _embedding_matrix(q)
    qn = _normalize(qmat)
    order = np.argsort(-(qn @ cents.T), axis=1)  # (nq, K)
    probe_sets = [row[:nprobe].astype(np.int64) for row in order]

    queries_ref = ray.put(
        (q["vec_id"].to_numpy(zero_copy_only=False), qmat, probe_sets)
    )
    cents_ref = ray.put(cents)

    partial = ds.map_batches(
        _IVFScore,
        fn_constructor_kwargs={
            "cents_ref": cents_ref,
            "queries_ref": queries_ref,
            "k": k,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )
    return bucketed_map_groups(partial, "query_vec_id", _merge_topk(k), n_buckets=8)


def lsh_buckets(sf_dir: str, *, n_bits: int = 8, dim: int | None = None, seed: int = 42):
    """Assign each embedding an LSH bucket (random hyperplane signs).
    Neighbors concentrate in the same bucket; a query probes its bucket
    (and optionally Hamming-1 neighbors) instead of the full corpus —
    the 100 TB-scale ANN layout (bucket = partition key)."""
    import ray

    if dim is None:
        t0 = read_table_arrow(sf_dir, "embeddings", ["embedding"]).slice(0, 1)
        dim = len(t0["embedding"][0])
    rng = np.random.default_rng(seed)
    planes_ref = ray.put(rng.standard_normal((n_bits, dim)))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(
        _LSHAssign,
        fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def maximin_init(m: np.ndarray, k: int) -> np.ndarray:
    """Deterministic farthest-point (Gonzalez) seeding over normalized
    rows: start at row 0 (smallest vec_id by construction), then
    repeatedly add the row with the LOWEST maximum cosine to the chosen
    set — seeds land in distinct clusters whenever clusters are
    separated, which naive first-k seeding does not guarantee."""
    chosen = [0]
    best = m @ m[0]
    for _ in range(1, min(k, len(m))):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, m @ m[nxt])
    return m[chosen].copy()


def distributed_kmeans(ds, *, k: int = 8, n_iters: int = 5):
    """Full-corpus spherical k-means (Lloyd): unlike the sample-trained
    coarse quantizer above (`_kmeans_centroids` — the FAISS shape), every
    iteration's update uses EVERY vector, computed distributed:

      assignment  map_batches: per-batch argmax against the broadcast
                  centroid matrix (one ray.put per iteration)
      update      per-batch partial sums emitted as (cent, dim, s) rows —
                  k×(d+1) rows per batch regardless of batch size — then
                  one map-side-combined grouped sum; the driver only ever
                  sees the k×d centroid matrix

    Deterministic: init = farthest-point seeding (:func:`maximin_init`)
    over the 1024 smallest vec_ids' vectors; float partial
    sums are order-dependent at ~1e-16, which assignment argmax tolerates
    for separated clusters (the tested contract). Empty centroids keep
    their previous position. Returns (assignments_ds(vec_id, centroid_id),
    centroids ndarray) — assignments are computed lazily from the final
    centroids."""
    import ray

    from .util import partial_sum_groupby

    ds = ds.select_columns(["vec_id", "embedding"]).materialize()  # re-read per iter
    sample = ds.sort("vec_id").limit(max(k, 1024)).to_pandas()
    sm = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    cents = maximin_init(sm, k)
    k = cents.shape[0]
    d = cents.shape[1]

    for _ in range(n_iters):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_embedding_matrix(t)).astype(np.float64)
            a = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            for j in range(k):
                sel = m[a == j]
                if len(sel):
                    sums[j] = sel.sum(axis=0)
            counts = np.bincount(a, minlength=k).astype(np.float64)
            cent_col = np.repeat(np.arange(k, dtype=np.int64), d + 1)
            dim_col = np.tile(np.arange(-1, d, dtype=np.int64), k)
            s_col = np.concatenate(
                [np.concatenate(([counts[j]], sums[j])) for j in range(k)]
            )
            return pa.table(
                {"cent": pa.array(cent_col), "dim": pa.array(dim_col),
                 "s": pa.array(s_col)}
            )

        agg = partial_sum_groupby(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["cent", "dim"],
            {"s": "s"},
            None,
        ).to_pandas()
        new = cents.copy()
        for j in range(k):
            rows = agg[agg["cent"] == j].sort_values("dim")
            cnt = float(rows[rows["dim"] == -1]["s"].iloc[0])
            if cnt > 0:
                vec = rows[rows["dim"] >= 0]["s"].to_numpy()
                nrm = np.linalg.norm(vec)
                if nrm > 0:
                    new[j] = vec / nrm
        cents = new

    final_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        m = _normalize(_embedding_matrix(t)).astype(np.float64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "centroid_id": pa.array(np.argmax(m @ c.T, axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow"), cents


def semantic_dedup(
    ds,
    *,
    tau: float = 0.9,
    k: int = 64,
    n_iters: int = 4,
    n_buckets: int = 64,
    tile: int = 2048,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then drop
    near-duplicates (cosine >= ``tau``) WITHIN each cluster, keeping the
    smallest vec_id of every duplicate chain — the clustering-bucketed
    scale path of the embedding near-dup family, beside the exact
    triangle-tiled join (simjoin.cosine_pairs_tiled) and the LSH-bucket
    join (lsh_neardup_pairs).

    Physical plan (100 TB shape): the quantizer trains on a bounded
    deterministic sample (`_kmeans_centroids`); ONE broadcast-assign map
    keys every vector by nearest centroid; one bucketed exchange groups
    clusters; the greedy keep-scan runs per cluster, tiled so memory is
    O(tile x cluster) not O(cluster^2) — cluster sizes are ~N/k, the
    partitioning assumption callers size ``k`` for. Deterministic:
    id-ordered greedy (first-seen id wins a duplicate chain), sample
    -trained centroids are seed-stable.

    Recall caveat (inherent to SemDeDup, documented in the paper): a
    near-dup pair split across two k-means clusters is not examined —
    precision is 1.0 (every drop has a kept witness at >= tau in its
    cluster), recall depends on clustering quality.

    Returns rows (vec_id, centroid_id, keep, dup_of) where ``dup_of``
    is the kept witness for dropped rows (null when keep)."""
    import functools

    import ray

    cents = _kmeans_centroids(ds, k, n_iters)
    ref = ray.put(cents)

    def assign(t: pa.Table, cents_ref) -> pa.Table:
        c = _ANN_CACHE.get(("semdedup", cents_ref.hex()))
        if c is None:
            _ann_cache_evict("semdedup")
            c = ray.get(cents_ref)
            _ANN_CACHE[("semdedup", cents_ref.hex())] = c
        m = _normalize(_embedding_matrix(t))
        a = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
                "centroid_id": pa.array(a),
            }
        )

    assigned = ds.select_columns(["vec_id", "embedding"]).map_batches(
        functools.partial(assign, cents_ref=ref), batch_format="pyarrow"
    )

    def dedup_cluster(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize(
            np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
        )
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        # tiled greedy in id order: for each tile, (a) drop members
        # covered by an ALREADY-KEPT earlier row (one matmul against the
        # kept prefix), then (b) resolve intra-tile chains with the
        # tile's own similarity matrix — O(tile x n) memory, no n x n.
        for s in range(0, n, tile):
            e = min(s + tile, n)
            blk = m[s:e]
            kept_prefix = np.flatnonzero(keep[:s])
            if kept_prefix.size:
                sims = blk @ m[kept_prefix].T  # (tile, kept)
                cover = sims >= tau
                hit = cover.any(axis=1)
                first = np.argmax(cover, axis=1)
                for j in np.flatnonzero(hit):
                    keep[s + j] = False
                    dup_of[s + j] = kept_prefix[first[j]]
            S = blk @ blk.T
            for j in range(e - s):
                i = s + j
                if not keep[i]:
                    continue
                dups = S[j] >= tau
                dups[: j + 1] = False
                for l in np.flatnonzero(dups):
                    if keep[s + l]:
                        keep[s + l] = False
                        dup_of[s + l] = i
        witness = pd.array(ids[np.maximum(dup_of, 0)], dtype="Int64")
        witness[keep] = pd.NA
        return pd.DataFrame(
            {
                "vec_id": ids,
                "centroid_id": df["centroid_id"].to_numpy()[order],
                "keep": keep,
                "dup_of": witness,
            }
        )

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # a bucket holds every cluster hashing to it — dedup per cluster
        parts = [
            dedup_cluster(g)
            for _, g in df.groupby("centroid_id", sort=False)
        ]
        return pd.concat(parts, ignore_index=True)

    return bucketed_map_groups(
        assigned, "centroid_id", dedup_bucket, n_buckets=n_buckets
    )


_ANN_CACHE: dict = {}


def _ann_cache_evict(prefix: str) -> None:
    """Evict only this stage family's stale entries (round-4 advice):
    a whole-dict clear() let interleaved knn/semdedup stages on one
    worker evict each other every batch, defeating both caches."""
    for k in [k for k in _ANN_CACHE if k[0] == prefix]:
        _ANN_CACHE.pop(k, None)
