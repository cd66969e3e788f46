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


class BatchTopK:
    """Actor: per batch, cosine sims vs the broadcast queries → local
    top-k rows (query_vec_id, neighbor_vec_id, sim)."""

    def __init__(self, queries_ref, k: int):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.q = _normalize(qmat)  # (nq, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_embedding_matrix(batch))  # (n, d)
        sims = m @ self.q.T  # (n, nq)
        out_q, out_n, out_s = [], [], []
        k = min(self.k + 1, sims.shape[0])  # +1: self may be in batch
        for j, qid in enumerate(self.qids):
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
    partial = ds.map_batches(
        BatchTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )

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

    return bucketed_map_groups(partial, "query_vec_id", merge, n_buckets=8)


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
