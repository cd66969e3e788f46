"""Content-defined chunking (CDC) — rolling-hash chunk-level dedup.

Public algorithm: Gear-hash CDC (FastCDC; Xia et al., USENIX ATC 2016):
a 64-byte windowed rolling hash ``h_n = (h_{n-1} << 1) + GEAR[b_n]``
(mod 2^64) cuts a chunk wherever ``h & mask == 0``, with min/avg/max
size bounds. Because a cut depends only on the LOCAL byte window, an
edit anywhere in a document only re-chunks its neighborhood — chunks
downstream of the edit realign (shift resistance), which fixed-size
chunking cannot do. Cross-document identical chunks (boilerplate
blocks, mirrored pages, re-crawls with small edits) then dedup by chunk
hash — the storage-level dedup companion to the document-level
MinHash/SimHash families.

Vectorization: the Gear recurrence looks sequential, but mod 2^64 the
hash at position n depends on only the last 64 bytes:
``h_n = sum_{k=0}^{63} GEAR[b_{n-k}] << k``. That is a 64-tap windowed
sum computed here as 64 shifted numpy adds over the whole byte array —
no per-byte Python. Boundary selection walks candidate cut positions
(O(chunks), not O(bytes)).

Scale shape: chunking is a pure map (actor-free map_batches); the dedup
is one hash-partitioned count per chunk_hash + one bucketed join back —
no all-pairs, no driver materialization.

Reference ancestry: the backup family's dedup goal (incremental
backups, ``python/db_backup/cb_backup.py:62-93`` diff/accu modes) —
CDC is how content-addressed backup stores implement exactly that.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

WINDOW = 64  # bytes contributing to the rolling hash (2^64 shift-out)

# Deterministic gear table: one 64-bit random value per byte value.
_GEAR = np.random.default_rng(0x6EAF_C0DE).integers(
    0, 2**63, size=256, dtype=np.int64
).astype(np.uint64)


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Windowed gear hash at every position of ``data`` (uint8 array).
    ``out[n] = sum_{k=0..63} GEAR[data[n-k]] << k (mod 2^64)`` — the
    value the sequential recurrence would have (positions < WINDOW see a
    shorter window, exactly like the recurrence warming up from 0)."""
    g = _GEAR[data]
    out = g.copy()
    for k in range(1, WINDOW):
        out[k:] += g[:-k] << np.uint64(k)
    return out


def cdc_cut_points(
    data: np.ndarray,
    *,
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
) -> np.ndarray:
    """Chunk end offsets (exclusive) for one document's bytes. A cut
    falls at the first position >= min_size whose windowed hash has
    ``avg_bits`` low zero bits (expected chunk ~ 2^avg_bits bytes past
    the minimum), else at max_size. Always ends at len(data)."""
    n = data.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    mask = np.uint64((1 << avg_bits) - 1)
    h = gear_hashes(data)
    cand = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER the matching byte
    cuts = []
    start = 0
    while n - start > min_size:
        lo = start + min_size
        hi = min(start + max_size, n)
        i = np.searchsorted(cand, lo, side="left")
        cut = int(cand[i]) if i < cand.size and cand[i] <= hi else hi
        cuts.append(cut)
        start = cut
    if start < n:
        cuts.append(n)  # sub-min tail rides as the final short chunk
    return np.asarray(cuts, dtype=np.int64)


def chunk_bytes(
    raw: bytes, *, min_size: int = 64, avg_bits: int = 8, max_size: int = 1024
) -> list[tuple[int, int, int]]:
    """(offset, length, chunk_hash) triples covering ``raw`` exactly.
    Hash is the first 8 bytes of blake2b over the chunk content."""
    data = np.frombuffer(raw, dtype=np.uint8)
    ends = cdc_cut_points(data, min_size=min_size, avg_bits=avg_bits, max_size=max_size)
    out = []
    start = 0
    for end in ends:
        end = int(end)
        digest = hashlib.blake2b(raw[start:end], digest_size=8).digest()
        out.append((start, end - start, int.from_bytes(digest, "little", signed=True)))
        start = end
    return out


def cdc_chunks_batch(
    batch: pa.Table,
    *,
    id_col: str,
    text_col: str,
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 1024,
) -> pa.Table:
    """Explode documents to (doc id, chunk_idx, chunk_len, chunk_hash)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    o_id, o_idx, o_len, o_hash = [], [], [], []
    for i, txt in enumerate(texts):
        raw = (txt or "").encode("utf-8")
        for idx, (_, length, chash) in enumerate(
            chunk_bytes(raw, min_size=min_size, avg_bits=avg_bits, max_size=max_size)
        ):
            o_id.append(ids[i])
            o_idx.append(idx)
            o_len.append(length)
            o_hash.append(chash)
    return pa.table(
        {
            id_col: pa.array(o_id, pa.int64()),
            "chunk_idx": pa.array(o_idx, pa.int64()),
            "chunk_len": pa.array(o_len, pa.int64()),
            "chunk_hash": pa.array(o_hash, pa.int64()),
        }
    )


def chunk_dedup_stats(ds, *, id_col: str, text_col: str, n_buckets: int = 64, **chunk_kw):
    """Per-document chunk-level dedup report: (id, n_chunks, n_shared,
    shared_bytes, total_bytes). A chunk is SHARED when its hash appears
    in more than one (doc, chunk_idx) slot corpus-wide. Two wide ops
    total: one bucketed groupby on chunk_hash (every copy of a hash
    lands in one pandas group, where its multiplicity is known — no
    separate count shuffle, no join back) and one grouped sum per doc.
    Corpus rows never materialize on the driver."""
    import functools

    import pandas as pd

    from .util import bucketed_map_groups, partial_sum_groupby

    # parquet reads split to cluster-width blocks on their own
    # (SplitBlocks); the chunking map parallelizes without a repartition
    chunks = ds.map_batches(
        functools.partial(
            cdc_chunks_batch, id_col=id_col, text_col=text_col, **chunk_kw
        ),
        batch_format="pyarrow",
    )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("chunk_hash", sort=False)["chunk_hash"].transform("size")
        shared = (sizes > 1).to_numpy()
        cl = df["chunk_len"].to_numpy()
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "one": np.ones(len(df), dtype=np.int64),
                "is_shared": shared.astype(np.int64),
                "shared_bytes": np.where(shared, cl, 0).astype(np.int64),
                "total_bytes": cl,
            }
        )

    marked = bucketed_map_groups(chunks, "chunk_hash", mark, n_buckets=n_buckets)
    return partial_sum_groupby(
        marked,
        [id_col],
        {
            "one": "n_chunks",
            "is_shared": "n_shared",
            "shared_bytes": "shared_bytes",
            "total_bytes": "total_bytes",
        },
        None,
    )
