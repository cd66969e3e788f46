"""Exact distributed similarity joins — the scale-safe forms of the two
"compare everything to everything" conformance queries.

1. ``jaccard_set_join`` — exact token-set Jaccard join via PREFIX
   FILTERING (AllPairs/PPJoin family; public algorithm: Bayardo et al.
   "Scaling Up All Pairs Similarity Search", WWW 2007; Xiao et al.
   "Efficient Similarity Joins for Near Duplicate Detection", WWW 2008).
   Two sets with J ≥ t must share a token inside both sets' prefixes
   (first ``|s| - ceil(t·|s|) + 1`` tokens under one global token order),
   so candidate generation groups docs by PREFIX TOKEN instead of
   comparing whole blocks all-pairs. Ordering tokens rarest-first makes
   prefix groups small; the order itself never affects correctness, so
   the hot-token ranking can come from a cheap count pass.

2. ``cosine_pairs_tiled`` — exact all-pairs cosine ≥ τ via TRIANGLE
   TILING: vectors are hashed into B blocks, every row is replicated to
   the B tiles (i, j), i ≤ j, that involve its block, and each tile
   group multiplies only its two blocks' matrices. Per-task memory is
   O(N/B) instead of a whole-corpus broadcast; total work stays O(N²)
   flops — that is inherent to an *exact* all-pairs join; the
   approximate escape hatch is the LSH path in ``ann.py``.

Reference ancestry: the MDM matcher's candidate generation via per-field
search indexes (``python/db_backup/es_backup.py:61`` master-index-<md5>);
set-difference reporting (``jenkins_scripts/report/os_package_action_report.sh:118-150``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from ..functions.hashing import shingle_hashes, stable_u64
from .pairs import candidate_pairs
from .scoring import SKETCH_PAD, pad_sketch_column, sketch_jaccard_batch
from .util import bucketed_join, partial_sum_groupby

# k larger than any real union size turns the bottom-k estimator into the
# exact Jaccard of the (hashed) token sets.
_EXACT_K = 1 << 31


def _tokenize_stage(
    ds, *, id_col: str, text_col: str, block_col: str | None, shingle_k: int = 1
):
    """(id, [blk], text) → (id, [blk], tokset: binary) where tokset is the
    doc's DISTINCT tokens hashed to uint64, sorted, packed little-endian.

    Hashing tokens to u64 makes every later step vectorized (prefix sort,
    group keys, exact Jaccard via ``sketch_jaccard_batch``); a pair's
    Jaccard differs from the string-set value only if two distinct tokens
    of the corpus collide in 64 bits (~|vocab|²/2⁶⁴ — negligible, and a
    collision merely perturbs one pair's score).

    ``shingle_k > 1`` switches the set elements from single tokens to
    k-token shingles (``functions.hashing.shingle_hashes`` — the same
    definition the ER feature sketches use), turning the join into a
    shingle-level similarity join: word-order-sensitive, near-zero
    similarity between unrelated texts that merely share vocabulary."""

    def tok(batch: pa.Table) -> pa.Table:
        from .blocking import _binary_from_flat
        from ..functions.hashing import shingle_hashes_flat
        from ..functions.text import tokens_hashed_arrow

        _, th, toff = tokens_hashed_arrow(batch[text_col])
        # shingle_k == 1 → per-doc sorted-unique TOKEN hashes (same dedup
        # machinery, window size 1); > 1 → k-shingle hash sets. Both paths
        # stay flat-vectorized end to end.
        sh, soff = shingle_hashes_flat(th, toff, shingle_k)
        cols = {id_col: batch[id_col]}
        if block_col:
            cols[block_col] = batch[block_col]
        cols["tokset"] = _binary_from_flat(
            sh.tobytes(), ((soff[1:] - soff[:-1]) * 8).astype(np.int64)
        )
        return pa.table(cols)

    return ds.map_batches(tok, batch_format="pyarrow")


def _hot_tokens(tok_ds, *, top: int) -> np.ndarray:
    """Global token-frequency pass → the ``top`` most frequent token
    hashes, ranked (most frequent first). Per-batch partial counts
    (np.unique over the concatenated sets) collapse before one small
    groupby — the combiner pattern."""

    def partial(batch: pa.Table) -> pa.Table:
        mat, lens = pad_sketch_column(batch["tokset"])
        flat = mat[np.arange(mat.shape[1]) < lens[:, None]]
        toks, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {"tok": pa.array(toks.astype(np.int64)), "cnt": pa.array(cnt.astype(np.int64))}
        )

    counts = partial_sum_groupby(
        tok_ds.select_columns(["tokset"]).map_batches(partial, batch_format="pyarrow"),
        ["tok"],
        {"cnt": "cnt"},
        None,
    )
    head = counts.sort(["cnt", "tok"], descending=[True, False]).limit(top).take_all()
    return np.array([r["tok"] for r in head], dtype=np.int64).astype(np.uint64)


def jaccard_set_join(
    ds,
    *,
    id_col: str,
    text_col: str,
    threshold: float,
    block_col: str | None = None,
    hot_top: int = 256,
    max_group_size: int = 1024,
    n_buckets: int = 64,
    shingle_k: int = 1,
):
    """Exact Jaccard-similarity self-join: all (id_a < id_b) pairs whose
    DISTINCT-token-set Jaccard ≥ ``threshold`` (within ``block_col``
    groups when given).

    Plan: tokenize+hash → frequency pass (hot ranking) → per-doc prefix
    emit (rarest ``n - ceil(t·n) + 1`` tokens) → candidate pairs grouped
    by (block, prefix token) with the standard cap-and-report policy →
    exact hashed-set Jaccard verify. Prefix filtering is lossless for
    J ≥ t, so the result equals the all-pairs join; a candidate group
    larger than ``max_group_size`` (docs sharing a rare-ranked token —
    pathological near-identical corpora) is dropped AND counted by
    ``candidate_pairs``'s cap, never silently.
    """
    import ray

    tok_ds = _tokenize_stage(
        ds, id_col=id_col, text_col=text_col, block_col=block_col,
        shingle_k=shingle_k,
    ).materialize()  # 3 consumers below; at 100 TB this is a parquet checkpoint

    hot = _hot_tokens(tok_ds, top=hot_top)
    # Global token order (identical for every doc — the prefix-filter
    # guarantee needs ONE total order): non-hot tokens first by unsigned
    # hash, then hot tokens by frequency rank descending (most frequent
    # dead last). Any total order is CORRECT; rarest-first is the
    # performance choice that keeps prefix groups small.
    hot_sorted = np.sort(hot)
    rank_at_sorted = np.argsort(hot, kind="stable")  # sorted slot → freq rank
    hot_ref = ray.put((hot_sorted, rank_at_sorted))

    thr = float(threshold)

    def prefix_emit(batch: pa.Table) -> pa.Table:
        hs, rks = ray.get(hot_ref)
        mat, lens = pad_sketch_column(batch["tokset"])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = mat.shape[0]
        if hs.size:
            pos = np.minimum(np.searchsorted(hs, mat), hs.size - 1)
            is_hot = np.take(hs, pos) == mat
            # secondary sort key: hash for non-hot (rows are already
            # hash-sorted), (n_hot - rank) for hot so rank 0 lands last
            key2 = np.where(
                is_hot, (hs.size - np.take(rks, pos)).astype(np.uint64), mat
            )
        else:
            is_hot = np.zeros(mat.shape, dtype=bool)
            key2 = mat
        prefix_len = lens - np.ceil(thr * lens).astype(np.int64) + 1
        prefix_len = np.where(lens > 0, np.maximum(prefix_len, 1), 0)
        out_tok: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        kept: list[int] = []
        for i in range(n):
            p = int(prefix_len[i])
            if p <= 0:
                continue
            row = mat[i, : lens[i]]
            if is_hot[i, : lens[i]].any():
                o = np.lexsort((key2[i, : lens[i]], is_hot[i, : lens[i]]))
                row = row[o]
            out_tok.append(row[:p])
            out_id.append(np.full(p, ids[i], dtype=np.int64))
            kept.append(i)
        if not out_tok:
            return pa.table(
                {"block_key": pa.array([], pa.int64()), "uid": pa.array([], pa.int64())}
            )
        toks = np.concatenate(out_tok)
        uids = np.concatenate(out_id)
        if block_col:
            blks = batch[block_col].to_pylist()
            reps = np.fromiter((a.size for a in out_tok), np.int64, len(out_tok))
            bh = np.repeat(
                np.fromiter(
                    (stable_u64(blks[i]) for i in kept), dtype=np.uint64, count=len(kept)
                ),
                reps,
            )
            # mixing block into the group key: a 64-bit collision between
            # two (block, token) keys only MERGES two candidate groups —
            # extra candidates are removed by the exact verify, so this
            # stays exact.
            key = (toks ^ (bh * np.uint64(0x9E3779B97F4A7C15))).astype(np.int64)
        else:
            key = toks.astype(np.int64)
        return pa.table({"block_key": pa.array(key), "uid": pa.array(uids)})

    blocks = tok_ds.map_batches(prefix_emit, batch_format="pyarrow")
    pairs = candidate_pairs(
        blocks, max_block_size=max_group_size, n_buckets=n_buckets
    ).materialize()
    if pairs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"doc_id_a": pa.array([], pa.int64()), "doc_id_b": pa.array([], pa.int64())}
            )
        )

    # verify: join token sets back on, exact Jaccard, threshold
    fa = tok_ds.map_batches(
        lambda t: pa.table({"ka": t[id_col], "tokset_a": t["tokset"]}),
        batch_format="pyarrow",
    )
    fb = tok_ds.map_batches(
        lambda t: pa.table({"kb": t[id_col], "tokset_b": t["tokset"]}),
        batch_format="pyarrow",
    )
    joined = bucketed_join(
        bucketed_join(pairs, fa, "uid_a", "ka", n_buckets=n_buckets),
        fb,
        "uid_b",
        "kb",
        n_buckets=n_buckets,
    )

    def verify(t: pa.Table) -> pa.Table:
        mat_a, len_a = pad_sketch_column(t["tokset_a"])
        mat_b, len_b = pad_sketch_column(t["tokset_b"])
        jac = sketch_jaccard_batch(mat_a, len_a, mat_b, len_b, _EXACT_K)
        keep = np.nonzero(jac >= thr)[0]
        sel = t.take(keep)
        return pa.table(
            {
                "doc_id_a": sel["uid_a"],
                "doc_id_b": sel["uid_b"],
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def tile_emit(batch: pa.Table, n_blocks: int, *, id_col: str = "vec_id") -> pa.Table:
    """Replicate each row to the ``n_blocks`` triangle tiles (i, j), i ≤ j,
    that involve its block (block = id % n_blocks). ``side`` marks which
    end of the tile the row belongs to; the diagonal tile gets each of its
    rows exactly once."""
    B = int(n_blocks)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    blk = (ids % B).astype(np.int64)
    n = len(ids)
    reps = np.repeat(np.arange(n), B)
    other = np.tile(np.arange(B, dtype=np.int64), n)
    b = blk[reps]
    ti = np.minimum(b, other)
    tj = np.maximum(b, other)
    out = batch.take(pa.array(reps))
    out = out.append_column("tile", pa.array(ti * B + tj))
    out = out.append_column("side", pa.array((b != ti).astype(np.int8)))
    return out


def cosine_pairs_tiled(ds, *, tau: float, n_blocks: int = 4, id_col: str = "vec_id"):
    """Exact all-pairs cosine ≥ τ with bounded per-task memory.

    Rows are hashed to ``n_blocks`` blocks by id; each row is shuffled to
    every tile (i, j) (i ≤ j) touching its block (replication factor =
    n_blocks), and each tile compares only its two blocks' matrices —
    per-task memory O(N/B), no whole-corpus broadcast. Output:
    (vec_id_a < vec_id_b) id pairs, identical to the exact baseline.
    """
    B = int(n_blocks)

    def emit(batch: pa.Table) -> pa.Table:
        return tile_emit(batch, B, id_col=id_col)

    from .ann import _embedding_matrix, _normalize

    def compare(t: pa.Table) -> pa.Table:
        tile = int(t["tile"][0].as_py())
        i, j = divmod(tile, B)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        m = _normalize(_embedding_matrix(t))
        empty = pa.table(
            {"vec_id_a": pa.array([], pa.int64()), "vec_id_b": pa.array([], pa.int64())}
        )
        if i == j:
            # diagonal tile: each row appears once (side 0); self-pairs
            sims = m @ m.T
            ia, ib = np.nonzero(sims >= tau)
            keep = ids[ia] < ids[ib]
            a, b = ids[ia][keep], ids[ib][keep]
        else:
            la = np.nonzero(side == 0)[0]
            lb = np.nonzero(side == 1)[0]
            if la.size == 0 or lb.size == 0:
                return empty
            sims = m[la] @ m[lb].T
            ia, ib = np.nonzero(sims >= tau)
            x, y = ids[la][ia], ids[lb][ib]
            a, b = np.minimum(x, y), np.maximum(x, y)
        return pa.table(
            {"vec_id_a": pa.array(a, pa.int64()), "vec_id_b": pa.array(b, pa.int64())}
        )

    return (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("tile")
        .map_groups(compare, batch_format="pyarrow")
    )
