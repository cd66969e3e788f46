"""Multi-pass blocking: canonical-host keys + MinHash/LSH band keys
(SURVEY.md §7.1 M3; the Ray-native replacement for the reference's
Elasticsearch match indexes ``master-index-<md5>``,
``/root/reference/python/db_backup/es_backup.py:61``).

Layout decision (scale): the blocks table carries ONLY ``(block_key, url)``
— tiny rows through the wide shuffle. Per-document match features (title,
bottom-k shingle sketch, minhash signature) live in a separate ``features``
table keyed by url and are joined onto candidate *pairs* later, so the
×(n_bands+1) key explosion never replicates kilobyte sketches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import hashing as H
from ..functions import text as T
from ..functions.urls import canonical_host

# LSH geometry: 128 permutations in 64 bands × 2 rows. P(candidate) at
# Jaccard j is 1-(1-j^2)^64: ≈1.0 at j=0.45, ≈0.15 at j=0.05 — high recall
# for near-duplicates, manageable extra candidates at low similarity
# (rejected later by exact scoring). See SURVEY.md §7.4 pair-explosion note.
NUM_PERM = 128
N_BANDS = 64
SHINGLE_K = 3
SKETCH_K = 160  # bottom-k shingle sketch size; exact Jaccard for docs < k shingles
TITLE_TOKENS = 8
# Similarity-hash space version: bumped when the token/shingle hash family
# changes (v2 = vectorized poly64+splitmix, functions/hashing.py). Part of
# the features stage digest so a checkpointed state built under another
# hash space refuses to resume/increment instead of silently mixing spaces.
FEATURES_HASHV = 2


# Per-process cache of the seeded permutation family: features runs as
# stateless TASKS (full-width from the first batch, no actor-pool ramp);
# the only "state" is (a, b) coefficient arrays, microseconds to build and
# cached per worker process here.
_PERM_CACHE: dict = {}


def _perms(num_perm: int, seed: int):
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = H.minhash_permutations(num_perm, seed=seed)
    return _PERM_CACHE[key]


def doc_uid(url: str) -> int:
    """Stable int64 document id from the url (top bit masked off). Blocks
    and candidate pairs shuffle these 8-byte ids instead of ~50-byte url
    strings (~3× lighter exchange, integer-speed sort/dedup); urls are
    resolved back from the features table at scoring time. 64-bit
    collision odds are nil at sandbox scale; a 10^12-document deployment
    upgrades to 128-bit ids (two int64 columns) — same layout."""
    return H.stable_u64(url) & 0x7FFF_FFFF_FFFF_FFFF


def hashed_embeddings_batch(toks: list, emb_dim: int) -> np.ndarray:
    """Feature-hashing text embedding: every token (WITH multiplicity)
    hashes to a bucket in [0, emb_dim) with a ±1 sign bit, counts
    accumulate, rows L2-normalize → an (n_docs, emb_dim) float32 matrix
    whose cosine is the classic hashing-trick text similarity
    (Weinberger et al., ICML 2009). Deterministic (``stable_u64``); the
    per-batch memo hashes each distinct token once."""
    n = len(toks)
    lens = np.array([len(tk) for tk in toks], dtype=np.int64)
    if lens.sum():
        memo: dict[str, int] = {}
        flat = np.fromiter(
            (memo.setdefault(w, H.fast_u64(w)) for tk in toks for w in tk),
            dtype=np.uint64,
            count=int(lens.sum()),
        )
    else:
        flat = np.empty(0, dtype=np.uint64)
    toff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=toff[1:])
    return hashed_embeddings_flat(flat, toff, emb_dim)


def hashed_embeddings_flat(th: np.ndarray, toff: np.ndarray, emb_dim: int) -> np.ndarray:
    """``hashed_embeddings_batch`` from flat token hashes + offsets (the
    vectorized front end's layout) — bit-identical to the list form."""
    n = toff.size - 1
    lens = toff[1:] - toff[:-1]
    m = np.zeros((n, emb_dim), dtype=np.float64)
    if th.size:
        bucket = (th % np.uint64(emb_dim)).astype(np.int64)
        sign = 1.0 - 2.0 * ((th >> np.uint64(32)) & np.uint64(1)).astype(np.float64)
        np.add.at(m, (np.repeat(np.arange(n), lens), bucket), sign)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (m / norms).astype(np.float32)


def fixed_u32_matrix(col) -> np.ndarray:
    """``(n, k)`` uint32 view of an equal-width ``pa.binary()`` column —
    buffer-level, no per-row Python. Ragged or null-bearing input (never
    produced by the features stage; possible in hand-built test tables)
    falls back to a per-row decode."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.uint32)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ]
    lens = offs[1:] - offs[:-1]
    w = int(lens[0])
    if arr.null_count == 0 and w % 4 == 0 and bool((lens == w).all()):
        flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
        return flat.reshape(n, w).view(np.uint32)
    return np.vstack(
        [np.frombuffer(b or b"", dtype=np.uint32) for b in arr.to_pylist()]
    )


def _binary_from_flat(flat_bytes: bytes, item_bytes: np.ndarray) -> pa.Array:
    """Variable-width ``pa.binary()`` array straight from a flat byte
    buffer + per-item byte counts — no per-row Python, no copies beyond
    the two buffers."""
    n = item_bytes.size
    off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(item_bytes, out=off[1:])
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat_bytes)]
    )


def compute_features_batch(
    batch: pa.Table, *, seed: int = 42, num_perm: int = NUM_PERM, emb_dim: int = 0,
    emb_model=None,
) -> pa.Table:
    """Fully vectorized: Arrow tokenization (lower + regex split), numpy
    polynomial token/shingle hashing (``hashing.hash_utf8_flat`` /
    ``shingle_hashes_flat``), reduceat MinHash, buffer-level binary
    assembly. The only per-row Python left is ``doc_uid`` (one blake2b
    per url — identity hash, pinned by persisted state)."""
    import pyarrow.compute as pc

    a, b = _perms(num_perm, seed)
    tok_list, th, toff = T.tokens_hashed_arrow(batch["text"])
    sh, soff = H.shingle_hashes_flat(th, toff, SHINGLE_K)
    sigs = H.minhash_signatures_flat(sh, soff, a, b)
    # bottom-k sketch: sh is sorted-unique per doc, so the sketch is the
    # first min(len, K) entries of each doc's segment
    take = np.minimum(soff[1:] - soff[:-1], SKETCH_K)
    idx = np.repeat(soff[:-1], take) + (
        np.arange(int(take.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(take) - take, take)
    )
    urls = batch["url"].to_pylist()
    n = len(urls)
    cols = {
        "url": batch["url"],
        "uid": pa.array([doc_uid(u) for u in urls], pa.int64()),
        "title": pc.binary_join(
            pc.list_slice(tok_list, 0, TITLE_TOKENS), " "
        ),
        "n_tokens": pa.array(toff[1:] - toff[:-1], pa.int64()),
        "sketch": _binary_from_flat(
            sh[idx].tobytes(), (take * 8).astype(np.int64)
        ),
        "sig": _binary_from_flat(
            np.ascontiguousarray(sigs).tobytes(),
            np.full(n, sigs.shape[1] * 4, dtype=np.int64),
        ),
    }
    if emb_dim:
        emb = hashed_embeddings_flat(th, toff, emb_dim)
        if emb_model is not None:
            # learned model (ST5): hashed counts → model embedding. The
            # model was loaded ONCE per actor/worker, never per batch.
            if emb_model.in_dim != emb_dim:
                raise ValueError(
                    f"emb model expects in_dim={emb_model.in_dim}, "
                    f"features emb_dim={emb_dim}"
                )
            emb = emb_model(emb)
        width = emb.shape[1]
        cols["emb"] = _binary_from_flat(
            np.ascontiguousarray(emb, dtype=np.float32).tobytes(),
            np.full(n, width * 4, dtype=np.int64),
        )
    return pa.table(cols)


class ComputeFeatures:
    """Actor-pool stage: (url, text, ...) → (url, title, n_tokens,
    sketch: binary, sig: binary).

    ``sketch`` is the bottom-k shingle uint64 array and ``sig`` the uint32
    MinHash signature, both stored as raw little-endian bytes: Ray's
    hash-shuffle join does not accept list-typed payload columns, and the
    fixed-width byte encoding is smaller and zero-parse
    (``np.frombuffer``) on the consumer side anyway.

    MinHash permutations are built once per actor in ``__init__`` (ST1/ST3
    pattern, SURVEY.md §2.3); signatures are computed with the vectorized
    reduceat batch kernel.
    """

    def __init__(self, num_perm: int = NUM_PERM, seed: int = 42, emb_dim: int = 0,
                 emb_model_path: str | None = None, emb_device: str = "auto") -> None:
        self.a, self.b = H.minhash_permutations(num_perm, seed=seed)
        self._seed = seed
        self._num_perm = num_perm
        self._emb_dim = emb_dim
        # ST5 literal: model weights load ONCE per actor, in __init__
        self._model = None
        if emb_model_path:
            from .embmodel import EmbeddingModel

            self._model = EmbeddingModel.load(emb_model_path, device=emb_device)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return compute_features_batch(
            batch, seed=self._seed, num_perm=self._num_perm, emb_dim=self._emb_dim,
            emb_model=self._model,
        )


def features_stage(ds, *, concurrency=None, batch_size: int = 512, seed: int = 42,
                   emb_dim: int = 0, emb_model_path: str | None = None,
                   emb_device: str = "auto", num_gpus: float = 0.0):
    """Stateless task pool by default (see ``compute_features_batch``);
    pass ``concurrency`` to force an actor pool. ``emb_dim > 0`` adds the
    hashed-text-embedding column consumed by the optional
    cosine-over-embedding scoring signal (scoring.py ``emb_weight``);
    ``emb_model_path`` applies a learned :class:`embmodel.EmbeddingModel`
    on top (loaded once per actor — ST5), forcing an actor pool.
    ``num_gpus`` is a per-actor GPU request, clamped to 0 with a loud
    warning on a GPU-less cluster (resolve_num_gpus) so the stage never
    hangs unschedulable; the model then runs its CPU backend."""
    if emb_model_path and concurrency is None:
        # model state belongs in actor __init__, not re-fetched per task
        from .util import default_actor_pool

        concurrency = default_actor_pool()
    if concurrency is not None:
        kw = {}
        if num_gpus:
            from .embmodel import resolve_num_gpus

            g = resolve_num_gpus(num_gpus)
            if g:
                kw["num_gpus"] = g
        return ds.map_batches(
            ComputeFeatures,
            fn_constructor_kwargs={"seed": seed, "emb_dim": emb_dim,
                                   "emb_model_path": emb_model_path,
                                   "emb_device": emb_device},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
            **kw,
        )
    import functools

    return ds.map_batches(
        functools.partial(compute_features_batch, seed=seed, emb_dim=emb_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


HOST_BIT = 1 << 62
_KEY_MASK = 0x3FFF_FFFF_FFFF_FFFF
_SALT_MIX = 0x9E3779B97F4A7C15  # golden-ratio odd constant

# Salted sub-block size for HOT hosts (smaller than max_block_size on
# purpose): within-subgroup pairs of a random url split are exploratory
# same-site candidates, not content-keyed matches — LSH carries near-dup
# recall across the whole host — so their budget is kept at ~31 candidate
# pairs per hot-host page (64·63/2 per 64-page subgroup) instead of ~127.
# A 10M-page host then costs 0.3B candidates, not 1.3B.
SALT_SUBBLOCK = 64


def hot_host_sizes(urls_ds, max_block_size: int, *, driver_cap: int = 100_000) -> dict:
    """Skew pre-pass (north_rule "explicit skew-aware salting of hot
    blocks"): canonical-host → row count, for hosts EXCEEDING
    ``max_block_size``. Counts are map-side combined, the aggregate
    shuffles ≤ |hosts per batch| rows, and only the hot tail reaches the
    driver — bounded by total_rows / max_block_size, in practice a
    handful (``driver_cap`` guards the pathological case; overflow is
    logged, overflowing hosts simply stay capped instead of salted)."""
    import pandas as pd

    from .util import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        hosts = [canonical_host(u) or "" for u in t["url"].to_pylist()]
        s = pd.Series(hosts).value_counts()
        return pa.table(
            {"host": s.index.to_numpy().astype(str), "n": s.to_numpy().astype("int64")}
        )

    # coalesce the partials before the bucketed shuffle: the map above
    # emits ONE tiny table per input block (≤ distinct hosts per block),
    # and a sort-shuffle over hundreds of 50-row blocks is pure per-task
    # overhead (measured 7.0 s → 0.5 s at 242k pages / 398 blocks).
    # repartition without shuffle=True is a metadata coalesce, and 32
    # blocks of (host, n) rows stay small even at web scale (partial
    # rows are bounded by distinct hosts × upstream blocks, and each
    # row is ~30 bytes).
    from .util import DEFAULT_BUCKETS

    agg = grouped_agg(
        urls_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(DEFAULT_BUCKETS),
        ["host"],
        {"n": ("n", "sum")},
    )
    hot_tbl = agg.map_batches(
        lambda t: t.filter(pa.compute.greater(t["n"], max_block_size)),
        batch_format="pyarrow",
    ).take_all()
    if len(hot_tbl) > driver_cap:
        import logging

        logging.getLogger(__name__).warning(
            "hot_host_sizes: %d hot hosts exceeds driver_cap=%d; the tail "
            "stays capped (not salted)",
            len(hot_tbl),
            driver_cap,
        )
        hot_tbl = sorted(hot_tbl, key=lambda r: -r["n"])[:driver_cap]
    return {r["host"]: int(r["n"]) for r in hot_tbl if r["host"]}


def block_keys_stage(
    features_ds,
    *,
    n_bands: int = N_BANDS,
    use_host_pass: bool = True,
    hot_hosts: dict | None = None,
    max_block_size: int = 256,
):
    """features → exploded (block_key, uid).

    Pass 1: canonical-host key — cheap high-recall same-site key.
    Pass 2: LSH band keys from the minhash signature.

    Keys are int64 (fixed-width shuffle keys, see ``lsh_band_ids``): host
    keys have the 2^62 bit set, band ids don't — the two key spaces can't
    collide.

    **Skew-aware salting**: a host in ``hot_hosts`` (size from the
    ``hot_host_sizes`` pre-pass) is split into ``ceil(size /
    max_block_size)`` salted sub-blocks by ``crc32(url) % g``, the salt
    mixed INTO the int64 key — so the downstream shuffle sees g
    even-sized keys instead of one giant one (balanced reducers), pair
    cost per sub-block stays O(max_block_size²), and no downstream code
    changes. Cross-salt same-host pairs are not emitted; true
    near-duplicates split across salts are still paired by the LSH pass,
    whose keys depend on content, not host."""
    hot = hot_hosts or {}

    def explode(batch: pa.Table) -> pa.Table:
        uids = np.asarray(batch["uid"].to_numpy(zero_copy_only=False), np.int64)
        n = uids.size
        # pass 2 first: band keys for the whole batch in one vectorized
        # kernel (the former per-row loop was 64 blake2b calls per doc)
        band = (
            H.lsh_band_ids_batch(fixed_u32_matrix(batch["sig"]), n_bands)
            if n
            else np.empty((0, n_bands), dtype=np.int64)
        )
        out_keys = [band.reshape(-1)]
        out_uids = [np.repeat(uids, n_bands)]
        if use_host_pass:
            # host parse + base key memoized per distinct host (hosts
            # repeat heavily within a batch); salting stays per-URL
            hkey = np.zeros(n, dtype=np.int64)
            memo: dict[str, int] = {}
            urls = batch["url"].to_pylist()
            for i, url in enumerate(urls):
                host = canonical_host(url)
                if not host:
                    continue
                key = memo.get(host)
                if key is None:
                    key = memo[host] = (H.stable_u64(host) & _KEY_MASK) | HOST_BIT
                size = hot.get(host)
                if size:
                    # subgroup target ≤ half the cap: the hash split has
                    # variance, and a subgroup that lands over
                    # max_block_size would be dropped by the pair cap
                    sub = max(2, min(SALT_SUBBLOCK, max_block_size // 2))
                    g = -(-size // sub)  # ceil
                    salt = H.stable_u32(url) % g
                    key = ((key ^ ((salt + 1) * _SALT_MIX)) & _KEY_MASK) | HOST_BIT
                hkey[i] = key
            sel = hkey != 0
            out_keys.append(hkey[sel])
            out_uids.append(uids[sel])
        return pa.table(
            {
                "block_key": pa.array(np.concatenate(out_keys), pa.int64()),
                "uid": pa.array(np.concatenate(out_uids), pa.int64()),
            }
        )

    return features_ds.map_batches(explode, batch_format="pyarrow")


def block_size_stats(blocks_ds):
    """Skew pre-pass (SURVEY.md §4.2): per-block member counts, descending.
    Feeds the metrics sidecar and the oversized-block cap diagnostics."""
    from .util import grouped_agg

    return grouped_agg(
        blocks_ds, ["block_key"], {"n_members": ("block_key", "count")}
    )
