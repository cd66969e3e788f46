"""Stable, process-independent hashing primitives.

Every hash here is deterministic across Python processes and Ray workers
(NEVER Python's builtin ``hash``, which is salted per process). These are
the analogs of the reference's checksum/manifest machinery — ``cksum``
manifests (``jenkins_scripts/jenkins/sync_http_repo_server.sh:57``) and the
md5-derived ES index names (``python/db_backup/es_backup.py:61``) — plus the
MinHash/SimHash sketches the target engine adds (BASELINE.json north_star).

Hot-path notes (100 TB thinking): ``crc32``/``blake2b`` are C-speed per
call; the per-row Python loop costs ~100 ns/row which is acceptable for
doc-level hashes (content fingerprints, salts). MinHash is vectorized with
numpy over the per-document shingle-hash array (num_perm × n_shingles),
which is where the real work is. The permutation family is multiply-shift
universal hashing (Dietzfelbinger et al. 1997): h(x) = (a*x + b mod 2^64)
>> 32 with odd ``a`` — exact under numpy uint64 wraparound, no bigint math.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MAX_U32 = np.uint32(0xFFFFFFFF)


def stable_u32(s: str | bytes) -> int:
    """Stable 32-bit hash of a string (crc32). Used for salting / bucketing."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return zlib.crc32(s) & 0xFFFFFFFF


def stable_u64(s: str | bytes) -> int:
    """Stable 64-bit hash (first 8 bytes of blake2b). Used for shingle ids."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def content_digest(s: str | bytes) -> str:
    """Hex md5 content fingerprint (matches DuckDB ``md5()`` for oracle parity)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return hashlib.md5(s).hexdigest()


def bucket_of(key: str, n_buckets: int) -> int:
    """Deterministic bucket assignment for hash-partitioned joins / salting."""
    return stable_u32(key) % n_buckets


def crc32_array(strings) -> np.ndarray:
    """crc32 over an iterable of strings → uint32 ndarray (C-speed per row)."""
    crc = zlib.crc32
    n = len(strings) if hasattr(strings, "__len__") else -1
    return np.fromiter(
        (crc(s.encode("utf-8", "surrogatepass")) & 0xFFFFFFFF for s in strings),
        dtype=np.uint32,
        count=n,
    )


# ---------------------------------------------------------------------------
# Vectorized fast-hash family (polynomial over a seeded byte table, splitmix64
# finalizer). This is the SIMILARITY hash space — shingles, token sets, LSH
# band keys — where only internal consistency and distribution matter (a
# pair's Jaccard over hashed sets equals the string-set value up to 64-bit
# collisions, ~|vocab|²/2⁶⁴). Identity-like hashes (doc uids, salts, split
# buckets, content digests) stay on stable_u64/crc32/md5 above: their values
# are pinned by persisted state and DuckDB-oracle parity.
#
# The batched forms hash an entire Arrow string column with numpy passes
# (byte-table gather × cached power table, one wraparound cumsum, one
# subtract) — no per-row Python. The scalar forms compute the identical
# value through the same kernel so tests can cross-check 1:1.
# ---------------------------------------------------------------------------

_FAST_P = np.uint64(1099511628211)  # FNV-1a prime, odd => invertible mod 2^64
_FAST_TBL = (
    np.random.default_rng(0xF057AB1E).integers(1, 1 << 62, size=256, dtype=np.uint64)
    * np.uint64(2)
    + np.uint64(1)
)
_MIXA = np.uint64(0xBF58476D1CE4E5B9)
_MIXB = np.uint64(0x94D049BB133111EB)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized uint64 → uint64 (bijective)."""
    h = (h ^ (h >> np.uint64(30))) * _MIXA
    h = (h ^ (h >> np.uint64(27))) * _MIXB
    return h ^ (h >> np.uint64(31))


_FPOW_CACHE: list[np.ndarray] = []


def _fpow(n: int) -> np.ndarray:
    """P^0..P^(≥n-1) mod 2^64, cached per process (grows to the longest
    item seen; token/shingle lengths keep it KB-sized)."""
    if not _FPOW_CACHE or _FPOW_CACHE[0].size < n:
        size = max(1024, 1 << max(n - 1, 1).bit_length())
        t = np.empty(size, dtype=np.uint64)
        t[0] = np.uint64(1)
        np.cumprod(np.full(size - 1, _FAST_P, dtype=np.uint64), out=t[1:])
        _FPOW_CACHE[:] = [t]
    return _FPOW_CACHE[0]


def hash_utf8_flat(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """uint64 hash of each ``data[offsets[i]:offsets[i+1]]`` byte slice,
    fully vectorized. Zero-length items hash deterministically (no
    reduceat edge cases: the kernel is a wraparound-cumsum difference).
    ``data`` uint8; ``offsets`` int64, n+1 entries, non-decreasing —
    exactly an Arrow string column's (values, offsets) pair."""
    offsets = offsets.astype(np.int64, copy=False)
    n = offsets.size - 1
    lens = offsets[1:] - offsets[:-1]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if offsets[-1] == offsets[0]:
        # same formula as the general path with h=0, len=0 — an empty
        # string hashes identically whether or not the batch has content
        zero = np.zeros(1, dtype=np.uint64)
        return np.full(n, _mix64(zero ^ _mix64(zero))[0], dtype=np.uint64)
    base = int(offsets[0])
    seg = data[base : int(offsets[-1])]
    relpos = np.arange(seg.size, dtype=np.int64) - np.repeat(
        offsets[:-1] - base, lens
    )
    w = _FAST_TBL[seg] * _fpow(int(lens.max()))[relpos]
    c = np.cumsum(w, dtype=np.uint64)
    end_idx = offsets[1:] - 1 - base
    start_idx = offsets[:-1] - 1 - base
    hi = c[np.maximum(end_idx, 0)]
    lo = np.where(start_idx >= 0, c[np.maximum(start_idx, 0)], np.uint64(0))
    h = np.where(lens > 0, hi - lo, np.uint64(0))
    return _mix64(h ^ _mix64(lens.astype(np.uint64)))


def fast_u64(s: str | bytes) -> int:
    """Scalar form of ``hash_utf8_flat`` — bit-identical to the batch
    kernel (the property tests assert it)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    data = np.frombuffer(s, dtype=np.uint8)
    return int(hash_utf8_flat(data, np.array([0, len(s)], dtype=np.int64))[0])


def hash_string_column(col) -> np.ndarray:
    """uint64 ``hash_utf8_flat`` of every row of an Arrow string column,
    straight off the column's own (offsets, values) buffers — zero
    per-row Python. Bit-identical to ``fast_u64`` row-by-row. Nulls are
    not supported (callers hash key columns, which are never null)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if col.null_count:
        raise ValueError("hash_string_column: null keys are not supported")
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return hash_utf8_flat(data, offs)


def _combine_fixed_windows(th: np.ndarray, ws: np.ndarray, k: int) -> np.ndarray:
    """Polynomial combine of ``th[ws[j] : ws[j]+k]`` windows → uint64."""
    acc = th[ws].copy()
    for j in range(1, k):
        acc = acc * _FAST_P + th[ws + j]
    return _mix64(acc ^ _mix64(np.full(ws.size, k, dtype=np.uint64)))


def shingle_hashes_flat(
    th: np.ndarray, toff: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-document k-shingle hash SETS from flat token hashes.

    ``th`` uint64 token hashes for a batch of docs, ``toff`` int64[n+1]
    offsets. Returns ``(sh, soff)``: each doc's SORTED UNIQUE shingle
    hashes, flat + offsets. Docs with 0 < L < k tokens get one shingle
    combining all L token hashes (tiny docs still participate in
    MinHash); empty docs get none. All passes are numpy — window
    generation, k-term polynomial combine, and one stable two-key sort
    for the per-doc set dedup."""
    toff = toff.astype(np.int64, copy=False)
    n = toff.size - 1
    lens = toff[1:] - toff[:-1]
    wcnt = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    total = int(wcnt.sum())
    out = np.empty(total, dtype=np.uint64)
    ooff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wcnt, out=ooff[1:])
    # full windows (L >= k), doc-major
    full = lens >= k
    if full.any():
        fw = wcnt * full
        wi = np.arange(int(fw.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(fw) - fw, fw
        )
        ws = np.repeat(toff[:-1], fw) + wi
        out[np.repeat(ooff[:-1], fw) + wi] = _combine_fixed_windows(th, ws, k)
    # short docs (0 < L < k): one shingle over all L tokens; ≤ k-1 passes
    for L in range(1, k):
        sel = lens == L
        if sel.any():
            out[ooff[:-1][sel]] = _combine_fixed_windows(th, toff[:-1][sel], L)
    # per-doc sorted unique: values already doc-major; stable sort by value
    # then by doc restores doc-major order with values sorted within docs
    if total:
        d = np.repeat(np.arange(n, dtype=np.int64), wcnt)
        order = np.lexsort((out, d))
        s = out[order]
        dd = d[order]
        keep = np.ones(total, dtype=bool)
        keep[1:] = (s[1:] != s[:-1]) | (dd[1:] != dd[:-1])
        sh = s[keep]
        ucnt = np.bincount(dd[keep], minlength=n)
    else:
        sh = out
        ucnt = np.zeros(n, dtype=np.int64)
    soff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ucnt, out=soff[1:])
    return sh, soff


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """uint64 hash set of a token sequence's k-shingles, SORTED.

    Documents shorter than ``k`` tokens hash all their tokens as a single
    shingle so tiny docs still participate in MinHash. Scalar form of
    ``shingle_hashes_flat`` — identical values (property-tested); both
    build on token-level ``fast_u64`` hashes combined with the same
    polynomial, so the engine has ONE similarity-hash space."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    joined = "".join(tokens).encode("utf-8", "surrogatepass")
    toff = np.zeros(len(tokens) + 1, dtype=np.int64)
    np.cumsum(
        np.array([len(t.encode("utf-8", "surrogatepass")) for t in tokens]),
        out=toff[1:],
    )
    th = hash_utf8_flat(np.frombuffer(joined, dtype=np.uint8), toff)
    sh, _ = shingle_hashes_flat(th, np.array([0, len(tokens)], dtype=np.int64), k)
    return sh


def minhash_signatures_flat(
    sh: np.ndarray, soff: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures from flat shingle hashes + offsets —
    ``minhash_signatures_batch`` without the per-doc list handling.
    Empty docs get the all-max signature (matches nothing)."""
    soff = soff.astype(np.int64, copy=False)
    n = soff.size - 1
    num_perm = a.shape[0]
    out = np.full((n, num_perm), _MAX_U32, dtype=np.uint32)
    lens = soff[1:] - soff[:-1]
    nz = lens > 0
    if not nz.any():
        return out
    x = sh.astype(np.uint64, copy=False)
    starts = soff[:-1][nz]
    sig_nz = np.empty((int(nz.sum()), num_perm), dtype=np.uint32)
    for i in range(num_perm):
        hv = (a[i] * x + b[i]) >> np.uint64(32)
        sig_nz[:, i] = np.minimum.reduceat(hv, starts).astype(np.uint32)
    out[nz] = sig_nz
    return out


def minhash_permutations(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) multiply-shift coefficients; ``a`` odd uint64.

    Fixed seed ⇒ identical signatures on every worker (conformance requires
    cross-process determinism, SURVEY.md §7.0).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint32[num_perm]) of one document's shingle set.

    ``sh``: uint64 base hashes of the doc's shingles. Empty docs get the
    all-max signature (matches nothing). h_i(x) = (a_i*x + b_i) >> 32 under
    uint64 wraparound — exact multiply-shift hashing.
    """
    if sh.size == 0:
        return np.full(a.shape[0], _MAX_U32, dtype=np.uint32)
    x = sh.astype(np.uint64)
    hv = (a[:, None] * x[None, :] + b[:, None]) >> np.uint64(32)
    return hv.min(axis=1).astype(np.uint32)


def minhash_signatures_batch(
    shingle_sets: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Signatures for a batch of docs → uint32[(n_docs, num_perm)].

    Concatenates all shingle hashes and uses ``np.minimum.reduceat`` so the
    per-permutation work is one big vectorized pass, not a per-doc loop.
    """
    n = len(shingle_sets)
    num_perm = a.shape[0]
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint32)
    lengths = np.array([s.size for s in shingle_sets], dtype=np.int64)
    out = np.full((n, num_perm), _MAX_U32, dtype=np.uint32)
    nz = lengths > 0
    if not nz.any():
        return out
    concat = np.concatenate([s for s in shingle_sets if s.size]).astype(np.uint64)
    starts = np.zeros(int(nz.sum()), dtype=np.int64)
    np.cumsum(lengths[nz][:-1], out=starts[1:])
    # (num_perm, total_shingles) in chunks to bound memory at scale.
    sig_nz = np.empty((int(nz.sum()), num_perm), dtype=np.uint32)
    for i in range(num_perm):
        hv = (a[i] * concat + b[i]) >> np.uint64(32)
        sig_nz[:, i] = np.minimum.reduceat(hv, starts).astype(np.uint32)
    out[nz] = sig_nz
    return out


def lsh_band_ids_batch(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """Fixed-width int64 LSH band keys (the shuffle-key form) for a batch:
    ``(n_docs, num_perm)`` uint32 signatures → ``(n_docs, n_bands)`` int64
    in ``[0, 2^62)``. Key = splitmix64(poly64 combine of the band's rows,
    seeded by the band index), masked positive and clear of the 2^62
    host-key bit — the vectorized member of the similarity-hash family
    (``rows`` numpy passes total, no per-row Python). 8-byte keys shuffle
    ~3× lighter than hex strings and group/sort at integer speed; distinct
    bands with identical rows still get distinct keys (band seed); 62-bit
    collisions across 10^12 docs only merge two blocks (recall unaffected;
    scoring rejects strays)."""
    n, num_perm = sigs.shape
    rows = num_perm // n_bands
    x = sigs.reshape(n, n_bands, rows).astype(np.uint64)
    acc = np.broadcast_to(
        _mix64(np.arange(1, n_bands + 1, dtype=np.uint64))[None, :], (n, n_bands)
    ).copy()
    for j in range(rows):
        acc = acc * _FAST_P + x[:, :, j]
    return (_mix64(acc) & np.uint64(0x3FFF_FFFF_FFFF_FFFF)).astype(np.int64)


def lsh_band_ids(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """Band keys for ONE signature — thin wrapper over the batch kernel so
    the engine has exactly one band-key family."""
    return lsh_band_ids_batch(sig[None, :], n_bands)[0]


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a document from its token uint64 hashes."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    signed = bits * 2 - 1
    if weights is not None:
        signed = signed * weights[:, None]
    v = signed.sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


SPLIT_SALT = "split:"
# md5 first-byte thresholds (hex strings compare lexicographically):
# < 'cd' → train (~80%), < 'e6' → val (~10%), else test.
SPLIT_TRAIN_HI, SPLIT_VAL_HI = "cd", "e6"


def split_assign(ids) -> np.ndarray:
    """Deterministic train/val/test label per id: salted-md5 bucket —
    stable across runs, engines and cluster sizes (the DuckDB oracle
    computes the identical expression)."""
    import hashlib

    import pandas as pd

    h2 = pd.Series(ids).map(
        lambda i: hashlib.md5(f"{SPLIT_SALT}{i}".encode()).hexdigest()[:2]
    )
    return np.where(
        h2 < SPLIT_TRAIN_HI, "train", np.where(h2 < SPLIT_VAL_HI, "val", "test")
    )


def split_sql_case(id_expr: str) -> str:
    """The DuckDB CASE expression matching ``split_assign``."""
    h = f"substr(md5('{SPLIT_SALT}' || CAST({id_expr} AS VARCHAR)), 1, 2)"
    return (
        f"CASE WHEN {h} < '{SPLIT_TRAIN_HI}' THEN 'train' "
        f"WHEN {h} < '{SPLIT_VAL_HI}' THEN 'val' ELSE 'test' END"
    )
