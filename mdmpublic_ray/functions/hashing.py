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


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """uint64 base hashes of a token sequence's k-shingles (set semantics).

    Documents shorter than ``k`` tokens hash the whole token string as a
    single shingle so tiny docs still participate in MinHash.
    """
    if len(tokens) < k:
        if not tokens:
            return np.empty(0, dtype=np.uint64)
        return np.array([stable_u64(" ".join(tokens))], dtype=np.uint64)
    out = {
        stable_u64(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


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


def lsh_band_ids(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """Fixed-width int64 LSH band keys for one signature (the shuffle-key
    form): id = blake2b(band_index ‖ band_rows)[:8]
    masked positive. 8-byte keys shuffle ~3× lighter than the hex-string
    form and group/sort at integer speed — the difference is material when
    every document emits n_bands keys. 64-bit collisions across 10^12 docs
    only merge two blocks (recall unaffected; scoring rejects strays)."""
    rows = sig.shape[0] // n_bands
    out = np.empty(n_bands, dtype=np.int64)
    for band in range(n_bands):
        chunk = sig[band * rows : (band + 1) * rows]
        d = hashlib.blake2b(band.to_bytes(2, "big") + chunk.tobytes(), digest_size=8).digest()
        out[band] = int.from_bytes(d, "big") & 0x3FFF_FFFF_FFFF_FFFF
    return out


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
