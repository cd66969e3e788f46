"""Content-defined chunking: coverage, determinism, size bounds, the
shift-resistance property that justifies CDC over fixed-size chunking,
and the distributed chunk-dedup report."""

import numpy as np
import pyarrow as pa
import ray

from mdmpublic_ray.stages.cdc import (
    cdc_cut_points,
    chunk_bytes,
    chunk_dedup_stats,
    gear_hashes,
)

PARAMS = dict(min_size=64, avg_bits=6, max_size=512)


def _rand_bytes(n: int, seed: int) -> bytes:
    return np.random.default_rng(seed).integers(0, 256, size=n, dtype=np.uint8).tobytes()


def test_chunks_cover_input_exactly():
    raw = _rand_bytes(20_000, 1)
    chunks = chunk_bytes(raw, **PARAMS)
    pos = 0
    for off, length, _ in chunks:
        assert off == pos
        pos += length
    assert pos == len(raw)
    assert chunks == chunk_bytes(raw, **PARAMS)  # deterministic


def test_size_bounds():
    raw = _rand_bytes(50_000, 2)
    chunks = chunk_bytes(raw, **PARAMS)
    lens = [ln for _, ln, _ in chunks]
    assert all(64 <= ln <= 512 for ln in lens[:-1])
    assert 1 <= lens[-1] <= 512
    # expected chunk size ~ min + 2^avg_bits: the cut mask actually fires
    assert len(chunks) > 50_000 // 512


def test_empty_and_tiny():
    assert chunk_bytes(b"", **PARAMS) == []
    (off, ln, _), = chunk_bytes(b"abc", **PARAMS)
    assert (off, ln) == (0, 3)
    assert cdc_cut_points(np.zeros(0, dtype=np.uint8)).size == 0


def test_shift_resistance():
    """Insert a prefix: chunk boundaries realign after O(max_size) bytes,
    so nearly all chunk hashes are shared. Fixed-size chunking would
    share none — this is the property that makes CDC dedup work."""
    base = _rand_bytes(40_000, 3)
    shifted = b"x" * 17 + base
    h1 = {h for _, _, h in chunk_bytes(base, **PARAMS)}
    h2 = {h for _, _, h in chunk_bytes(shifted, **PARAMS)}
    shared = len(h1 & h2) / len(h1)
    assert shared >= 0.9, f"only {shared:.0%} of chunks survived a 17-byte shift"


def test_gear_hash_matches_sequential_recurrence():
    data = np.frombuffer(_rand_bytes(300, 4), dtype=np.uint8)
    from mdmpublic_ray.stages.cdc import _GEAR

    h = np.uint64(0)
    seq = []
    for b in data:
        h = (h << np.uint64(1)) + _GEAR[b]  # wraps mod 2^64
        seq.append(h)
    got = gear_hashes(data)
    assert np.array_equal(got, np.array(seq, dtype=np.uint64))


def test_chunk_dedup_stats(ray_session):
    a = _rand_bytes(8_000, 5).decode("latin-1")
    c = _rand_bytes(8_000, 6).decode("latin-1")
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([a, a, c])})
    res = (
        chunk_dedup_stats(
            ray.data.from_arrow(t), id_col="doc_id", text_col="text",
            min_size=64, avg_bits=6, max_size=512,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(res["doc_id"]) == [1, 2, 3]
    # identical docs: every chunk shared, byte-for-byte
    assert res.loc[0, "n_shared"] == res.loc[0, "n_chunks"]
    assert res.loc[0, "shared_bytes"] == res.loc[0, "total_bytes"]
    assert res.loc[1, "n_shared"] == res.loc[1, "n_chunks"]
    # distinct random doc: nothing shared
    assert res.loc[2, "n_shared"] == 0 and res.loc[2, "shared_bytes"] == 0
    assert res.loc[2, "total_bytes"] == len(c.encode("utf-8"))
