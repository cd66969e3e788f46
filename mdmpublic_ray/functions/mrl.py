"""Deterministic MRL-style quantile summary (the collapse policy of
Manku–Rajagopalan–Lindsay, SIGMOD 1998) — the bounded-memory scale path
for corpus quantiles, completing the sketch trio beside HyperLogLog
(``functions/hll.py``, distinct counts) and Misra-Gries
(``functions/heavyhitters.py``, heavy hitters). The EXACT oracle-checked
counterpart is ``stages/quantiles.py::exact_quantiles``
(``docs_len_quantiles``).

Structure: ``levels[i]`` is a sorted int64/float64 array whose elements
each stand for ``2**i`` original values. When a level exceeds the
capacity ``k`` it COLLAPSES: keep every second element of the sorted
array and promote the survivors to level ``i+1``. Classic MRL picks the
odd/even offset randomly for unbiasedness; here the offset ALTERNATES
deterministically per level (tracked in ``parity``), trading a constant
factor of the rank-error bound for bit-reproducible summaries — the
same determinism-over-randomness choice as the salted-hash samplers.

Memory is O(k · log(n/k)) regardless of n; summaries merge level-wise
(concat, re-sort, cascade collapses), so per-block summaries fold on
the driver or in a tree exactly like the Misra-Gries path. Rank error
after all collapses is bounded by ~log2(n/k)·n/(2k) worst-case;
the empirical bound on realistic data is far smaller and is asserted
in ``tests/test_mrl.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["mrl_build", "mrl_merge", "mrl_quantiles", "mrl_to_rows", "mrl_from_rows"]


def _new() -> dict:
    return {"levels": [], "parity": []}


def _ensure_level(s: dict, i: int) -> None:
    while len(s["levels"]) <= i:
        s["levels"].append(np.array([], dtype=np.float64))
        s["parity"].append(0)


def _collapse_cascade(s: dict, k: int) -> None:
    i = 0
    while i < len(s["levels"]):
        arr = s["levels"][i]
        if arr.size <= k:
            i += 1
            continue
        arr = np.sort(arr, kind="stable")
        m = arr.size - (arr.size % 2)
        off = s["parity"][i] & 1
        s["parity"][i] ^= 1
        promoted = arr[off:m:2]
        leftover = arr[m:]  # odd element stays at this level
        s["levels"][i] = leftover
        _ensure_level(s, i + 1)
        s["levels"][i + 1] = np.concatenate([s["levels"][i + 1], promoted])
        i += 1


def mrl_build(values, k: int = 256) -> dict:
    """Summarize a 1-D array-like → MRL summary with capacity ``k`` per
    level. One sort per collapse; no per-item Python."""
    s = _new()
    v = np.asarray(values, dtype=np.float64)
    if v.size:
        _ensure_level(s, 0)
        s["levels"][0] = v.copy()
        _collapse_cascade(s, k)
    return s


def mrl_merge(a: dict, b: dict, k: int = 256) -> dict:
    """Merge two summaries level-wise, then re-collapse. Deterministic
    given the operand contents and order."""
    s = _new()
    depth = max(len(a["levels"]), len(b["levels"]))
    _ensure_level(s, depth - 1) if depth else None
    for i in range(depth):
        parts = []
        if i < len(a["levels"]):
            parts.append(a["levels"][i])
        if i < len(b["levels"]):
            parts.append(b["levels"][i])
        s["levels"][i] = np.concatenate(parts) if parts else np.array([], np.float64)
        s["parity"][i] = (
            (a["parity"][i] if i < len(a["parity"]) else 0)
            ^ (b["parity"][i] if i < len(b["parity"]) else 0)
        )
    _collapse_cascade(s, k)
    return s


def mrl_quantiles(s: dict, qs) -> np.ndarray:
    """Estimated quantiles: weighted lower-rank selection over
    (value, 2**level) pairs — the same floor((n-1)·q) rank convention as
    ``stages/quantiles.exact_quantiles``."""
    vals = []
    wts = []
    for i, arr in enumerate(s["levels"]):
        if arr.size:
            vals.append(arr)
            wts.append(np.full(arr.size, 1 << i, dtype=np.int64))
    if not vals:
        return np.full(len(list(qs)), np.nan)
    v = np.concatenate(vals)
    w = np.concatenate(wts)
    order = np.argsort(v, kind="stable")
    v = v[order]
    cw = np.cumsum(w[order])
    n = cw[-1]
    out = []
    for q in qs:
        target = int(np.floor((n - 1) * float(q))) + 1  # 1-based rank
        idx = int(np.searchsorted(cw, target, side="left"))
        out.append(v[min(idx, v.size - 1)])
    return np.asarray(out)


def mrl_to_rows(s: dict):
    """Flatten to (level:int64, value:float64) arrays for shipping a
    per-block summary through Arrow rows (parity is build-local state
    and intentionally not shipped — merges restart alternation)."""
    levels = []
    values = []
    for i, arr in enumerate(s["levels"]):
        if arr.size:
            levels.append(np.full(arr.size, i, dtype=np.int64))
            values.append(arr)
    if not levels:
        return np.array([], np.int64), np.array([], np.float64)
    return np.concatenate(levels), np.concatenate(values)


def mrl_from_rows(levels, values) -> dict:
    """Inverse of :func:`mrl_to_rows` (no collapsing — caller merges)."""
    s = _new()
    levels = np.asarray(levels, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    if levels.size:
        _ensure_level(s, int(levels.max()))
        for i in range(int(levels.max()) + 1):
            s["levels"][i] = values[levels == i].copy()
    return s
