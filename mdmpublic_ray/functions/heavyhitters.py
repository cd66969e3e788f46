"""Misra-Gries / SpaceSaving heavy-hitters summary — the bounded-memory
scale path for corpus top-k (``queries.q_docs_top_tokens`` is the exact,
oracle-checked counterpart, whose groupby state is O(|vocab|); this
summary is O(capacity) regardless of vocabulary size).

Guarantees (classic Misra-Gries, Metwally et al. 2005 merge):
- a summary of capacity ``c`` built over ``n`` items undercounts any
  item by at most ``n / c`` (the tracked error bound is returned);
- merging summaries (sum counters, then decrement by the (c+1)-th
  largest and drop ≤ 0) preserves the bound with errors adding — so
  per-block summaries combine associatively on the driver or in a tree;
- every TRUE item with frequency > total_error is guaranteed present.

Vectorized: a batch folds via one ``value_counts`` then a single
decrement-and-trim; no per-item Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def mg_fold(values, capacity: int) -> tuple[dict, int]:
    """Summarize an iterable of hashable items → (counts dict of size
    ≤ capacity, error_bound). One value_counts + one trim."""
    vc = pd.Series(list(values)).value_counts() if not isinstance(
        values, pd.Series
    ) else values.value_counts()
    return _trim(vc.to_dict(), capacity)


def _trim(counts: dict, capacity: int) -> tuple[dict, int]:
    if len(counts) <= capacity:
        return counts, 0
    vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))
    dec = int(vals[-(capacity + 1)])  # (c+1)-th largest
    out = {k: v - dec for k, v in counts.items() if v > dec}
    return out, dec


def mg_merge(summaries, capacity: int) -> tuple[dict, int]:
    """Merge [(counts, err), ...] → (counts, total_error_bound)."""
    total: dict = {}
    err = 0
    for counts, e in summaries:
        err += e
        for k, v in counts.items():
            total[k] = total.get(k, 0) + v
    merged, dec = _trim(total, capacity)
    return merged, err + dec


def mg_topk(summary: tuple[dict, int], k: int) -> list[tuple[str, int, int]]:
    """Top-k by estimated count: (item, count_lower_bound, error) —
    true count ∈ [count, count + error]."""
    counts, err = summary
    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(t, int(c), int(err)) for t, c in items]
