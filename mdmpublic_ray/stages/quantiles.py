"""Exact distributed quantiles by iterative histogram refinement.

A global ``sort`` is the textbook way to take exact quantiles and the
single most expensive thing you can do to 100 TB.  This operator instead
computes exact rank-selection (the element at rank ``floor((n-1)*q)`` of
the sorted multiset — DuckDB ``ORDER BY … OFFSET`` semantics) with a few
cheap streaming passes:

  pass 0   min / max / count aggregate
  pass 1+  per-batch numpy histograms over the active interval of each
           unresolved rank (map-side partials, combined on the driver —
           the shuffled "table" is #blocks × #ranks rows of B counts)
  final    collect the ≤ ``max_collect`` candidates in each pinned
           interval and index locally

Each pass narrows an interval by ~``n_buckets``×, so 2 histogram passes
resolve 10^12 rows to a 10^5-element collect.  All ranks are refined in
the SAME pass (one scan serves every quantile).  No shuffle, no sort —
scan cost only, and the scans read a single projected column.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa


def _rank(n: int, q) -> int:
    """floor((n-1)*q) in EXACT arithmetic (matches SQL decimal math —
    float rounding must not move an on-integer product)."""
    f = Fraction(q) if not isinstance(q, Fraction) else q
    return int((n - 1) * f.numerator // f.denominator)


def exact_quantiles(
    ds,
    col: str,
    qs,
    *,
    n_buckets: int = 2048,
    max_collect: int = 100_000,
    max_passes: int = 10,
):
    """Return ``[(q, value), …]`` — exact rank-selection quantiles of
    ``ds[col]``. ``qs``: floats or Fractions. The input pipeline is
    re-executed once per pass, so pass a cheap (pruned-read) dataset or
    materialize it first when upstream is expensive."""
    from ray.data.aggregate import Count, Max, Min

    ds = ds.select_columns([col])
    stats = ds.aggregate(Min(col), Max(col), Count())
    n = stats["count()"]
    if n == 0:
        raise ValueError("exact_quantiles over an empty dataset")
    lo0, hi0 = stats[f"min({col})"], stats[f"max({col})"]

    # state per rank: (lo, hi, rank_within_interval, in_interval_count)
    ranks = [_rank(n, q) for q in qs]
    state = {i: [float(lo0), float(hi0), r, n] for i, r in enumerate(ranks)}
    resolved: dict[int, float] = {}

    for _ in range(max_passes):
        active = {
            i: s
            for i, s in state.items()
            if i not in resolved and s[3] > max_collect and s[0] < s[1]
        }
        if not active:
            break
        edges = {i: np.linspace(s[0], s[1], n_buckets + 1) for i, s in active.items()}

        def hist(t: pa.Table, _edges=edges, _col=col) -> pa.Table:
            v = t[_col].to_numpy(zero_copy_only=False).astype(np.float64)
            iids, counts = [], []
            for i, e in _edges.items():
                sel = v[(v >= e[0]) & (v <= e[-1])]
                c, _ = np.histogram(sel, bins=e)
                iids.append(i)
                counts.append(c.astype(np.int64))
            return pa.table({"iid": pa.array(iids, pa.int64()), "counts": counts})

        parts = ds.map_batches(hist, batch_format="pyarrow").take_all()
        totals = {i: np.zeros(n_buckets, dtype=np.int64) for i in active}
        for row in parts:
            totals[row["iid"]] += np.asarray(row["counts"])
        for i, s in active.items():
            cum = np.cumsum(totals[i])
            b = int(np.searchsorted(cum, s[2], side="right"))
            before = int(cum[b - 1]) if b > 0 else 0
            e = edges[i]
            new = [float(e[b]), float(e[b + 1]), s[2] - before, int(totals[i][b])]
            if new[0] >= new[1] or new[3] == 0:
                # degenerate float interval — everything left is one value
                resolved[i] = new[0]
            else:
                state[i] = new

    out = []
    for i, q in enumerate(qs):
        if i in resolved:
            out.append((q, resolved[i]))
            continue
        lo, hi, r, _cnt = state[i]

        def collect(t: pa.Table, _lo=lo, _hi=hi, _col=col) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.and_(
                pc.greater_equal(t[_col], _lo), pc.less_equal(t[_col], _hi)
            )
            return t.filter(m)

        rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
        vals = np.sort(np.array([row[col] for row in rows]))
        out.append((q, vals[int(r)]))
    return out


def grouped_exact_quantiles(
    ds,
    group_col: str,
    col: str,
    qs,
    *,
    n_buckets: int = 512,
    max_collect: int = 100_000,
    max_passes: int = 10,
):
    """Exact PER-GROUP rank-selection quantiles without any sort: the
    grouped generalization of :func:`exact_quantiles`. One scan per pass
    refines every (group, rank) interval simultaneously — pass cost is
    one projected read + per-batch histograms for the groups present in
    the batch, and the combined "shuffle" is #blocks × #active-intervals
    count rows to the driver. Returns ``[(group, q, value), …]`` sorted
    by (group, q).

    Scale shape: group count multiplies per-batch histogram work, not
    scan count — 10^12 rows × a few thousand groups is still the same
    2-3 passes. Per-group state on the driver is O(groups × ranks)."""
    from ray.data.aggregate import Count, Max, Min

    ds = ds.select_columns([group_col, col])
    stats = ds.groupby(group_col).aggregate(Min(col), Max(col), Count()).take_all()
    if not stats:
        return []
    qs = list(qs)
    state: dict[tuple, list] = {}
    resolved: dict[tuple, float] = {}
    for row in stats:
        g, n = row[group_col], row["count()"]
        for qi, q in enumerate(qs):
            state[(g, qi)] = [
                float(row[f"min({col})"]),
                float(row[f"max({col})"]),
                _rank(n, q),
                n,
            ]

    for _ in range(max_passes):
        active = {
            k: s
            for k, s in state.items()
            if k not in resolved and s[3] > max_collect and s[0] < s[1]
        }
        if not active:
            break
        by_group: dict = {}
        for (g, qi), s in active.items():
            by_group.setdefault(g, []).append(
                (qi, np.linspace(s[0], s[1], n_buckets + 1))
            )

        def hist(t: pa.Table, _bg=by_group, _g=group_col, _c=col) -> pa.Table:
            gv = t[_g].to_numpy(zero_copy_only=False)
            v = t[_c].to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.argsort(gv, kind="mergesort")
            gv, v = gv[order], v[order]
            bounds = np.flatnonzero(
                np.concatenate([[True], gv[1:] != gv[:-1], [True]])
            )
            out_g, out_q, out_c = [], [], []
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                items = _bg.get(gv[s0])
                if not items:
                    continue
                vg = v[s0:s1]
                for qi, e in items:
                    sel = vg[(vg >= e[0]) & (vg <= e[-1])]
                    c, _ = np.histogram(sel, bins=e)
                    out_g.append(gv[s0])
                    out_q.append(qi)
                    out_c.append(c.astype(np.int64))
            return pa.table(
                {
                    "g": pa.array(out_g),
                    "qi": pa.array(out_q, pa.int64()),
                    "counts": out_c,
                }
            )

        parts = ds.map_batches(hist, batch_format="pyarrow").take_all()
        totals = {k: np.zeros(n_buckets, dtype=np.int64) for k in active}
        for row in parts:
            totals[(row["g"], row["qi"])] += np.asarray(row["counts"])
        for k, s in active.items():
            cum = np.cumsum(totals[k])
            b = int(np.searchsorted(cum, s[2], side="right"))
            before = int(cum[b - 1]) if b > 0 else 0
            e = by_group[k[0]][[qi for qi, _ in by_group[k[0]]].index(k[1])][1]
            new = [float(e[b]), float(e[b + 1]), s[2] - before, int(totals[k][b])]
            if new[0] >= new[1] or new[3] == 0:
                resolved[k] = new[0]
            else:
                state[k] = new

    # final: one scan collects candidates for EVERY unresolved interval
    remaining = [k for k in state if k not in resolved]
    collected: dict[tuple, np.ndarray] = {}
    if remaining:
        span = {}
        for g, qi in remaining:
            lo, hi, _, _ = state[(g, qi)]
            cl, ch = span.get(g, (np.inf, -np.inf))
            span[g] = (min(cl, lo), max(ch, hi))

        def collect(t: pa.Table, _span=span, _g=group_col, _c=col) -> pa.Table:
            gv = t[_g].to_numpy(zero_copy_only=False)
            v = t[_c].to_numpy(zero_copy_only=False)
            keep = np.zeros(len(gv), dtype=bool)
            for g, (lo, hi) in _span.items():
                keep |= (gv == g) & (v >= lo) & (v <= hi)
            return t.filter(pa.array(keep))

        rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
        vals_by_g: dict = {}
        for row in rows:
            vals_by_g.setdefault(row[group_col], []).append(row[col])
        for g, qi in remaining:
            lo, hi, _, _ = state[(g, qi)]
            arr = np.array(vals_by_g.get(g, []))
            collected[(g, qi)] = np.sort(arr[(arr >= lo) & (arr <= hi)])

    out = []
    for g, qi in sorted(state, key=lambda k: (str(k[0]), k[1])):
        k = (g, qi)
        if k in resolved:
            out.append((g, qs[qi], resolved[k]))
        else:
            out.append((g, qs[qi], collected[k][int(state[k][2])]))
    return out
