"""Configurable field-level survivorship — the general form of the
golden-record merge rules hard-coded in ``golden.py``.

MDM survivorship decides, per output field, WHICH member of an entity
group contributes the surviving value (reference analog: the merge step
of ``/root/reference/python/db_backup/cb_backup.py:45`` picks one doc
per key; here the policy is declarative and per-field). Rules:

- ``count``                    — group size
- ``sum`` / ``max`` / ``min``  — plain aggregates of ``col``
- ``latest`` / ``earliest``    — value of ``emit`` from the row with
  max/min ``by``; ties broken by ascending ``tiebreak``
- ``majority``                 — modal value of ``col``; count ties
  broken by the lexicographically smallest value
- ``priority``                 — value of ``emit`` from the row whose
  ``col`` appears EARLIEST in ``ranking`` (unlisted values rank last);
  rank ties broken by ascending ``tiebreak``

Execution is the one-shuffle bucketed-groupby pattern (``stages/util.py::
bucketed_map_groups``): rows are hash-bucketed by the entity key, each
bucket is resolved with vectorized pandas (one stable sort +
``drop_duplicates`` per positional rule — no per-group Python loop), so
driver/Python overhead is O(buckets) and the shuffle moves only the
columns the rules reference. At web scale the caller projects columns
before this stage (same principle as ``golden.py`` reducing ``text`` to
``text_len`` pre-shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .util import DEFAULT_BUCKETS, bucketed_map_groups


@dataclass(frozen=True)
class Rule:
    """One survivorship output field. ``emit`` defaults to ``col`` (the
    column whose value the winning row contributes)."""

    out: str
    kind: str  # count | sum | max | min | latest | earliest | majority | priority
    col: str | None = None
    by: str | None = None
    tiebreak: str | None = None
    ranking: tuple[str, ...] | None = None
    emit: str | None = None

    def __post_init__(self):
        kinds = {"count", "sum", "max", "min", "latest", "earliest",
                 "majority", "priority"}
        if self.kind not in kinds:
            raise ValueError(f"unknown survivorship rule kind {self.kind!r}")
        if self.kind != "count" and self.col is None:
            raise ValueError(f"rule {self.out!r}: col is required for {self.kind}")
        if self.kind in ("latest", "earliest") and self.by is None:
            raise ValueError(f"rule {self.out!r}: by is required for {self.kind}")
        if self.kind == "priority" and not self.ranking:
            raise ValueError(f"rule {self.out!r}: ranking is required for priority")


def _winner_values(df: pd.DataFrame, key: str, sort_cols: list[str],
                   ascending: list[bool], emit: str) -> pd.Series:
    """Stable-sort once, keep each key's first row, return emit indexed by key."""
    s = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
    top = s.drop_duplicates(subset=[key], keep="first")
    return pd.Series(top[emit].to_numpy(), index=top[key].to_numpy())


def resolve_bucket(df: pd.DataFrame, key: str, rules: list[Rule]) -> pd.DataFrame:
    """Vectorized survivorship over one hash bucket (many whole groups)."""
    cols = [key] + [r.out for r in rules]
    if df.empty:
        return pd.DataFrame(columns=cols)
    g = df.groupby(key, sort=False)
    idx = g.size().index
    out = {key: idx.to_numpy()}
    for r in rules:
        if r.kind == "count":
            vals = g.size().reindex(idx).to_numpy().astype("int64")
        elif r.kind in ("sum", "max", "min"):
            vals = getattr(g[r.col], r.kind)().reindex(idx).to_numpy()
        elif r.kind in ("latest", "earliest"):
            tb = [r.tiebreak] if r.tiebreak else []
            win = _winner_values(
                df, key, [r.by] + tb,
                [r.kind == "earliest"] + [True] * len(tb),
                r.emit or r.col,
            )
            vals = win.reindex(idx).to_numpy()
        elif r.kind == "majority":
            counts = (
                df.groupby([key, r.col], sort=False).size().reset_index(name="_n")
            )
            win = _winner_values(counts, key, ["_n", r.col], [False, True], r.col)
            vals = win.reindex(idx).to_numpy()
        else:  # priority
            rank_of = {v: i for i, v in enumerate(r.ranking)}
            d = df[[key, r.col, r.emit or r.col]
                   if (r.emit and r.emit != r.col) else [key, r.col]].copy()
            if r.tiebreak:
                d[r.tiebreak] = df[r.tiebreak].to_numpy()
            d["_rank"] = (
                df[r.col].map(rank_of).fillna(len(r.ranking)).to_numpy(dtype=np.int64)
            )
            tb = [r.tiebreak] if r.tiebreak else []
            win = _winner_values(
                d, key, ["_rank"] + tb, [True] * (1 + len(tb)), r.emit or r.col
            )
            vals = win.reindex(idx).to_numpy()
        out[r.out] = vals
    return pd.DataFrame(out)[cols].reset_index(drop=True)


def survivorship(ds, key: str, rules: list[Rule],
                 *, n_buckets: int = DEFAULT_BUCKETS):
    """Apply field-level survivorship rules per entity group.

    One bucketed shuffle on ``key``; each bucket resolves all its groups
    with vectorized pandas. Returns one row per distinct key with columns
    ``[key] + [r.out for r in rules]``.
    """
    rules = list(rules)
    seen: set[str] = set()
    for r in rules:
        if r.out in seen or r.out == key:
            raise ValueError(f"duplicate survivorship output column {r.out!r}")
        seen.add(r.out)
    return bucketed_map_groups(
        ds, key, lambda df: resolve_bucket(df, key, rules), n_buckets=n_buckets
    )
