"""Sequence packing for training-data assembly: assign every document a
context-window bin id by its position in the concatenated token stream
(GPT-style concat-then-chunk, at document granularity).

``bin_id = (exclusive prefix sum of n_tokens, in doc_id order) // budget``

The interesting part at scale is the EXACT distributed prefix sum:

  1. per-batch partial: (range_bucket = doc_id // group_size) → token
     sums (map-side combine);
  2. tiny groupby over buckets → driver computes exclusive per-bucket
     offsets (one int per bucket — broadcastable at any corpus size);
  3. one bucketed pass: sort within bucket by doc_id, local cumsum +
     bucket offset → global offset, integer-divide by the budget.

No global sort, no all-to-all beyond the per-bucket stitch; results are
bit-identical to a single-process window scan (the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import bucketed_map_groups

TOKEN_RE = r"[a-z0-9]+"


def pack_token_stream(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    group_size: int = 1 << 14,
):
    """→ (doc_id, n_tokens, bin_id). ``group_size``: doc_ids per range
    bucket; the driver holds one offset per bucket (corpus_size /
    group_size ints)."""
    from .util import grouped_agg

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        n = (
            df[text_col]
            .str.lower()
            .str.count(TOKEN_RE)
            .astype("int64")
        )
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_tokens": n,
                "bucket": (df[id_col] // group_size).astype("int64"),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False)["n_tokens"].sum()

    sums = grouped_agg(
        counted.select_columns(["bucket", "n_tokens"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["bucket"],
        {"tok": ("n_tokens", "sum")},
    ).take_all()
    sums.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    run = 0
    for r in sums:
        offsets[r["bucket"]] = run
        run += r["tok"]

    def place(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, g in df.groupby("bucket", sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            excl = g["n_tokens"].cumsum().shift(fill_value=0) + offsets[int(b)]
            out.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "n_tokens": g["n_tokens"].to_numpy(),
                        "bin_id": (excl // budget).astype("int64").to_numpy(),
                    }
                )
            )
        cols = [id_col, "n_tokens", "bin_id"]
        if not out:
            return pd.DataFrame(columns=cols).astype("int64")
        return pd.concat(out)[cols]

    return bucketed_map_groups(counted, "bucket", place)
