"""Cross-document duplicate-line removal (MassiveText/C4-style
inter-document boilerplate dedup).

Rule (pinned): a line VALUE is kept only at its globally-first
occurrence — the (page_id, line_idx) lexicographic minimum over every
occurrence in the corpus (duplicate lines inside one page collapse to
the first too). Every other occurrence is dropped; pages are reassembled
with surviving lines in original order.

Scale shape — two shuffles, both minimal:

  1. winner election: explode to (line, packed_pos) BATCH-LOCALLY,
     pre-min per batch (map-side combine), then ``groupby(line).min``
     — the shuffle carries one row per distinct line per block, not one
     row per occurrence;
  2. reassembly: the winner rows ARE the kept lines (no join back!),
     hash-bucketed by page_id and stitched with a vectorized pandas
     groupby. Page presence is guaranteed by tiny marker rows so pages
     whose every line lost still emit an empty clean_text.

``packed_pos = page_id * 2^20 + line_idx`` makes int64 Min equal to the
lexicographic (page_id, line_idx) order (line_idx < 2^20 per page).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .util import bucketed_map_groups

_IDX_BITS = 20
_IDX_CAP = 1 << _IDX_BITS


def _explode_min_batch(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Batch-local explode + per-line min(packed_pos) combine."""
    lines = pc.split_pattern(t[text_col], pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = pc.list_flatten(lines).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n_per = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    if len(n_per) and int(n_per.max()) >= _IDX_CAP:
        raise ValueError(f"a page has >= 2^{_IDX_BITS} lines")
    # line_idx within each page: position - first position of the parent
    starts = np.zeros(len(n_per) + 1, dtype=np.int64)
    np.cumsum(n_per, out=starts[1:])
    idx = np.arange(len(flat), dtype=np.int64) - starts[parents]
    pids = t[id_col].to_numpy(zero_copy_only=False)[parents]
    packed = pids * _IDX_CAP + idx
    df = pd.DataFrame({"line": flat, "packed": packed})
    m = df.groupby("line", sort=False, as_index=False)["packed"].min()
    return pa.table(
        {"line": pa.array(m["line"], pa.string()), "packed": pa.array(m["packed"], pa.int64())}
    )


def dedup_lines(ds, *, id_col: str = "page_id", text_col: str = "raw_text", n_buckets: int = 64):
    """→ (page_id, n_kept, clean_text) with only globally-first line
    occurrences surviving. See module docstring for the physical plan."""
    from .util import grouped_agg

    winners = grouped_agg(
        ds.map_batches(
            lambda t: _explode_min_batch(t, id_col, text_col), batch_format="pyarrow"
        ),
        ["line"],
        {"packed": ("packed", "min")},
        n_buckets=n_buckets,
    )

    def unpack(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "page_id": pa.array(packed // _IDX_CAP, pa.int64()),
                "line_idx": pa.array(packed % _IDX_CAP, pa.int64()),
                "line": t["line"],
            }
        )

    kept = winners.map_batches(unpack, batch_format="pyarrow")

    # marker row per page (line_idx = -1) so empty pages still emit
    markers = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table(
            {
                "page_id": pc.cast(t[id_col], pa.int64()),
                "line_idx": pa.array([-1] * len(t), pa.int64()),
                "line": pa.array([""] * len(t), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["page_id", "line_idx"], kind="mergesort")
        real = df[df["line_idx"] >= 0]
        g = real.groupby("page_id", sort=False)["line"]
        joined = g.agg("\n".join)
        counts = g.size()
        pages = df["page_id"].unique()
        out = pd.DataFrame({"page_id": pages})
        out["n_kept"] = counts.reindex(pages).fillna(0).astype("int64").to_numpy()
        out["clean_text"] = joined.reindex(pages).fillna("").to_numpy()
        return out

    return bucketed_map_groups(kept.union(markers), "page_id", assemble, n_buckets=n_buckets)
