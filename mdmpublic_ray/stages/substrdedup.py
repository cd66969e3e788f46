"""Exact-substring (k-token window) duplicate-span detection and removal.

The ExactSubstr family from "Deduplicating Training Data Makes Language
Models Better" (Lee et al., 2022): find token windows that recur across
the corpus and cut every occurrence but one canonical winner. The paper
builds a corpus-wide suffix array; that structure is inherently
single-address-space, so the distributed re-expression here is the
standard k-gram factorization — every duplicated substring of length
>= k is exactly the union of its duplicated k-windows, so removing the
merged duplicated-window spans removes every cross-doc repeated passage
of length >= k (windows shorter than k are below the detection floor by
construction, same as the paper's length threshold).

Reference analog: the manifest dedup in s3sync.sh:47-51 dedupes whole
artifacts by key; this stage dedupes *spans inside* documents — the
training-data cleaning step the brief lists as first-class.

Distributed shape (no suffix array, no broadcast):
  1. map: tokenize each doc, hash every k-window with a vectorized
     64-bit polynomial over per-token crc32s (two independent 32-bit
     lanes -> one uint64; the per-window loop is over k, not rows);
  2. one bucketed groupby on the window hash: per hash, count distinct
     docs / occurrences and pick the global winner (min (doc_id, pos));
  3. one bucketed groupby on doc_id: merge loser windows [pos, pos+k)
     into maximal spans, cut them from the token stream.
Everything that moves is (uint64, doc_id, int32) triples — never text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_array
from .util import bucketed_join, bucketed_map_groups

# Two odd multipliers give two independent 32-bit mixing lanes; stacked
# into one uint64 the k-window collision rate is ~2^-64 per pair.
_MUL_LO = np.uint64(0x9E3779B1)
_MUL_HI = np.uint64(0x85EBCA77)


def _window_hashes(tok_hash: np.ndarray, starts: np.ndarray, k: int) -> np.ndarray:
    """uint64 hash of each k-window ``tok_hash[s:s+k]`` (vectorized over
    windows; the only Python loop is the k taps)."""
    h_lo = np.zeros(len(starts), dtype=np.uint64)
    h_hi = np.zeros(len(starts), dtype=np.uint64)
    t = tok_hash.astype(np.uint64)
    for j in range(k):
        v = t[starts + j]
        h_lo = h_lo * _MUL_LO + v
        h_hi = h_hi * _MUL_HI + (v ^ np.uint64(0xA5A5A5A5))
    return (h_lo << np.uint64(32)) ^ (h_hi & np.uint64(0xFFFFFFFF)) ^ (h_lo >> np.uint64(32))


def _doc_windows(
    doc_ids: np.ndarray, token_lists: list[list[str]], k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch of token lists into (doc_id, pos, window_hash)
    arrays. Docs shorter than k tokens contribute no windows."""
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
    flat: list[str] = [tok for toks in token_lists for tok in toks]
    if not flat:
        e = np.array([], dtype=np.int64)
        return e, e.astype(np.int32), np.array([], dtype=np.uint64)
    tok_hash = crc32_array(flat)
    n_win = np.maximum(lens - k + 1, 0)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # window start index (flat) and position-within-doc for every window
    doc_rep = np.repeat(np.arange(len(lens)), n_win)
    pos = np.concatenate([np.arange(w) for w in n_win]) if len(doc_rep) else np.array([], dtype=np.int64)
    starts = offsets[doc_rep] + pos
    ghash = _window_hashes(tok_hash, starts.astype(np.int64), k)
    return doc_ids[doc_rep], pos.astype(np.int32), ghash


def dup_ngram_stats(ds, *, k: int = 8, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document duplicated-window statistics: how many of a doc's
    k-token windows recur in at least one OTHER document. The detection
    pass of ExactSubstr, exposed as an oracle-checkable table
    ``(doc_id, n_windows, n_dup_windows)``.

    Grams shuffle as strings (not hashes) so the result is exactly
    SQL-provable; the map side collapses each batch to distinct
    (gram, doc) partial counts first, so the exchange is bounded by the
    batch vocabulary, not the token count. At corpus scale swap the gram
    string for the 64-bit hash (``strip_dup_spans`` does) — same shape,
    ~10x fewer bytes."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(r"[a-z0-9]+")
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        totals = pd.DataFrame(
            {
                id_col: df[id_col].astype("int64").to_numpy(),
                "gram": "",  # sentinel: per-doc total row
                "n": np.maximum(n_tok - k + 1, 0),
            }
        )
        ex = pd.DataFrame({id_col: df[id_col].astype("int64"), "tok": toks}).explode(
            "tok"
        )
        ex = ex.dropna(subset=["tok"]).reset_index(drop=True)
        if len(ex):
            # the docs_top_bigrams grouped-shift idiom generalized to k
            # taps: gram construction is C-level pandas, no row loop
            s = ex["tok"]
            ids = ex[id_col]
            gram = s
            for j in range(1, k):
                gram = gram + " " + s.groupby(ids).shift(-j)
            keep = gram.notna()
            cnt = (
                pd.DataFrame({id_col: ids[keep], "gram": gram[keep]})
                .groupby([id_col, "gram"], sort=False)
                .size()
                .reset_index(name="n")
            )
            cnt["n"] = cnt["n"].astype("int64")
        else:
            cnt = pd.DataFrame(
                {
                    id_col: pd.array([], dtype="int64"),
                    "gram": pd.array([], dtype=object),
                    "n": pd.array([], dtype="int64"),
                }
            )
        return pd.concat([cnt, totals], ignore_index=True)

    parts = ds.map_batches(partials, batch_format="pandas")

    def per_gram(df: pd.DataFrame) -> pd.DataFrame:
        sent = df["gram"] == ""
        totals = df[sent][[id_col, "n"]].groupby(id_col, as_index=False).sum()
        totals = totals.rename(columns={"n": "n_windows"})
        totals["n_dup_windows"] = np.int64(0)
        g = df[~sent]
        if len(g):
            nd = g.groupby("gram")[id_col].transform("nunique")
            dup = g[nd >= 2][[id_col, "n"]].groupby(id_col, as_index=False).sum()
            dup = dup.rename(columns={"n": "n_dup_windows"})
            dup["n_windows"] = np.int64(0)
        else:
            dup = pd.DataFrame(columns=[id_col, "n_dup_windows", "n_windows"])
        out = pd.concat([totals, dup], ignore_index=True)
        out[id_col] = out[id_col].astype("int64")
        out["n_windows"] = out["n_windows"].astype("int64")
        out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
        return out[[id_col, "n_windows", "n_dup_windows"]]

    per = bucketed_map_groups(parts, "gram", per_gram)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).agg(
            n_windows=("n_windows", "sum"), n_dup_windows=("n_dup_windows", "sum")
        )
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return g

    return bucketed_map_groups(per, id_col, per_doc)


def sql_dup_ngram_stats(k: int = 8) -> str:
    """DuckDB oracle for :func:`dup_ngram_stats` (positional
    list_transform k-gram construction, the docs_top_bigrams idiom)."""
    gram = " || ' ' || ".join(
        "l[i]" if j == 0 else f"l[i+{j}]" for j in range(k)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents),
w AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(l) - {k} + 1),
                               i -> {gram})) AS gram
  FROM toks WHERE len(l) >= {k}),
dupg AS (
  SELECT gram FROM w GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
dup AS (
  SELECT doc_id, COUNT(*) AS n_dup FROM w
  WHERE gram IN (SELECT gram FROM dupg) GROUP BY doc_id)
SELECT t.doc_id,
       CAST(greatest(len(t.l) - {k} + 1, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_windows
FROM toks t LEFT JOIN dup d USING (doc_id)
"""


def strip_dup_spans(
    ds,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
):
    """ExactSubstr REMOVAL: cut every duplicated k-token span from all
    but one canonical occurrence (global winner = smallest (doc_id, pos),
    so exactly one copy of each repeated passage survives, the paper's
    "keep one" policy made deterministic). Overlapping duplicated windows
    merge into maximal spans before cutting, so a repeated 40-token
    paragraph is removed as one span, not 33 window fragments.

    Tokenization is whitespace ``str.split()`` and the cleaned text is
    re-joined with single spaces — token-faithful, whitespace-normalizing
    (the trade every token-level span cutter makes). ``min_count`` is the
    paper's occurrence threshold; occurrences count per-position, so a
    phrase repeated twice INSIDE one doc is deduped too.

    Returns ``(doc_id, text, n_tokens_removed)`` — one row per input doc.
    Wire shape: only (uint64 hash, doc_id, int32 pos) triples and the
    final span lists move; document text crosses one bucketed join at
    the end, untouched until the cut.
    """

    def emit_windows(df: pd.DataFrame) -> pd.DataFrame:
        toks = [s.split() for s in df[text_col].tolist()]
        dids, pos, ghash = _doc_windows(df[id_col].to_numpy(np.int64), toks, k)
        return pd.DataFrame({"ghash": ghash, id_col: dids.astype("int64"), "pos": pos})

    wins = ds.map_batches(emit_windows, batch_format="pandas")

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        # per hash: keep occurrences only for hashes seen >= min_count
        # times; drop the single winner (min doc_id, then min pos)
        cnt = df.groupby("ghash")["pos"].transform("size")
        d = df[cnt >= min_count]
        if not len(d):
            return pd.DataFrame(
                {id_col: pd.array([], dtype="int64"), "pos": pd.array([], dtype="int32")}
            )
        # winner = first occurrence in (doc_id, pos) order; all later
        # occurrences of the hash are losers
        d = d.sort_values(["ghash", id_col, "pos"], kind="stable")
        keep_mask = d.groupby("ghash").cumcount() > 0
        out = d[keep_mask][[id_col, "pos"]].copy()
        out[id_col] = out[id_col].astype("int64")
        out["pos"] = out["pos"].astype("int32")
        return out

    lose = bucketed_map_groups(wins, "ghash", losers)

    def spans_per_doc(df: pd.DataFrame) -> pd.DataFrame:
        # spans are encoded "start:end,start:end" — a plain string rides
        # the bucketed join untouched (a Python-list column would be
        # re-typed by the join's unified-schema step)
        rows_id: list[int] = []
        rows_spans: list[str] = []
        for did, g in df.groupby(id_col, sort=False):
            p = np.sort(g["pos"].to_numpy(np.int64))
            # merge [p, p+k) intervals into maximal spans
            starts = [int(p[0])]
            ends = [int(p[0]) + k]
            for x in p[1:]:
                x = int(x)
                if x <= ends[-1]:
                    ends[-1] = max(ends[-1], x + k)
                else:
                    starts.append(x)
                    ends.append(x + k)
            rows_id.append(int(did))
            rows_spans.append(",".join(f"{s}:{e}" for s, e in zip(starts, ends)))
        # return ARROW, not pandas: an EMPTY bucket's object column would
        # convert to Arrow null type, and the downstream join's schema
        # inference can sample exactly that block
        return pa.table(
            {
                id_col: pa.array(rows_id, pa.int64()),
                "spans": pa.array(rows_spans, pa.string()),
            }
        )

    spans = bucketed_map_groups(lose, id_col, spans_per_doc)

    # pin the schema block-by-block: the groupby's empty partitions emit
    # schema-less bundles, and Ray's schema inference can sample exactly
    # those — reporting `spans` as null and poisoning the join's unified
    # schema (nulls built with null type crash pa.Table.join)
    span_schema = pa.schema([(id_col, pa.int64()), ("spans", pa.string())])

    def pin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return span_schema.empty_table()
        return t if t.schema.equals(span_schema) else t.cast(span_schema)

    spans = spans.map_batches(pin, batch_format="pyarrow")

    # a corpus with NO duplicated spans yields a zero-row dataset, and
    # zero-row Ray datasets lose their schema (engine-wide trap, see
    # er_incremental._to_pandas) — short-circuit to the no-op transform
    sschema = spans.schema()
    if sschema is None or "spans" not in sschema.names:

        def norm(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    id_col: df[id_col].astype("int64").to_numpy(),
                    text_col: [" ".join(s.split()) for s in df[text_col].tolist()],
                    "n_tokens_removed": np.zeros(len(df), dtype=np.int64),
                }
            )

        return ds.map_batches(norm, batch_format="pandas")

    joined = bucketed_join(ds, spans, id_col, id_col, how="left")

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].tolist()
        span_col = df["spans"].tolist()
        out_text: list[str] = []
        out_removed = np.zeros(len(texts), dtype=np.int64)
        for i, (txt, sp) in enumerate(zip(texts, span_col)):
            if sp is None or pd.isna(sp) or sp == "":
                out_text.append(" ".join(txt.split()))
                continue
            toks = txt.split()
            keep = np.ones(len(toks), dtype=bool)
            for part in sp.split(","):
                s, e = part.split(":")
                keep[int(s) : int(e)] = False
            out_removed[i] = int((~keep).sum())
            out_text.append(" ".join(t for t, kp in zip(toks, keep) if kp))
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64").to_numpy(),
                text_col: out_text,
                "n_tokens_removed": out_removed,
            }
        )

    return joined.map_batches(cut, batch_format="pandas")
