"""End-to-end web training-data preparation pipeline — the composition
showcase for the round-2 corpus operators:

    raw pages
      → C4-style line-level boilerplate removal   (batch-local, no shuffle)
      → cross-document duplicate-line removal     (2 minimal shuffles)
      → PII redaction                             (pure map, RE2)
      → token-count quality gate                  (pure map)
      → deterministic train/val/test assignment   (pure map)

Every step is individually DuckDB-oracled elsewhere; the composition is
oracled END-TO-END too (one CTE chain over the same fixture), so the
whole pipeline is value-hash-checked, not just its parts.

Scale shape: the only shuffles are line-dedup's winner election (rows =
distinct lines per block, map-side combined) and its bucketed
reassembly. Everything else streams. Output is ready to feed
``pack_token_stream`` / ``write_parquet(partition_cols=['split'])``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.hashing import split_assign, split_sql_case
from ..stages.linededup import dedup_lines
from ..stages.scrub import (
    EMAIL_RE,
    IP_RE,
    MIN_LINE_TOKENS,
    PHONE_RE,
    TERMINAL_RE,
    TOKEN_RE,
    drop_boilerplate_batch,
    redact_pii_batch,
)

MIN_DOC_TOKENS = 20  # quality gate after scrubbing


def run_web_prep(ds) -> "ray.data.Dataset":  # noqa: F821
    """(page_id, raw_text) → (page_id, n_tokens, split, text)."""
    bp = ds.map_batches(
        drop_boilerplate_batch, batch_format="pyarrow"
    ).select_columns(["page_id", "clean_text"])
    dd = dedup_lines(bp, id_col="page_id", text_col="clean_text")
    red = dd.select_columns(["page_id", "clean_text"]).map_batches(
        lambda t: redact_pii_batch(t, text_col="clean_text"),
        batch_format="pyarrow",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["clean_text"].str.lower().str.count(TOKEN_RE).astype("int64")
        out = pd.DataFrame(
            {
                "page_id": df["page_id"],
                "n_tokens": n,
                "split": split_assign(df["page_id"]),
                "text": df["clean_text"],
            }
        )
        return out[n.to_numpy() >= MIN_DOC_TOKENS]

    return red.map_batches(finish, batch_format="pandas")


def web_prep_oracle_sql(parquet_path: str) -> str:
    """The end-to-end DuckDB oracle: same five steps as one CTE chain."""
    pred = (
        f"len(regexp_extract_all(lower(l), '{TOKEN_RE}')) >= {MIN_LINE_TOKENS} "
        f"AND regexp_matches(trim(l, ' '), '{TERMINAL_RE}') "
        "AND NOT contains(lower(l), 'cookie') "
        "AND NOT contains(lower(l), 'javascript')"
    )
    return f"""
WITH bp AS (
  SELECT page_id,
         array_to_string(list_filter(string_split(raw_text, chr(10)),
                                     l -> {pred}), chr(10)) AS t1
  FROM read_parquet('{parquet_path}')
),
e AS (
  SELECT page_id, s.idx - 1 AS line_idx, s.line AS line
  FROM (SELECT page_id,
               unnest(list_transform(string_split(t1, chr(10)),
                                     (x, i) -> struct_pack(idx := i, line := x))) AS s
        FROM bp)
),
k AS (SELECT page_id, line_idx, line FROM e
      QUALIFY row_number() OVER (PARTITION BY line ORDER BY page_id, line_idx) = 1),
dd AS (
  SELECT bp.page_id, coalesce(a.t2, '') AS t2
  FROM bp LEFT JOIN (SELECT page_id,
                            string_agg(line, chr(10) ORDER BY line_idx) AS t2
                     FROM k GROUP BY page_id) a USING (page_id)
),
red AS (
  SELECT page_id,
         regexp_replace(regexp_replace(regexp_replace(t2,
             '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
             '{IP_RE}', '<IP>', 'g') AS text
  FROM dd
),
tok AS (SELECT page_id, text,
               len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens
        FROM red)
SELECT page_id, n_tokens, {split_sql_case('page_id')} AS split, text
FROM tok WHERE n_tokens >= {MIN_DOC_TOKENS}
"""


def write_web_prep(ds, out_dir: str) -> dict:
    """Persist prepared training data as split-partitioned parquet
    (``out_dir/split=train/...`` etc.) — the resumable-output layout: a
    re-run targets a fresh directory and a failed run's partial output is
    inspectable per partition; consumers read one split with partition
    pruning (``read_parquet(out_dir, filter=...)`` never touches the
    other splits' files). Returns per-split row counts."""
    from ray.data.aggregate import Count

    ds = ds.materialize()
    ds.write_parquet(out_dir, partition_cols=["split"])
    counts = ds.groupby("split").aggregate(Count()).take_all()
    return {r["split"]: int(r["count()"]) for r in counts}
