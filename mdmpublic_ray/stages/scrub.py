"""Corpus scrubbing operators: PII redaction and C4-style line-level
boilerplate removal.

Both are pure per-batch map stages (no shuffle anywhere): the line
explode/implode in ``drop_boilerplate_batch`` stays inside one batch, so
the operator streams at any corpus size. All regex work is RE2 via
pyarrow.compute kernels — the same engine DuckDB's regexp_* functions
use, which is what makes the oracles hash-match bit-for-bit.

Ancestry: the reference scrubs/normalizes text streams line-by-line with
sed/grep pipelines (e.g. /root/reference/jenkins_scripts/report/
ssh_login_report.sh:97-110 drops noise lines before parsing); the C4
line rules follow Raffel et al. 2020 (public).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Pinned PII patterns (RE2 on both sides; order matters for replacement).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

PII_PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IP_RE, "<IP>"),
)

# C4-style line-keep rule (pinned): ≥5 tokens, terminal punctuation,
# no cookie/javascript boilerplate markers.
MIN_LINE_TOKENS = 5
TOKEN_RE = r"[a-z0-9]+"
TERMINAL_RE = r'[.!?"]$'
_BAD_MARKERS = ("cookie", "javascript")


def redact_pii_batch(t: pa.Table, text_col: str = "raw_text") -> pa.Table:
    """Count (on the original text) and redact (sequentially) PII spans.

    Output adds int64 ``n_email``/``n_phone``/``n_ip`` and ``clean_text``.
    """
    s = t[text_col]
    cols = {n: t[n] for n in t.column_names if n != text_col}
    clean = s
    for name, pat, rep in PII_PATTERNS:
        cols["n_" + name] = pc.cast(pc.count_substring_regex(s, pat), pa.int64())
        clean = pc.replace_substring_regex(clean, pat, rep)
    cols["clean_text"] = clean
    return pa.table(cols)


def _keep_mask(flat: pa.Array) -> pa.Array:
    low = pc.utf8_lower(flat)
    n_tok = pc.count_substring_regex(low, TOKEN_RE)
    keep = pc.greater_equal(n_tok, MIN_LINE_TOKENS)
    keep = pc.and_(keep, pc.match_substring_regex(pc.utf8_trim(flat, " "), TERMINAL_RE))
    for marker in _BAD_MARKERS:
        keep = pc.and_(keep, pc.invert(pc.match_substring(low, marker)))
    return keep


def drop_boilerplate_batch(
    t: pa.Table, id_col: str = "page_id", text_col: str = "raw_text"
) -> pa.Table:
    """Line-level boilerplate filter: split → vectorized keep-rule →
    rejoin, all inside the batch. Output: (id, n_lines, n_kept,
    clean_text) with dropped lines removed and order preserved."""
    lines = pc.split_pattern(t[text_col], pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n_lines = pc.cast(pc.list_value_length(lines), pa.int64())
    flat = pc.list_flatten(lines)
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    keep = _keep_mask(flat).to_numpy(zero_copy_only=False)

    n = len(t)
    n_kept = np.bincount(parents[keep], minlength=n).astype(np.int64)
    kept_lines = pd.Series(flat.to_numpy(zero_copy_only=False)[keep])
    joined = kept_lines.groupby(parents[keep]).agg("\n".join)
    clean = np.full(n, "", dtype=object)
    clean[joined.index.to_numpy()] = joined.to_numpy()
    return pa.table(
        {
            id_col: t[id_col],
            "n_lines": n_lines,
            "n_kept": pa.array(n_kept, pa.int64()),
            "clean_text": pa.array(clean, pa.string()),
        }
    )
