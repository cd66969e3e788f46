"""Text canonicalization / tokenization / similarity kernels.

Reference ancestry (SURVEY.md §2.8): whitespace collapse
(``python/tcp_port_scan/tcp_port_scan.py:49-51``), comment/blank stripping
(``tcp_port_scan.py:18-35``), regex extraction
(``diagnostic_jenkinsjob_slow.py:25-26``). The similarity functions
(token-Jaccard, Jaro-Winkler) are the pairwise scorers of the target
engine (BASELINE.json north_star).

Tokenization is pinned to the regex ``[a-z0-9]+`` over the lowercased
string so the DuckDB oracle can reproduce it exactly with
``regexp_extract_all(lower(text), '[a-z0-9]+')``.
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"[a-z0-9]+")
_WS_RE = re.compile(r"\s+")

# Small fixed stopword list (order matters nowhere; membership only).
STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)


def normalize_ws(s: str) -> str:
    """Collapse runs of whitespace to single spaces and strip ends
    (tcp_port_scan.py:49-51 semantics)."""
    return _WS_RE.sub(" ", s).strip()


def tokens(s: str) -> list[str]:
    """Lowercased alphanumeric tokens — the engine-wide tokenizer."""
    return TOKEN_RE.findall(s.lower())


def tokens_hashed_arrow(texts):
    """Batch tokenizer + hasher for an Arrow string column.

    Returns ``(tok_list, th, toff)``: the per-row nonempty token lists as
    a ``pa.ListArray`` (same tokens as ``tokens()`` row-by-row —
    ``findall('[a-z0-9]+')`` ≡ regex-split on ``[^a-z0-9]+`` minus empty
    fragments), flat uint64 token hashes (``hashing.hash_utf8_flat`` over
    the column's own values buffer — zero per-row Python), and int64
    row offsets. This is the front door for every similarity stage
    (features, MinHash dedup, token/shingle joins): tokenize with Arrow
    kernels, hash with numpy, never loop rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from . import hashing as H

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    lst = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), "[^a-z0-9]+"
    )
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    raw_off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lst.flatten().cast(pa.large_utf8())
    # string values buffer + per-token byte offsets, adjusted for slices
    voff = np.frombuffer(flat.buffers()[1], dtype=np.int64)[
        flat.offset : flat.offset + len(flat) + 1
    ]
    vals = np.frombuffer(flat.buffers()[2] or b"", dtype=np.uint8)
    h_all = H.hash_utf8_flat(vals, voff)
    blens = voff[1:] - voff[:-1]
    keep = blens > 0  # split() emits empty fragments at run boundaries
    th = h_all[keep]
    row_lens = raw_off[1:] - raw_off[:-1]
    rows = np.repeat(np.arange(n, dtype=np.int64), row_lens)[keep]
    toff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=toff[1:])
    kept = flat.filter(pa.array(keep))
    if toff[-1] < 2**31:
        tok_list = pa.ListArray.from_arrays(
            pa.array(toff, pa.int32()), kept.cast(pa.utf8())
        )
    else:
        tok_list = pa.LargeListArray.from_arrays(pa.array(toff, pa.int64()), kept)
    return tok_list, th, toff


def token_set(s: str) -> frozenset[str]:
    return frozenset(tokens(s))


def jaccard(a: frozenset | set, b: frozenset | set) -> float:
    """Token-set Jaccard similarity."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def ngram_set(s: str, n: int = 3) -> frozenset[str]:
    """Character n-grams of the whitespace-normalized lowercase string."""
    t = normalize_ws(s.lower())
    if len(t) < n:
        return frozenset([t]) if t else frozenset()
    return frozenset(t[i : i + n] for i in range(len(t) - n + 1))


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity (standard definition)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler: Jaro boosted by up to 4 chars of common prefix."""
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def _encode_u32(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Codepoint matrix (n × max_len, zero-padded) + length vector."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    width = max(int(lens.max()) if n else 0, 1)
    mat = np.zeros((n, width), dtype=np.uint32)
    if n:
        # one C-level encode of the concatenation, then a vectorized
        # scatter — ~10× cheaper than per-string encode+frombuffer
        flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
        cols = np.arange(width)
        mask = cols < lens[:, None]
        take = (np.cumsum(lens) - lens)[:, None] + cols
        mat[mask] = flat[take[mask]]
    return mat, lens


def encode_flat_u32_arrow(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array → (flat u32 codepoints, int64 offsets[n+1]).

    ONE C-level UTF-8→UTF-32 transcode of the whole values buffer —
    no per-row Python string objects (the encode-once path demanded by
    the round-2 review of ``stages/scoring.py``). Codepoint offsets are
    the cumsum of ``pc.utf8_length`` (byte offsets ≠ codepoint offsets
    for non-ASCII). Nulls encode as empty strings.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    n = len(col)
    lens = np.zeros(n, dtype=np.int64) if n == 0 else (
        pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    if n == 0 or offs[-1] == 0:
        return np.zeros(0, dtype=np.uint32), offs
    # StringArray buffers: [validity, int32 byte offsets, utf8 data];
    # slice the byte range this (possibly sliced) array covers.
    boffs = np.frombuffer(col.buffers()[1], dtype=np.int32)
    lo, hi = int(boffs[col.offset]), int(boffs[col.offset + n])
    raw = col.buffers()[2].to_pybytes()[lo:hi]
    flat = np.frombuffer(raw.decode("utf-8").encode("utf-32-le"), dtype=np.uint32)
    return flat, offs


def _gather_pad_u32(
    flat: np.ndarray, offs: np.ndarray, ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Rows ``ids`` of a flat u32 encoding → (zero-padded matrix, lens) —
    the same clamped-gather trick as ``scoring.pad_sketch_column``."""
    lens = offs[ids + 1] - offs[ids]
    w = max(int(lens.max()) if ids.size else 0, 1)
    cols = np.arange(w)
    if flat.size == 0:
        return np.zeros((ids.size, w), dtype=np.uint32), lens
    take = offs[ids][:, None] + cols
    np.minimum(take, flat.size - 1, out=take)
    mat = flat[take]
    np.copyto(mat, np.uint32(0), where=cols >= lens[:, None])
    return mat, lens


def jaro_winkler_coded(
    flat: np.ndarray,
    offs: np.ndarray,
    ca: np.ndarray,
    cb: np.ndarray,
    prefix_weight: float = 0.1,
    chunk: int = 2048,
) -> np.ndarray:
    """``jaro_winkler_batch`` over PRE-ENCODED strings: ``flat``/``offs``
    is a dictionary of distinct strings (``encode_flat_u32_arrow``), and
    ``ca``/``cb`` are per-pair indices into it. Identical values to the
    string-list kernel, zero Python strings:

    - equal codes ⇒ equal strings ⇒ 1.0 (dictionary is distinct);
    - distinct (ca, cb) combos computed once (np.unique on the packed
      key — the list kernel's memo dict, vectorized);
    - combos run in length-sorted chunks, each padded only to ITS max
      width (one outlier string doesn't widen every row's matrices).
    """
    n = ca.size
    out = np.ones(n, dtype=np.float64)
    ne = np.nonzero(ca != cb)[0]
    if ne.size == 0:
        return out
    nstr = np.int64(offs.size - 1)
    key = ca[ne].astype(np.int64) * nstr + cb[ne].astype(np.int64)
    ukey, inv = np.unique(key, return_inverse=True)
    ua = (ukey // nstr).astype(np.int64)
    ub = (ukey % nstr).astype(np.int64)
    vals = np.empty(ua.size, dtype=np.float64)
    lens = offs[1:] - offs[:-1]
    # native fast path: the C greedy scan touches O(len) chars per combo
    # vs the numpy core's O(len^2) element ops — same values (see
    # functions/_native.c); falls through to numpy when unavailable
    from . import native as _nat

    lib = _nat.get_lib()
    if lib is not None:
        flat_c = np.ascontiguousarray(flat, dtype=np.uint32)
        offs_c = np.ascontiguousarray(offs, dtype=np.int64)
        maxlen = int(lens.max()) if lens.size else 0
        rc = lib.jw_coded(
            _nat.ptr(flat_c, _nat._p_u32),
            _nat.ptr(offs_c, _nat._p_i64),
            _nat.ptr(ua, _nat._p_i64),
            _nat.ptr(ub, _nat._p_i64),
            np.int64(ua.size),
            float(prefix_weight),
            np.int64(maxlen),
            _nat.ptr(vals, _nat._p_f64),
        )
        if rc == 0:
            out[ne] = vals[inv]
            return out
    order = np.argsort(np.maximum(lens[ua], lens[ub]), kind="stable")
    for s in range(0, order.size, chunk):
        sel = order[s : s + chunk]
        A, la = _gather_pad_u32(flat, offs, ua[sel])
        B, lb = _gather_pad_u32(flat, offs, ub[sel])
        j = _jaro_batch_core(A, la, B, lb)
        p = min(4, A.shape[1], B.shape[1])
        eqp = (A[:, :p] == B[:, :p]) & (np.arange(p) < np.minimum(la, lb)[:, None])
        prefix = np.cumprod(eqp, axis=1).sum(axis=1)
        vals[sel] = j + prefix * prefix_weight * (1.0 - j)
    out[ne] = vals[inv]
    return out


def _jaro_batch_core(A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Vectorized Jaro over codepoint matrices; bit-identical to ``jaro``
    for non-equal string pairs (the s1 == s2 fast path is the caller's).

    The greedy match scan loops over CHARACTER POSITIONS of the left side
    only; each iteration resolves the window search for every pair at once
    (argmax of a masked equality matrix), so cost is O(max_len1 × n ×
    max_len2) vector ops — no per-pair Python.
    """
    n = la.size
    if n == 0:
        return np.zeros(0)
    md = np.maximum(la, lb) // 2 - 1  # may be -1, exactly like the scalar
    m1 = np.zeros(A.shape, dtype=bool)
    m2 = np.zeros(B.shape, dtype=bool)
    jr = np.arange(B.shape[1])
    # Common-prefix pre-match: while both sides agree at position i, the
    # greedy scan provably matches i→i (j = i is in-window for md ≥ 0 and
    # every j < i is already taken), so those iterations are resolved in
    # one vectorized pass. Pairs here share long prefixes (urls start
    # "https://", near-dup titles differ late), so this removes most of
    # the scan for exactly the rows that cost the most.
    w = min(A.shape[1], B.shape[1])
    eq = (A[:, :w] == B[:, :w]) & (np.arange(w) < np.minimum(la, lb)[:, None])
    p = np.where(eq.all(axis=1), np.minimum(la, lb), (~eq).argmax(axis=1))
    p = np.where(md >= 0, p, 0)  # md = -1 → empty window, nothing matches
    pre = np.arange(w) < p[:, None]
    m1[:, :w] |= pre
    m2[:, :w] |= pre
    for i in range(int(p.min()), int(la.max())):
        alive = la > i
        if not alive.any():
            break
        act = alive & ~m1[:, i]
        if not act.any():
            continue
        cand = (
            (B == A[:, i][:, None])
            & ~m2
            & (jr >= (i - md)[:, None])
            & (jr < np.minimum(lb, i + md + 1)[:, None])
            & act[:, None]
        )
        has = cand.any(axis=1)
        if has.any():
            rows = np.nonzero(has)[0]
            j = cand.argmax(axis=1)
            m1[rows, i] = True
            m2[rows, j[rows]] = True
    matches = m1.sum(axis=1)
    width = int(matches.max()) if n else 0
    if width == 0:
        return np.zeros(n)
    # compact matched chars leftward in original order (stable argsort on
    # the inverted mask), then count transposition mismatches columnwise
    c1 = np.take_along_axis(A, np.argsort(~m1, axis=1, kind="stable"), axis=1)[:, :width]
    c2 = np.take_along_axis(B, np.argsort(~m2, axis=1, kind="stable"), axis=1)[:, :width]
    t = ((c1 != c2) & (np.arange(width) < matches[:, None])).sum(axis=1) // 2
    m = matches.astype(np.float64)
    safe_m = np.maximum(m, 1.0)
    jaro_v = (
        m / np.maximum(la, 1) + m / np.maximum(lb, 1) + (m - t) / safe_m
    ) / 3.0
    return np.where(matches > 0, jaro_v, 0.0)


def jaro_winkler_batch(
    s1: list[str], s2: list[str], prefix_weight: float = 0.1, chunk: int = 2048
) -> np.ndarray:
    """Batched ``jaro_winkler`` — identical values, vectorized.

    Equal pairs short-circuit to 1.0; repeated (a, b) combinations are
    computed once per batch (titles repeat heavily across candidate
    pairs); the rest run through the numpy core in length-sorted chunks so
    one long outlier string doesn't widen every row's matrices.
    """
    n = len(s1)
    out = np.empty(n, dtype=np.float64)
    memo: dict[tuple[str, str], int] = {}
    da: list[str] = []
    db: list[str] = []
    slot = np.empty(n, dtype=np.int64)
    for i in range(n):
        x, y = s1[i], s2[i]
        if x == y:
            slot[i] = -1
            continue
        k = memo.setdefault((x, y), len(da))
        if k == len(da):
            da.append(x)
            db.append(y)
        slot[i] = k
    vals = np.empty(len(da), dtype=np.float64)
    if da:
        order = sorted(range(len(da)), key=lambda k: max(len(da[k]), len(db[k])))
        for s in range(0, len(order), chunk):
            sel = order[s : s + chunk]
            A, la = _encode_u32([da[k] for k in sel])
            B, lb = _encode_u32([db[k] for k in sel])
            j = _jaro_batch_core(A, la, B, lb)
            p = min(4, A.shape[1], B.shape[1])
            eqp = (A[:, :p] == B[:, :p]) & (np.arange(p) < np.minimum(la, lb)[:, None])
            prefix = np.cumprod(eqp, axis=1).sum(axis=1)
            vals[sel] = j + prefix * prefix_weight * (1.0 - j)
    eq = slot < 0
    out[eq] = 1.0
    out[~eq] = vals[slot[~eq]]
    return out


def rolling_fingerprints(toks: list[str], window: int = 4, keep: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: hash every ``window``-token
    shingle, keep the ``keep`` smallest hashes (a deterministic sketch).

    Public algorithm: Schleimer, Wilkerson, Aiken — "Winnowing: Local
    Algorithms for Document Fingerprinting" (SIGMOD 2003), simplified to
    bottom-k selection.
    """
    from .hashing import stable_u64

    if len(toks) < window:
        return [stable_u64(" ".join(toks))] if toks else []
    hs = sorted(
        {stable_u64(" ".join(toks[i : i + window])) for i in range(len(toks) - window + 1)}
    )
    return hs[:keep]


def humanize_duration(seconds: int) -> str:
    """Seconds → ``"Hh MMm SSs"`` (M12; the duration humanizer of
    ``ssh_login_report.sh:38-49``). Oracle-reproducible via DuckDB
    ``printf('%dh %02dm %02ds', ...)``."""
    s = int(seconds)
    return f"{s // 3600}h {(s % 3600) // 60:02d}m {s % 60:02d}s"


def quality_features(text: str) -> dict[str, float]:
    """Heuristic quality-scoring features for one document (pure fn).

    Used by the batched quality stage; individual features are also
    exposed as oracle-checkable columns where SQL can express them.
    """
    toks = tokens(text)
    n_tok = len(toks)
    n_chars = len(text)
    alpha = sum(c.isalpha() for c in text)
    punct = sum(not c.isalnum() and not c.isspace() for c in text)
    stop = sum(t in STOPWORDS for t in toks)
    uniq = len(set(toks))
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tok),
        "mean_token_len": (sum(map(len, toks)) / n_tok) if n_tok else 0.0,
        "alpha_ratio": alpha / n_chars if n_chars else 0.0,
        "punct_ratio": punct / n_chars if n_chars else 0.0,
        "stopword_ratio": stop / n_tok if n_tok else 0.0,
        "unique_ratio": uniq / n_tok if n_tok else 0.0,
    }


# --- language-ID: tiny n-gram-frequency heuristic over a fixed profile ----
# Profiles are fixed constants (public knowledge: characteristic function
# words per language), NOT trained — deterministic everywhere.
_LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is you that it for was with his they".split()),
    "es": frozenset("el la de que y en un ser se no por con para los".split()),
    "fr": frozenset("le de un être et à il avoir ne je son que se qui".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
    "pt": frozenset("o de a e do da em um para é com não uma os no".split()),
}


def langid(text: str) -> str:
    """Marker-word voting language id; 'und' when nothing matches."""
    toks = tokens(text)
    if not toks:
        return "und"
    best, best_score = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(t in markers for t in toks)
        if score > best_score:
            best, best_score = lang, score
    return best


_PKG_VERSION_SEPS = ("==", ">=", "<=", "~=", "!=", ">", "<", "@", "=")


def canonicalize_package_list(s: str) -> str:
    """Package-list canonicalizer (SURVEY §2 M13 — the reference's
    pip/yum list normalization, ``deploy_cluster.sh``'s dependency-diff
    prep): split on commas/semicolons/whitespace, strip version
    constraints and extras markers, lowercase, normalize ``_``/``.`` to
    ``-`` (PEP 503 name normalization), dedupe, emit sorted
    comma-joined. Idempotent and order-insensitive (hypothesis-tested).
    """
    out = set()
    for raw in s.replace(",", " ").replace(";", " ").split():
        name = raw
        for sep in _PKG_VERSION_SEPS:
            idx = name.find(sep)
            if idx != -1:
                name = name[:idx]
        name = name.split("[")[0].strip().lower()
        name = name.replace("_", "-").replace(".", "-")
        name = name.strip("-")
        if name:
            out.add(name)
    return ",".join(sorted(out))


# int32 Arrow string offsets bound one batch's total chunk bytes; a
# batch over the bound is SPLIT (not promoted to large_string — see the
# schema-consistency note inside). Module-level so tests can exercise
# the split path without a 2-GiB allocation.
_CHUNK_TEXT_MAX_BYTES = np.iinfo(np.int32).max


def chunk_token_windows(
    t,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
):
    """Sliding-window token chunking (the RAG/context-packing prep op):
    per document, emit windows of ``size`` whitespace tokens every
    ``stride`` tokens (overlap = size - stride), as
    (id, chunk_idx, chunk_text, n_tokens) rows.

    Batch-level Arrow/numpy kernel, no per-token Python: token counts
    come from one ``count_substring`` C kernel; token BOUNDARIES come
    from one numpy scan of the string column's own UTF-8 value buffer
    (space positions — splitting at single-space boundaries is
    UTF-8-safe); chunk texts are rebuilt as a StringArray directly from
    (offsets, values) buffers — the only Python loop collects byte-
    slice VIEWS (one per chunk, ~n_chunks slice objects per batch) that
    a single ``np.concatenate`` memcpys.

    Exactly reproducible in SQL (the conformance oracle):
    ``unnest(range(0, greatest(len(tokens),1), stride))`` + list slice
    — a doc with T tokens yields ceil(max(T,1)/stride) chunks, the
    last possibly short; empty text behaves as one empty token, exactly
    like ``regexp_split_to_array('', ' ')``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # Input guard (round-3 advice): the buffer scan below assumes a
    # null-free utf8 value buffer with width-matched offsets. Nulls chunk
    # as empty text (same as '' under the oracle's regexp_split semantics);
    # large_string reads int64 offsets; anything else is a loud TypeError.
    if arr.null_count:
        arr = pc.fill_null(arr, "")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
    if pa.types.is_string(arr.type):
        _off_dtype = np.int32
    elif pa.types.is_large_string(arr.type):
        _off_dtype = np.int64
    else:
        raise TypeError(
            f"chunk_token_windows: text column {text_col!r} must be "
            f"string/large_string, got {arr.type}"
        )
    n_docs = len(arr)
    if n_docs == 0:
        return pa.table(
            {
                id_col: t[id_col],
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    n_tok = pc.add(pc.count_substring(arr, " "), 1).to_numpy().astype(np.int64)

    # char-level token boundaries from the utf8 buffer: one byte scan
    offs = np.frombuffer(arr.buffers()[1], dtype=_off_dtype)[
        arr.offset : arr.offset + n_docs + 1
    ].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    space_pos = np.flatnonzero(buf[offs[0] : offs[-1]] == 0x20) + offs[0]
    # global token start/end char positions, doc-major
    tok_starts = np.sort(np.concatenate([offs[:-1], space_pos + 1]))
    tok_ends = np.sort(np.concatenate([space_pos, offs[1:]]))
    tok_base = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=tok_base[1:])

    # chunk fan-out: ceil(max(T,1)/stride) chunks per doc
    n_chunks = (np.maximum(n_tok, 1) + stride - 1) // stride
    doc_of = np.repeat(np.arange(n_docs), n_chunks)
    base = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=base[1:])
    chunk_idx = np.arange(base[-1], dtype=np.int64) - base[doc_of]
    s = chunk_idx * stride  # start token (per doc)
    e = np.minimum(s + size, np.maximum(n_tok[doc_of], 1))  # end token
    out_n_tokens = e - s

    a = tok_starts[tok_base[doc_of] + s]
    b = tok_ends[tok_base[doc_of] + e - 1]
    lengths = b - a
    # int64 accumulation (round-3 advice): with overlap the output is
    # ~size/stride × the input bytes, so a near-2-GiB batch can cross
    # INT32_MAX — emit large_string in that case instead of wrapping.
    out_off = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off[1:])
    pieces = [buf[x:y] for x, y in zip(a, b)]
    values = (
        np.concatenate(pieces) if pieces else np.empty(0, dtype=np.uint8)
    )
    if out_off[-1] <= _CHUNK_TEXT_MAX_BYTES:
        chunk_text = pa.StringArray.from_buffers(
            len(lengths),
            pa.py_buffer(out_off.astype(np.int32).tobytes()),
            pa.py_buffer(values.tobytes()),
        )
    else:
        # Schema-consistency fix (round-4 advice): emitting large_string
        # only for THIS batch would fail Arrow/Ray schema unification
        # against other batches' string chunks. Split the doc set and
        # recurse instead — every output batch stays plain string.
        if n_docs < 2:
            raise ValueError(
                "chunk_token_windows: a single document's chunk output "
                f"exceeds int32 offsets ({int(out_off[-1])} bytes) — "
                "reduce size/stride overlap or pre-split the document"
            )
        mid = n_docs // 2
        return pa.concat_tables(
            [
                chunk_token_windows(
                    t.slice(0, mid), id_col=id_col, text_col=text_col,
                    size=size, stride=stride,
                ),
                chunk_token_windows(
                    t.slice(mid), id_col=id_col, text_col=text_col,
                    size=size, stride=stride,
                ),
            ]
        ).combine_chunks()
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.take(pa.array(doc_of)),
            "chunk_idx": pa.array(chunk_idx),
            "chunk_text": chunk_text,
            "n_tokens": pa.array(out_n_tokens),
        }
    )
