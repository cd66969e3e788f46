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
