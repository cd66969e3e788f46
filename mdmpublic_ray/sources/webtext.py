"""Deterministic multi-line web-page fixture for the scrubbing operators
(PII redaction, C4-style line-level boilerplate removal).

The driver's `documents` table is single-line token soup, so line- and
PII-level text cleaning needs its own raw-HTML-extracted-style corpus.
Like ``textlog.py``, the fixture is generated from a FIXED seed
(sf-independent) and written as parquet so the Ray pipeline and the
DuckDB oracle read byte-identical inputs at every sf.

Each page mixes:
  * content sentences (≥5 tokens, terminal punctuation) — the KEEP class;
  * nav / cookie-banner / short-fragment boilerplate — the DROP class;
  * PII spans (emails, US-style phone numbers, IPv4 addresses) embedded
    in both classes, for the redaction operator.
"""

from __future__ import annotations

import os
import random

FIXTURE_DIR = "/tmp/mdmpublic_ray_fixtures"
WEBPAGES = os.path.join(FIXTURE_DIR, "webpages.parquet")
N_PAGES = 600
_SEED = 20260817

_WORDS = (
    "data engine cluster stream batch arrow shuffle block actor worker "
    "record schema column parquet vector index hash merge scan filter "
    "window group join sort limit union sample token model training "
    "corpus quality language near duplicate exact golden entity match"
).split()

_NAV = [
    "Home | About | Products | Contact",
    "Sign in",
    "Subscribe to our newsletter",
    "Terms of Service Privacy",
    "Menu",
    "Share on social media",
    "Read more",
]
_COOKIE = [
    "This site uses cookies to improve your experience.",
    "By continuing you accept our cookie policy.",
    "Please enable JavaScript to view this page.",
]


def _sentence(rng: random.Random, pii: str | None) -> str:
    n = rng.randrange(6, 18)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    if pii is not None:
        ws.insert(rng.randrange(len(ws)), pii)
    s = " ".join(ws)
    return s[0].upper() + s[1:] + rng.choice([".", ".", ".", "!", "?"])


def _pii(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.4:
        return f"user{rng.randrange(100)}@example{rng.randrange(9)}.com"
    if r < 0.7:
        if rng.random() < 0.5:
            return f"({rng.randrange(200, 990)}) {rng.randrange(200, 990)}-{rng.randrange(1000, 9990)}"
        return f"{rng.randrange(200, 990)}-{rng.randrange(200, 990)}-{rng.randrange(1000, 9990)}"
    return f"{rng.randrange(1, 240)}.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(1, 255)}"


def webpages_path() -> str:
    """Generate-if-missing and return the fixture path (atomic publish)."""
    if os.path.exists(WEBPAGES):
        return WEBPAGES
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(_SEED)
    ids, urls, texts = [], [], []
    for pid in range(N_PAGES):
        lines: list[str] = []
        for _ in range(rng.randrange(6, 25)):
            r = rng.random()
            if r < 0.25:
                lines.append(rng.choice(_NAV))
            elif r < 0.35:
                lines.append(rng.choice(_COOKIE))
            elif r < 0.45:  # short fragment (fails the ≥5-token rule)
                lines.append(" ".join(rng.choice(_WORDS) for _ in range(rng.randrange(1, 4))))
            else:
                pii = _pii(rng) if rng.random() < 0.3 else None
                lines.append(_sentence(rng, pii))
        ids.append(pid)
        urls.append(f"https://site{pid % 37}.example.org/page/{pid}")
        texts.append("\n".join(lines))
    tbl = pa.table(
        {
            "page_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "raw_text": pa.array(texts, pa.string()),
        }
    )
    tmp = WEBPAGES + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, WEBPAGES)
    return WEBPAGES


def read_webpages():
    """Raw web-page source: (page_id, url, raw_text)."""
    import ray.data as rd

    return rd.read_parquet(webpages_path())
