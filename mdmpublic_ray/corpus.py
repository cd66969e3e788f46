"""Deterministic synthetic web-page corpus + the HTML→text extraction oracle.

The engine's primary input is the BASELINE.json ``input_hint`` table
``pages(url, warc_ts, html, text, lang)`` — Common-Crawl-style web pages.
No such table ships in ``/root/testdata``, so this module synthesises one
**deterministically from a seed** (FIXTURES.md §A1): planted duplicate
families (re-crawls of one url), near-duplicate families (small token
edits), cross-host mirrors (LSH-only recall), and singletons, with one hot
host owning ~30% of pages for skew tests. It stands in for the MDM staging
bucket (``/root/reference/python/db_backup/cb_backup.py:45`` `mdm-staging`).

``extract_text`` is the **extraction oracle**: a pure single-threaded
function over bytes. The distributed extraction stage
(``stages/extract.py``) must reproduce it byte-identically per url — the
BASELINE.json conformance invariant. It is deliberately free of dict
ordering, locale, and float formatting (SURVEY.md §7.4).

Everything here derives from the seed only — no external data.
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# HTML building + extraction oracle (inverse pair)
# ---------------------------------------------------------------------------

_ESCAPES = (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"))
_P_RE = re.compile(rb"<p\b[^>]*>(.*?)</p>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]+>")


def escape_html(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def unescape_html(s: str) -> str:
    # Reverse order: &amp; last so "&amp;lt;" round-trips correctly.
    for raw, esc in reversed(_ESCAPES):
        s = s.replace(esc, raw)
    return s.replace("&quot;", '"').replace("&#39;", "'")


def build_html(title: str, paragraphs: list[str], crawl_note: str = "") -> bytes:
    """Deterministic page markup wrapping ``paragraphs`` (the ground-truth
    text is exactly ``"\\n".join(paragraphs)``). Some inline <b> markup is
    derived from paragraph content so extraction must really strip tags."""
    body = []
    for i, p in enumerate(paragraphs):
        esc = escape_html(p)
        if i % 3 == 1 and " " in esc:
            # bold the first word — extractor must drop inline tags
            first, rest = esc.split(" ", 1)
            esc = f"<b>{first}</b> {rest}"
        body.append(f'<p class="c{i % 4}">{esc}</p>')
    html = (
        '<html><head><meta charset="utf-8"><title>'
        + escape_html(title)
        + "</title></head><body><nav>home | about</nav><div id=\"main\">"
        + "".join(body)
        + f"</div><footer>{escape_html(crawl_note)}</footer></body></html>"
    )
    return html.encode("utf-8")


def extract_text(html: bytes) -> str:
    """THE extraction oracle (BASELINE.json byte-identity invariant).

    Spec: text = the contents of every ``<p>`` element in document order,
    inline tags stripped, HTML entities (&lt; &gt; &amp; &quot; &#39;)
    unescaped, paragraphs joined with "\\n". Pure function of the bytes.
    """
    out = []
    for m in _P_RE.finditer(html):
        inner = _TAG_RE.sub(b"", m.group(1))
        out.append(unescape_html(inner.decode("utf-8")))
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Seeded corpus generation
# ---------------------------------------------------------------------------

_EPOCH = _dt.datetime(2024, 1, 1)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _vocab(rng: np.random.Generator, size: int = 600) -> list[str]:
    syll = ["ba", "ko", "ri", "ta", "nu", "se", "lo", "mi", "da", "pu", "ve", "zo"]
    words = set()
    while len(words) < size:
        n = rng.integers(2, 5)
        words.add("".join(syll[rng.integers(0, len(syll))] for _ in range(n)))
    out = sorted(words)
    # plant language marker words + special chars for extraction realism
    out[:6] = ["the", "and", "of", "el", "la", "de"]
    out[6] = "r&d"
    out[7] = "a<b"
    return out


def generate_pages(
    n_clusters: int = 200,
    seed: int = 42,
    hot_host_frac: float = 0.3,
    n_hosts: int = 40,
    singleton_frac: float = 0.35,
    doc_tokens: tuple[int, int] = (30, 80),
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Return (pages, truth_clusters, labels).

    pages:  the input_hint table, including re-crawl duplicate rows.
    truth:  (url, cluster_id) planted truth over unique urls.
    labels: (url_a, url_b, is_match) labeled pairs restricted to pairs that
            share at least one blocking key (same host, or near-dup text ⇒
            LSH key), per the "within the same blocking keys" clause of
            BASELINE.json.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    nv = len(vocab)
    hosts = [f"site-{i:03d}.example" for i in range(n_hosts)]
    hot = "big-portal.example"

    urls, tss, htmls, texts, langs = [], [], [], [], []
    truth_url, truth_cid = [], []
    # per-cluster member lists for labels
    members: list[list[str]] = []
    member_host: dict[str, str] = {}

    n_singletons = int(n_clusters * singleton_frac / (1 - singleton_frac))
    total_entities = n_clusters + n_singletons

    for ent in range(total_entities):
        is_singleton = ent >= n_clusters
        cid = f"c{ent:06d}"
        # doc_tokens sizes documents: (30, 80) keeps unit tests fast;
        # the scaling bench uses (300, 800) — realistic web-page bodies —
        # so per-document compute, not per-stage latency, dominates.
        base_len = int(rng.integers(doc_tokens[0], doc_tokens[1]))
        base = [vocab[i] for i in rng.integers(0, nv, size=base_len)]
        lang = ["en", "es", "fr", "de", "pt"][int(rng.integers(0, 5))]
        size = 1 if is_singleton else int(rng.integers(2, 6))
        cross_host = (not is_singleton) and rng.random() < 0.3
        mem = []
        for m in range(size):
            if rng.random() < hot_host_frac and not (cross_host and m > 0):
                host = hot
            elif cross_host and m > 0:
                host = hosts[int(rng.integers(0, n_hosts))]
            else:
                host = hosts[ent % n_hosts]
            url = f"https://{host}/p/{ent:06d}/{m}"
            toks = list(base)
            if m > 0:
                # near-duplicate: edit up to 3 tokens (~96% Jaccard floor)
                for _ in range(int(rng.integers(0, 4))):
                    pos = int(rng.integers(0, len(toks)))
                    toks[pos] = vocab[int(rng.integers(0, nv))]
            paras = []
            step = max(8, len(toks) // 4)
            for s in range(0, len(toks), step):
                paras.append(" ".join(toks[s : s + step]))
            text = "\n".join(paras)
            title = " ".join(toks[:4])
            n_crawls = 1 + int(rng.random() < 0.25)  # some urls re-crawled
            base_ts = _EPOCH + _dt.timedelta(minutes=int(rng.integers(0, 500_000)))
            for c in range(n_crawls):
                ts = base_ts + _dt.timedelta(hours=c * int(rng.integers(1, 72)))
                urls.append(url)
                tss.append(ts)
                htmls.append(build_html(title, paras, f"crawl {c}"))
                texts.append(text)
                langs.append(lang)
            truth_url.append(url)
            truth_cid.append(cid)
            mem.append(url)
            member_host[url] = host
        members.append(mem)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    truth = pa.table(
        {"url": pa.array(truth_url), "cluster_id": pa.array(truth_cid)}
    )

    # ---- labeled pairs --------------------------------------------------
    la, lb, ly = [], [], []
    # positives: all intra-cluster pairs (clusters are small)
    for mem in members:
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                a, b = sorted((mem[i], mem[j]))
                la.append(a)
                lb.append(b)
                ly.append(True)
    # negatives: same-host pairs across different clusters (share the host
    # blocking key), ~2 negatives per positive
    by_host: dict[str, list[tuple[str, int]]] = {}
    for ci, mem in enumerate(members):
        for u in mem:
            by_host.setdefault(member_host[u], []).append((u, ci))
    n_neg = 2 * len(la)
    host_list = [h for h, v in by_host.items() if len(v) > 1]
    made = 0
    guard = 0
    while made < n_neg and guard < n_neg * 20:
        guard += 1
        h = host_list[int(rng.integers(0, len(host_list)))]
        v = by_host[h]
        (u1, c1) = v[int(rng.integers(0, len(v)))]
        (u2, c2) = v[int(rng.integers(0, len(v)))]
        if c1 == c2:
            continue
        a, b = sorted((u1, u2))
        la.append(a)
        lb.append(b)
        ly.append(False)
        made += 1
    labels = pa.table(
        {
            "url_a": pa.array(la),
            "url_b": pa.array(lb),
            "is_match": pa.array(ly, pa.bool_()),
        }
    )
    return pages, truth, labels


def write_corpus(out_dir: str, *, n_files: int = 1, **kw) -> dict[str, str]:
    """Materialize the corpus as parquet files; returns path map.

    Row groups are bounded at 8192 rows: Ray's parquet reader splits a
    FILE into read tasks only at row-group boundaries, so a single-row
    -group file serializes the whole scan (and every map fused onto it)
    onto one core regardless of cluster width — measured 6.4 s for one
    434 MB file that 32 row groups scan in <1 s. Real 100 TB inputs are
    many files; bounded row groups make the single-file test corpora
    behave the same way.

    ``n_files > 1`` writes the pages table as a DIRECTORY of that many
    part files instead (``pages/part-NNNNN.parquet``; the path map then
    points at the directory, which ``read_parquet`` accepts unchanged) —
    the layout a real many-file 100-TB input has, used by the soak
    protocol's multi-file parity leg (round-4 verdict item #8).
    """
    import os

    import pyarrow.parquet as pq

    pages, truth, labels = generate_pages(**kw)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, tbl in (("pages", pages), ("truth", truth), ("labels", labels)):
        if name == "pages" and n_files > 1:
            d = os.path.join(out_dir, "pages")
            os.makedirs(d, exist_ok=True)
            step = -(-tbl.num_rows // n_files)
            for i in range(n_files):
                sl = tbl.slice(i * step, step)
                if sl.num_rows == 0:
                    break
                pq.write_table(
                    sl,
                    os.path.join(d, f"part-{i:05d}.parquet"),
                    row_group_size=8192,
                )
            paths[name] = d
            continue
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p, row_group_size=8192)
        paths[name] = p
    return paths


def split_base_delta(pages: pa.Table, every: int = 10) -> tuple[pa.Table, pa.Table]:
    """Deterministically split a pages table into (base, delta) for the
    incremental-ER tests and queries — a pure function of the urls, no RNG:

    - urls with ``crc32(url) % every == 0``: every crawl row → delta
      (NEW documents; some will join clusters whose siblings are in base)
    - re-crawled urls with ``crc32 % every == 1``: the latest crawl → delta
      (UPDATED documents — the incumbent row is invalidated), earlier
      crawls → base
    - everything else → base

    ``every`` sets the delta fraction (~2/every of rows): the default 10
    keeps the tests' rich mix of new+updated docs; soak protocols use
    100 for the headline ~1%-crawl-delta story.
    """
    import zlib

    urls = pages["url"].to_pylist()
    ts = pages["warc_ts"].to_pylist()
    mod = {u: zlib.crc32(u.encode()) % every for u in set(urls)}
    latest: dict[str, object] = {}
    for u, t in zip(urls, ts):
        if u not in latest or t > latest[u]:
            latest[u] = t
    counts: dict[str, int] = {}
    for u in urls:
        counts[u] = counts.get(u, 0) + 1
    to_delta = []
    for u, t in zip(urls, ts):
        m = mod[u]
        to_delta.append(
            m == 0 or (m == 1 and counts[u] > 1 and t == latest[u])
        )
    mask = pa.array(to_delta, pa.bool_())
    import pyarrow.compute as _pc

    return pages.filter(_pc.invert(mask)), pages.filter(mask)


# ---------------------------------------------------------------------------
# Adapter: derive a pages table from the driver's documents.parquet
# ---------------------------------------------------------------------------

def pages_from_documents(sf_dir: str, exclude_doc_ids=None) -> pa.Table:
    """Deterministic expansion of ``{sf_dir}/documents.parquet`` into the
    input_hint ``pages`` shape, so entry()/bench run the flagship pipeline
    over driver data: each doc becomes a page; every 4th doc is re-crawled
    twice; every 5th doc gains a near-dup mirror on another host; ~30% of
    pages live on one hot host (skew, per SURVEY.md §7.4).

    ``exclude_doc_ids``: doc ids to drop BEFORE expansion (the
    ``er_clusters_oracle`` query removes docs with cross-doc near-dup
    partners so the planted per-doc clustering is the provable truth)."""
    import pyarrow.parquet as pq

    excl = frozenset(exclude_doc_ids) if exclude_doc_ids is not None else frozenset()
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    urls, tss, htmls, texts, langs = [], [], [], [], []

    def emit(url, ts, text, lang, crawl):
        paras = text.split("\n")
        urls.append(url)
        tss.append(ts)
        htmls.append(build_html(" ".join(text.split()[:4]), paras, f"crawl {crawl}"))
        texts.append(text)
        langs.append(lang)

    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        if doc_id in excl:
            continue
        host = "big-portal.example" if doc_id % 10 < 3 else f"site-{doc_id % 97:03d}.example"
        url = f"https://{host}/doc/{doc_id}"
        ts0 = _EPOCH + _dt.timedelta(minutes=doc_id * 7 % 500_000)
        emit(url, ts0, text, lang, 0)
        if doc_id % 4 == 0:
            emit(url, ts0 + _dt.timedelta(hours=doc_id % 50 + 1), text, lang, 1)
        if doc_id % 5 == 0:
            mirror_host = f"mirror-{doc_id % 13:02d}.example"
            toks = text.split()
            if len(toks) > 3:
                del toks[doc_id % len(toks)]
            emit(f"https://{mirror_host}/doc/{doc_id}", ts0, " ".join(toks), lang, 0)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
