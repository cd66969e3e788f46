"""Corpus generator + extraction-oracle invariants (no Ray needed)."""

import pyarrow.parquet as pq

from mdmpublic_ray.corpus import (
    build_html,
    extract_text,
    generate_pages,
    pages_from_documents,
)


def test_extract_roundtrip_simple():
    html = build_html("a title", ["hello world", "second para"], "crawl 0")
    assert extract_text(html) == "hello world\nsecond para"


def test_extract_handles_entities_and_inline_tags():
    # literal <b> in source text is escaped by the generator and must
    # round-trip back to literal text (it is NOT markup)
    html = build_html("t", ["r&d dept", "x <b>literal</b> & y", 'quote " here'])
    assert extract_text(html) == 'r&d dept\nx <b>literal</b> & y\nquote " here'
    # real inline markup injected by the generator (every 3rd paragraph) IS
    # stripped: paragraph index 1 gets <b>first-word</b>
    html2 = build_html("t", ["a b", "c d", "e f"])
    assert b"<b>c</b>" in html2
    assert extract_text(html2) == "a b\nc d\ne f"


def test_generate_is_deterministic():
    p1, t1, l1 = generate_pages(n_clusters=30, seed=7)
    p2, t2, l2 = generate_pages(n_clusters=30, seed=7)
    assert p1.equals(p2) and t1.equals(t2) and l1.equals(l2)
    p3, _, _ = generate_pages(n_clusters=30, seed=8)
    assert not p1.equals(p3)


def test_generated_html_extracts_byte_identical():
    pages, _, _ = generate_pages(n_clusters=40, seed=42)
    for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text(html) == text


def test_corpus_shape(corpus_dir):
    pages = pq.read_table(f"{corpus_dir}/pages.parquet")
    truth = pq.read_table(f"{corpus_dir}/truth.parquet")
    labels = pq.read_table(f"{corpus_dir}/labels.parquet")
    assert pages.num_rows > truth.num_rows  # re-crawl duplicate rows exist
    assert set(pages.column_names) == {"url", "warc_ts", "html", "text", "lang"}
    # labels contain both classes
    ism = labels["is_match"].to_pylist()
    assert any(ism) and not all(ism)
    # truth covers every unique url exactly once
    assert truth.num_rows == len(set(pages["url"].to_pylist()))
    # hot-host skew planted
    from mdmpublic_ray.functions.urls import canonical_host

    hosts = [canonical_host(u) for u in pages["url"].to_pylist()]
    frac = hosts.count("big-portal.example") / len(hosts)
    assert 0.1 < frac < 0.5


def test_pages_from_documents_deterministic_and_extractable():
    t1 = pages_from_documents("/root/testdata/sf0.001")
    t2 = pages_from_documents("/root/testdata/sf0.001")
    assert t1.equals(t2)
    assert t1.num_rows > 500  # expansion happened
    for html, text in zip(t1["html"].to_pylist()[:50], t1["text"].to_pylist()[:50]):
        assert extract_text(html) == text


def test_write_corpus_multi_file_layout_equal_rows(tmp_path):
    """n_files > 1 writes pages as a directory of part files holding the
    SAME rows as the single-file layout (the soak's multi-file parity
    leg reads it through the identical read_parquet call)."""
    import os

    import pyarrow.parquet as pq

    from mdmpublic_ray.corpus import write_corpus

    single = write_corpus(str(tmp_path / "s"), n_clusters=20, seed=7)
    multi = write_corpus(str(tmp_path / "m"), n_clusters=20, seed=7, n_files=8)
    assert os.path.isdir(multi["pages"])
    parts = sorted(os.listdir(multi["pages"]))
    assert len(parts) == 8 and all(p.endswith(".parquet") for p in parts)
    a = pq.read_table(single["pages"]).to_pandas()
    b = pq.read_table(multi["pages"]).to_pandas()
    key = ["url", "warc_ts"]
    a = a.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert a.equals(b)
