"""HTML→text extraction stage (SURVEY.md §2.2 M17, BASELINE.json invariant).

The distributed stage must produce **byte-identical** text per url versus
the single-process oracle ``mdmpublic_ray.corpus.extract_text``. The stage
therefore applies that exact pure function — determinism by construction —
and the tests verify the *distribution machinery* (actor pool, batching,
block splits) preserves bytes end-to-end.

Scale notes: an actor pool (callable class) is used so the compiled regex
state is built once per worker, mirroring the MDM app's computation thread
pool (``/root/reference/chef/setup_jenkins/jenkins_jobs/DeploySystem/
config.xml:91-92`` 8/64 threads). ``html`` is a wide binary column —
callers should use a modest ``batch_size`` and drop the column right after
this stage (``select_columns``) so downstream shuffles never move raw HTML
(SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa

from ..corpus import extract_text


class ExtractText:
    """Actor-pool callable: pages batch → batch with ``text`` recomputed
    from ``html``. Output schema: url, warc_ts, text, lang (html dropped)."""

    def __init__(self) -> None:
        # Touch the compiled patterns once per actor (they live at module
        # import, this just pins them hot).
        extract_text(b"<p>warm</p>")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pa.array(
            [extract_text(h) for h in batch["html"].to_pylist()], pa.string()
        )
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "text": texts,
                "lang": batch["lang"],
            }
        )


def extract_stage(ds, *, batch_size: int = 256, concurrency=(2, 8)):
    """pages(url, warc_ts, html, text?, lang) → (url, warc_ts, text, lang).

    Small batch_size: a batch holds ``batch_size`` raw HTML payloads in
    worker heap (web pages are tens of KB; 256 × 50 KB ≈ 13 MB per batch).
    """
    return ds.map_batches(
        ExtractText,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
