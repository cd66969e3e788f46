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


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch → batch with ``text`` recomputed from ``html``
    (html dropped). Stateless task — the extractor's only state is the
    module-level compiled regexes, which every Ray worker already holds
    after import, so an actor pool would only add spin-up latency
    (measured: autoscaling pools ramp from 1 actor and cost seconds of
    under-parallelism per stage; plain tasks start at full width)."""
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


# Back-compat callable-class form (actor pool); the stage uses the task
# form above by default.
class ExtractText:
    def __init__(self) -> None:
        extract_text(b"<p>warm</p>")

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch)


def extract_stage(ds, *, batch_size: int = 256, concurrency=None):
    """pages(url, warc_ts, html, text?, lang) → (url, warc_ts, text, lang).

    Small batch_size: a batch holds ``batch_size`` raw HTML payloads in
    worker heap (web pages are tens of KB; 256 × 50 KB ≈ 13 MB per batch).
    Stateless task pool (see ``extract_batch``); pass ``concurrency`` to
    force an actor pool instead.
    """
    if concurrency is not None:
        return ds.map_batches(
            ExtractText,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size
    )
