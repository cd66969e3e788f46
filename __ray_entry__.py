"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry() -> Any:
    """Flagship pipeline: derive the input_hint ``pages`` table
    deterministically from sf0.001 documents, run the full
    entity-resolution pipeline (dedup-latest → extraction → blocking →
    scoring → transitive clustering → golden records), return the golden
    records (stable schema, ≥0 rows)."""
    from mdmpublic_ray.pipelines.queries import q_er_golden

    return q_er_golden("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 —
    see mdmpublic_ray/pipelines/queries.py for per-query docs."""
    from mdmpublic_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per SQL-expressible query (same column names; exact
    fixed-point sums — see queries.py module docstring). The flagship ER
    pipeline IS oracle-checked end-to-end via ``er_clusters_oracle`` /
    ``er_golden_oracle`` (restricted corpus where the planted truth is
    SQL-provable) and, round 4, via ``er_clusters_emb_oracle`` /
    ``er_golden_emb_oracle`` (same restriction, scored with the learned
    embedding model). The approximate-ANN/dedup family is also
    oracle-checked round 4 via planted/restricted corpora with provable
    recall 1.0: ``knn_cosine_lsh``, ``knn_cosine_ivf``,
    ``docs_minhash_clusters``, ``docs_simhash_clusters`` (their
    unrestricted ``*_full`` variants stay rows-only). Keys absent here
    (the ``*_full`` scale demos, distributed k-means, the unrestricted
    er_* pipelines, pages_media_features — pixel decode has no SQL
    form — CDC chunk dedup docs_cdc_dedup, the ExactSubstr span cutter
    docs_strip_dup_spans — a multi-stage text rewrite with no
    single-statement SQL form (its detection pass docs_dup_ngrams IS
    oracled) — and the sketch variants docs_distinct_tokens_hll /
    docs_top_tokens_mg / docs_len_quantiles_mrl) are
    non-SQL-expressible or approximate pipelines → rows-only check,
    each with dedicated pytest semantics (error bounds, recall floors,
    or planted-truth equality)."""
    from mdmpublic_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
