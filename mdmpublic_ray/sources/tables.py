"""Readers over the driver-provided parquet tables (SURVEY.md §2.1 S1-S3).

The reference's plugin-by-naming-convention source registry
(``/root/reference/bash/dump_db_summary/dump_db_summary.sh:109-118``:
iterate ``cfg_dir/*.cfg`` and dispatch ``dump_${db}_summary``) becomes a
table registry keyed by name; every read prunes columns at the parquet
footer (``columns=[...]``) so a 2-column transform never loads 11 columns.
"""

from __future__ import annotations

import os

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw):
    """ray.data.read_parquet with column pruning (SURVEY §2.1 mapping).

    The driver's parquet carries a ``pandas`` schema-metadata blob; Ray's
    per-worker schema dedup can't hash it and logs a warning per block.
    Stripping it is metadata-only (zero-copy) and fuses with the next map.
    """
    import ray.data as rd

    def strip_md(t):
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return rd.read_parquet(table_path(sf_dir, name), columns=columns, **kw).map_batches(
        strip_md, batch_format="pyarrow", zero_copy_batch=True
    )


def read_table_arrow(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side pyarrow read for SMALL dimension tables only (broadcast
    sides of joins — customer/nation/region scale; never fact tables)."""
    import pyarrow.parquet as pq

    return pq.read_table(table_path(sf_dir, name), columns=columns)
