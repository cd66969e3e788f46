"""Golden-record survivorship (SURVEY.md §7.1 M6) — the ``mdm-master``
analog (``/root/reference/python/db_backup/cb_backup.py:45``): one merged
record per resolved entity cluster.

Survivorship rule (deterministic, SURVEY.md §7.0): canonical url = the
member with max ``warc_ts``; ties broken by lexicographic-min url. Merged
fields: member count, distinct langs (sorted, comma-joined — the
reference's list-as-joined-string idiom, ``cb_backup.py:99``), newest
crawl time, and the canonical member's text length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_array
from .util import DEFAULT_BUCKETS  # noqa: F401


def golden_records(clusters_ds, pages_ds, *, num_partitions: int | None = None, n_buckets: int = DEFAULT_BUCKETS):
    """clusters(url, cluster_id) ⋈ deduped pages → golden records.

    Output: (cluster_id, canonical_url, n_members, langs, max_warc_ts,
    text_len). Uses the bucketed-groupby pattern (see dedup.py) so Python
    overhead is O(buckets), not O(clusters).
    """
    from .util import bucketed_join, default_partitions

    num_partitions = num_partitions or default_partitions()
    enriched = bucketed_join(
        clusters_ds, pages_ds, "url", "url", n_buckets=num_partitions
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = crc32_array(batch["cluster_id"].to_pylist()) % np.uint32(n_buckets)
        return batch.append_column("_bucket", pa.array(b.astype(np.int32)))

    def survive(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cid, g in df.groupby("cluster_id", sort=False):
            # canonical: max warc_ts, tie-break min url (stable sort)
            g = g.sort_values(["warc_ts", "url"], ascending=[False, True],
                              kind="mergesort")
            top = g.iloc[0]
            rows.append(
                {
                    "cluster_id": cid,
                    "canonical_url": top["url"],
                    "n_members": len(g),
                    "langs": ",".join(sorted(set(g["lang"]))),
                    "max_warc_ts": g["warc_ts"].max(),
                    "text_len": len(top["text"]),
                }
            )
        cols = ["cluster_id", "canonical_url", "n_members", "langs",
                "max_warc_ts", "text_len"]
        return pd.DataFrame(rows, columns=cols)

    return (
        enriched.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(survive, batch_format="pandas")
    )
