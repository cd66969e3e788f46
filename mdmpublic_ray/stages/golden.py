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


# Below this many deduped pages the slim survivorship fields are broadcast
# (ray.put once) and attached in a map — one shuffle (the cluster_id
# groupby) instead of two. Same size-aware plan selection as scoring.
# 128-GiB calibration point, memory-scaled like the dedup winner cap
# (round 4): the slim payload is ~80 B/row, so 5M rows ≈ 400 MB — the
# same budget the winner-broadcast dedup ships. The old hard 200k cap
# pushed the 484k-page scaling corpus onto the two-shuffle join path,
# costing 2.1 s at 16 CPUs and 2.7 s at 4 (measured, round-4 session).
GOLDEN_BROADCAST_THRESHOLD = 5_000_000


def _golden_broadcast_rows() -> int:
    from .util import memory_scaled_cap

    return memory_scaled_cap(GOLDEN_BROADCAST_THRESHOLD, lo=100_000)


# per-worker cache of the broadcast survivorship payload (hash index
# built once per worker, probed per batch — see attach below)
_GOLD_CACHE: dict = {}


def golden_records(
    clusters_ds,
    pages_ds,
    *,
    num_partitions: int | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    broadcast_threshold: int | None = None,
):
    """clusters(url, cluster_id) ⋈ deduped pages → golden records.

    Output: (cluster_id, canonical_url, n_members, langs, max_warc_ts,
    text_len). Uses the bucketed-groupby pattern (see dedup.py) so Python
    overhead is O(buckets), not O(clusters). ``broadcast_threshold=0``
    forces the two-shuffle join path (tests compare both).
    """
    from .util import bucketed_join, default_partitions

    num_partitions = num_partitions or default_partitions()
    if broadcast_threshold is None:
        broadcast_threshold = _golden_broadcast_rows()
    # Project pages to the survivorship fields BEFORE any shuffle: the
    # text column (the bulk of a page row) reduces to its length here, so
    # neither the join nor the cluster groupby ever moves document text
    # (same principle as dropping `html` right after extraction).
    slim = pages_ds.map_batches(
        lambda t: pa.table(
            {
                "purl": t["url"],
                "warc_ts": t["warc_ts"],
                "lang": t["lang"],
                "text_len": pa.compute.cast(
                    pa.compute.utf8_length(t["text"]), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    if broadcast_threshold and pages_ds.count() <= broadcast_threshold:
        import ray

        # Arrow-native broadcast: the payload is the slim table's columns
        # (one driver concat = memcpy, zero to_pylist loops); the attach
        # is a hash lookup (pc.index_in) + takes — all C kernels.
        # materialize + parallel ray.get beats the driver-serial
        # iter_batches stream (see scoring.py broadcast build)
        _m = slim.materialize()
        tbl = pa.concat_tables(
            [b for b in ray.get(_m.to_arrow_refs()) if b.num_rows]
        ).combine_chunks()
        # purl must be unique (pages_ds is the POST-dedup table): a
        # duplicate means the dedup invariant broke upstream and the
        # attach below would fetch an arbitrary duplicate's fields.
        # Fail here with a usable message.
        n_dup = len(tbl) - pa.compute.count_distinct(tbl["purl"]).as_py()
        if n_dup:
            raise ValueError(
                f"golden_records broadcast: pages table has {n_dup} "
                "duplicate url(s) — input must be the deduplicated pages "
                "stage (one row per url)"
            )
        # int64-hash payload, pre-sorted (same treatment as the dedup
        # winner table): the previous per-worker pandas STRING index
        # cost ~3-4 s/worker to build at 3.2M urls plus string-hash
        # probes per batch — golden was 9.7× superlinear 1M → 4M.
        # Per-batch lookup is now hash + ONE searchsorted. Collision
        # posture = engine-wide doc_uid identity (n²/2⁶⁴).
        from ..functions.hashing import hash_string_column

        uh = hash_string_column(tbl["purl"]).view(np.int64)
        order = pa.array(np.argsort(uh, kind="stable"))
        ref = ray.put(
            (
                np.sort(uh, kind="stable"),
                tbl["warc_ts"].combine_chunks().take(order),
                tbl["lang"].combine_chunks().take(order),
                tbl["text_len"].combine_chunks().take(order),
            )
        )

        def attach(t: pa.Table) -> pa.Table:
            import ray as _ray

            from ..functions.hashing import hash_string_column as _hsc

            key = ("golden", ref.hex())
            cached = _GOLD_CACHE.get(key)
            if cached is None:
                cached = _ray.get(ref)
                _GOLD_CACHE.clear()
                _GOLD_CACHE[key] = cached
            uids, ts, lg, tl = cached
            th = _hsc(t["url"]).view(np.int64)
            raw = np.searchsorted(uids, th)
            np.clip(raw, 0, max(uids.size - 1, 0), out=raw)
            # exact-coverage invariant (round-4 advice): every cluster
            # member must exist in the pages payload — a miss previously
            # surfaced as ArrowIndexError from take(-1) (or as silently
            # dropped rows on the join plan). Name the missing urls.
            if uids.size == 0 or not np.array_equal(uids[raw], th):
                bad = (
                    np.ones(th.size, dtype=bool)
                    if uids.size == 0
                    else (uids[raw] != th)
                )
                miss = t["url"].to_pandas()[bad].head(5).tolist()
                raise ValueError(
                    "golden_records broadcast: cluster member url(s) "
                    f"missing from the pages table, e.g. {miss} — "
                    "clusters and pages inputs are out of sync"
                )
            idx = pa.array(raw, pa.int64())
            return pa.table(
                {
                    "url": t["url"],
                    "cluster_id": t["cluster_id"],
                    "warc_ts": ts.take(idx),
                    "lang": lg.take(idx),
                    "text_len": tl.take(idx),
                }
            )

        enriched = clusters_ds.map_batches(attach, batch_format="pyarrow")
    else:
        enriched = bucketed_join(
            clusters_ds, slim, "url", "purl", n_buckets=num_partitions
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = crc32_array(batch["cluster_id"].to_pylist()) % np.uint32(n_buckets)
        return batch.append_column("_bucket", pa.array(b.astype(np.int32)))

    def survive(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized survivorship: one sort + drop_duplicates picks every
        cluster's canonical member at once (a per-cluster Python loop was
        ~0.4 ms/cluster — 8 s for 18k clusters at one bucket width)."""
        cols = ["cluster_id", "canonical_url", "n_members", "langs",
                "max_warc_ts", "text_len"]
        if df.empty:
            return pd.DataFrame(columns=cols)
        # canonical: max warc_ts, tie-break min url → first row per
        # cluster after a stable (warc_ts desc, url asc) sort
        s = df.sort_values(["warc_ts", "url"], ascending=[False, True],
                           kind="mergesort")
        top = s.drop_duplicates(subset=["cluster_id"], keep="first").set_index(
            "cluster_id"
        )
        g = df.groupby("cluster_id", sort=False)
        langs = (
            df[["cluster_id", "lang"]]
            .drop_duplicates()
            .sort_values(["cluster_id", "lang"], kind="mergesort")
            .groupby("cluster_id", sort=False)["lang"]
            .agg(",".join)
        )
        idx = top.index
        out = pd.DataFrame(
            {
                "cluster_id": idx.to_numpy(),
                "canonical_url": top["url"].to_numpy(),
                "n_members": g.size().reindex(idx).to_numpy().astype("int64"),
                "langs": langs.reindex(idx).to_numpy(),
                "max_warc_ts": g["warc_ts"].max().reindex(idx).to_numpy(),
                "text_len": top["text_len"].to_numpy().astype("int64"),
            }
        )
        return out[cols].reset_index(drop=True)

    return (
        enriched.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(survive, batch_format="pandas")
    )
