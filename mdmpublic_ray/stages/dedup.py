"""Deduplication stages: dedup-latest, exact-hash dedup, MinHash-LSH,
SimHash, n-gram-Jaccard near-dup (SURVEY.md §2.6 T5, §2.7 D1-D5).

All wide steps use the **bucketed groupby** pattern: a deterministic
``bucket = crc32(key) % P`` column is added in a vectorized map, then
``groupby("bucket").map_groups`` runs ONE vectorized pandas/pyarrow body
per bucket instead of one Python call per key-group. One shuffle, bounded
Python overhead — this is the shape that survives 10^12 rows (the number
of groups seen by Ray equals P, not the key cardinality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_array

DEFAULT_BUCKETS = 64


def _add_bucket(ds, key: str, n_buckets: int):
    def f(batch: pa.Table) -> pa.Table:
        b = crc32_array(batch[key].to_pylist()) % np.uint32(n_buckets)
        # metadata strip: pandas-stage blocks carry b'pandas' schema
        # metadata, which is unhashable and makes Ray's sort-boundary
        # sampling log "Failed to hash the schemas" (see util.add_bucket)
        return batch.append_column(
            "_bucket", pa.array(b.astype(np.int32))
        ).replace_schema_metadata(None)

    return ds.map_batches(f, batch_format="pyarrow")


# Contested-key routing (see dedup_latest docstring) trades two extra
# passes over the input for shuffling only duplicated keys' rows. That
# wins when input re-reads are cheap relative to shuffle (object-storage
# reads with column pruning on a congested network) and loses locally
# (measured: +10 s on a 60k-page corpus — page-cache reads are as fast as
# the shuffle it avoids). Default OFF; callers with dup-heavy inputs on
# real clusters opt in via ``broadcast_threshold=N``.
CONTESTED_BROADCAST_THRESHOLD = 0

# per-worker cache of the broadcast winner table (see scoring._FEAT_CACHE)
_WINNER_CACHE: dict = {}


def dedup_latest(
    ds,
    key: str = "url",
    ts_col: str = "warc_ts",
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    broadcast_threshold: int = CONTESTED_BROADCAST_THRESHOLD,
    winner_broadcast_rows: int = 0,
):
    """Keep the row with max ``ts_col`` per ``key`` — re-crawled pages keep
    only the newest crawl (SURVEY.md §2.6 T5; the first shuffle of the ER
    pipeline). Deterministic tie-break on equal ts: the row whose remaining
    columns sort last wins (full-column lexicographic sort).

    Physical plan (size-aware): shuffling FULL page rows (html+text) by
    key is the naive path and moves the entire input through the object
    store. Instead: (1) a keys-only aggregate (url → occurrence count +
    max ts, map-side combined) finds the CONTESTED keys — those seen more
    than once; (2) rows of uncontested keys stream through untouched
    (zero shuffle — the common case: most urls have one crawl); (3) only
    contested rows take the bucketed full-row shuffle. When the contested
    set exceeds ``broadcast_threshold`` (can't ship to every task), the
    classic full shuffle runs instead (``broadcast_threshold=0`` forces
    it — tests do).

    ``winner_broadcast_rows`` (opt-in, 0 = off): an even cheaper
    size-aware plan that ELIMINATES the full-row exchange. A keys-only
    shuffle computes each key's winner (max ts + how many rows sit AT
    that max); when the distinct-key count fits the threshold, the
    (key → winner ts) table is broadcast and a pure filter map keeps the
    winning rows where they already live — zero payload bytes through
    the fabric. Keys with >1 row at the max (re-delivered crawls) fall
    back to the full-column-sort shuffle for the classic deterministic
    tie-break, on just those keys' rows. Beyond the threshold (the
    winner table is corpus-sized at web scale — it cannot ship to every
    task) the classic paths below run unchanged. CALLER CONTRACT: the
    input is scanned twice (keys pass + filter pass) — pass a
    materialized or cheap-to-rescan dataset."""
    import pyarrow.compute as pc

    from .util import dataset_arrow_schema, grouped_agg, pruned_scan

    def final(df: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [key, ts_col] + [
            c for c in df.columns if c not in (key, ts_col, "_bucket")
        ]
        df = df.sort_values(sort_cols, kind="mergesort")
        out = df.drop_duplicates(subset=[key], keep="last")
        return out.drop(columns=["_bucket"]) if "_bucket" in out.columns else out

    def full_shuffle(rows_ds):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            # same total order as `final`, so the combiner can never drop
            # the globally-winning row on a ts tie
            sort_cols = [key, ts_col] + [
                c for c in df.columns if c not in (key, ts_col)
            ]
            df = df.sort_values(sort_cols, kind="mergesort")
            return df.drop_duplicates(subset=[key], keep="last")

        bucketed = _add_bucket(rows_ds.map_batches(partial, batch_format="pandas"), key, n_buckets)
        return bucketed.groupby("_bucket").map_groups(final, batch_format="pandas")

    def make_to_input_schema():
        # bound on the DRIVER at the use site (inside map_batches the
        # Dataset API is unavailable), and only on the branches that know
        # data exists: zero-row inputs (incremental-ER empty deltas) have
        # NO schema, and the plain full_shuffle path must work there.
        # pandas round-trips e.g. timestamp[us] → timestamp[ns]; casting
        # the shuffle branch back keeps unions schema-homogeneous.
        base_schema = dataset_arrow_schema(ds)

        def to_input_schema(df: pd.DataFrame) -> pa.Table:
            t = pa.Table.from_pandas(df, preserve_index=False)
            return t.select(base_schema.names).cast(base_schema)

        return to_input_schema

    if winner_broadcast_rows:
        split = dedup_winner_split(
            ds,
            key,
            ts_col,
            n_buckets=n_buckets,
            winner_broadcast_rows=winner_broadcast_rows,
        )
        if split is not None:
            kept, tied = split
            if tied is None:
                return kept
            return kept.union(
                full_shuffle(tied).map_batches(
                    make_to_input_schema(), batch_format="pandas"
                )
            )
        # winner table too big to broadcast → classic paths below


    if not broadcast_threshold:
        return full_shuffle(ds)

    # keys-only pass: url → (n occurrences, max ts); combiner inside
    # map_batches, so the shuffle carries ≤ |distinct keys per batch| rows
    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False, as_index=False)
        agg = g.agg(_n=(ts_col, "size"), _mx=(ts_col, "max"))
        return agg

    stats = grouped_agg(
        pruned_scan(ds, [key, ts_col]).map_batches(key_partial, batch_format="pandas"),
        [key],
        {"_n": ("_n", "sum"), "_mx": ("_mx", "max")},
        n_buckets=n_buckets,
    )
    contested_tbl = stats.map_batches(
        lambda t: t.filter(pc.greater(t["_n"], 1)).select([key]),
        batch_format="pyarrow",
    ).materialize()
    n_contested = contested_tbl.count()
    if n_contested > broadcast_threshold:
        return full_shuffle(ds)
    if n_contested == 0:
        return ds

    import ray

    chunks = [b[key] for b in contested_tbl.iter_batches(batch_format="pyarrow")]
    value_set = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in chunks]) if chunks else pa.array([], pa.string())
    ref = ray.put(value_set)

    class SplitFilter:
        def __init__(self, ref, keep_contested: bool):
            import ray as _ray

            self.value_set = _ray.get(ref)
            self.keep = keep_contested

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[key], value_set=self.value_set)
            if not self.keep:
                mask = pc.invert(mask)
            return t.filter(mask)

    def split(keep_contested: bool):
        return ds.map_batches(
            SplitFilter,
            fn_constructor_args=(ref, keep_contested),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )

    # the shuffle branch yields pandas blocks; the pass-through branch is
    # arrow — unify via to_input_schema (defined above)
    deduped_contested = full_shuffle(split(True)).map_batches(
        make_to_input_schema(), batch_format="pandas"
    )
    return split(False).union(deduped_contested)


def dedup_winner_split(
    ds,
    key: str = "url",
    ts_col: str = "warc_ts",
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    winner_broadcast_rows: int,
):
    """Size-aware winner-broadcast dedup SPLIT (the physical core of
    ``dedup_latest``'s cheapest plan, exposed so callers can place work
    BETWEEN the filter and the tie-break — the ER pipeline runs HTML→text
    extraction only on surviving rows).

    A keys-only bucketed aggregate over ``select_columns([key, ts_col])``
    (a column-pruned read — payload columns never move) computes each
    key's winner ts and how many rows sit AT that max. When the distinct
    -key count fits ``winner_broadcast_rows``, the winner table ships
    once via the object store and:

    - ``kept``: rows that are their key's UNIQUE winner, selected by a
      pure filter map where they already live — zero payload bytes
      through the fabric;
    - ``tied``: the raw rows of keys with >1 row at the max ts (rare:
      re-delivered crawls), or ``None`` when there are none. The caller
      owns the deterministic tie-break (``dedup_latest`` full-column
      sort semantics) — on just these rows.

    Returns ``None`` when the winner table exceeds the threshold (at web
    scale the key set is corpus-sized and cannot ship to every task) —
    callers fall back to a shuffle plan. CALLER CONTRACT: ``ds`` is
    scanned twice (keys pass + filter pass) — pass a materialized or
    cheap-to-rescan dataset (a parquet read with column pruning is).

    Physical note: the winner table must fit the broadcast budget anyway
    (that is this plan's admission test), so when the map-side partial
    volume is also driver-sized the keys pass needs NO shuffle round —
    the per-block partials stream to the driver and combine there
    (``winner_final``), exactly the build the plan already does after
    the shuffle. The collection aborts to the keys-shuffle path the
    moment the pulled rows exceed a cap proportional to the broadcast
    budget, so a corpus-sized key set never lands on the driver. At a
    242k-page corpus this removes ~1.5-2 s of width-invariant shuffle
    latency from the pipeline's first stage at EVERY width (it is part
    of the single-box floor F in BASELINE.md §3/§5)."""
    import pyarrow.compute as pc

    from ..functions.hashing import hash_string_column
    from .util import bucketed_map_groups, pruned_scan

    # The winner machinery is keyed on the vectorized 64-bit url hash
    # (``hash_utf8_flat`` off the Arrow buffers), NOT url strings: at the
    # 4M-page soak the string-keyed version spent ~12 s in a
    # driver-SERIAL pandas string combine plus ~7 s of per-worker string
    # hash-index builds and per-batch string probes; int64 keys make the
    # combine a C-speed groupby and the per-batch probe one searchsorted.
    # Collision posture: identical to the engine-wide ``doc_uid``
    # identity (64-bit url hashes key blocking, pairs, scoring and the
    # feature store) — ~n²/2⁶⁴, nil at sandbox scale, two int64 columns
    # at a 10^12-document deployment.
    def winner_partial_arrow(t: pa.Table) -> pa.Table:
        uh = hash_string_column(t[key]).view(np.int64)
        df = pd.DataFrame(
            {"_uh": uh, "_ts": t[ts_col].to_numpy(zero_copy_only=False)}
        )
        mx = df.groupby("_uh", sort=False)["_ts"].max().rename("_mx")
        j = df.merge(mx, left_on="_uh", right_index=True)
        n = j[j["_ts"] == j["_mx"]].groupby("_uh", sort=False).size()
        out = pd.DataFrame(
            {"_uh": mx.index, "_mx": mx.to_numpy(),
             "_n_at": n.reindex(mx.index).to_numpy().astype("int64")}
        )
        # arrow-out so the materialized blocks pull zero-copy via
        # to_arrow_refs (pandas blocks would convert at pull time)
        return pa.Table.from_pandas(out, preserve_index=False)

    def winner_final(df: pd.DataFrame) -> pd.DataFrame:
        # combine partials: the true max across batches; counts only
        # from partials that saw that max
        mx = df.groupby("_uh", sort=False)["_mx"].max().rename("_tmx")
        j = df.merge(mx, left_on="_uh", right_index=True)
        n = j[j["_mx"] == j["_tmx"]].groupby("_uh", sort=False)["_n_at"].sum()
        return pd.DataFrame(
            {"_uh": mx.index, "_mx": mx.to_numpy(),
             "_n_at": n.reindex(mx.index).to_numpy().astype("int64")}
        )

    partials = pruned_scan(ds, [key, ts_col]).map_batches(
        winner_partial_arrow, batch_format="pyarrow"
    )

    # shuffle-free keys pass: materialize the per-block partials (they
    # stay in plasma), check the total row count from METADATA (free),
    # then pull the blocks in one parallel ray.get — measured 0.09 s vs
    # 0.47 s for the equivalent iter_batches stream at 242k pages (the
    # iterator's per-batch pandas conversion + prefetch machinery is
    # driver-serial). Pull volume = sum of per-block distinct keys
    # (<= input rows; ~1.3x the winner table on real crawls) — the same
    # order as the driver pull the broadcast build does below anyway.
    # Past the cap (pathological block-overlap or a corpus-sized key
    # set) nothing is pulled at all: the bucketed keys-only shuffle
    # computes the winner table instead, preserving every regime's plan.
    import ray

    cap = max(2 * winner_broadcast_rows, 1 << 20)
    partials = partials.materialize()
    pulled = partials.count()
    comb: pd.DataFrame | None = None
    if 0 < pulled <= cap:
        t = pa.concat_tables(
            [b for b in ray.get(partials.to_arrow_refs()) if b.num_rows]
        )
        comb = winner_final(t.to_pandas())
    elif pulled:
        # medium regime: partial volume beyond the driver cap but the
        # key set may still fit the broadcast budget — the classic
        # keys-only bucketed shuffle computes the winner table.
        winners = bucketed_map_groups(
            partials, "_uh", winner_final, n_buckets=n_buckets
        ).materialize()
        n_keys = winners.count()
        if not (0 < n_keys <= winner_broadcast_rows):
            return None
        comb = pd.concat(
            [b for b in winners.iter_batches(batch_format="pandas")],
            ignore_index=True,
        )
    if comb is None or not (0 < len(comb) <= winner_broadcast_rows):
        return None

    import ray

    # sorted int64 broadcast payload: per-batch lookup is ONE
    # searchsorted — no per-worker hash-index build at all (the 4M soak
    # paid ~7 s of per-worker pandas string-index builds + string
    # probes under the previous string-keyed payload)
    order = np.argsort(comb["_uh"].to_numpy(), kind="stable")
    uh_sorted = comb["_uh"].to_numpy()[order]
    mx_sorted = comb["_mx"].to_numpy()[order]
    multi_uh = np.sort(
        comb["_uh"].to_numpy()[comb["_n_at"].to_numpy() > 1]
    )
    wref = ray.put(
        (uh_sorted, mx_sorted, multi_uh if multi_uh.size else None)
    )

    def _probe(t: pa.Table):
        import ray as _ray

        k = wref.hex()
        if k not in _WINNER_CACHE:
            _WINNER_CACHE.clear()
            _WINNER_CACHE[k] = _ray.get(wref)
        uids, mxs, multi_arr = _WINNER_CACHE[k]
        uh = hash_string_column(t[key]).view(np.int64)
        pos = np.searchsorted(uids, uh)
        np.clip(pos, 0, max(uids.size - 1, 0), out=pos)
        if uids.size == 0 or not np.array_equal(uids[pos], uh):
            # every key was just seen by the keys pass over the same
            # dataset — a miss means the two passes saw different data
            raise ValueError(
                "dedup winner probe miss: key absent from the winner "
                "table — input changed between the keys and filter passes"
            )
        return uh, pos, mxs, multi_arr

    def keep_winners(t: pa.Table) -> pa.Table:
        uh, pos, mxs, multi_arr = _probe(t)
        m = t[ts_col].to_numpy(zero_copy_only=False) == mxs[pos]
        if multi_arr is not None:
            mp = np.searchsorted(multi_arr, uh)
            np.clip(mp, 0, multi_arr.size - 1, out=mp)
            m &= multi_arr[mp] != uh
        return t.filter(pa.array(m))

    kept = ds.map_batches(keep_winners, batch_format="pyarrow")
    if multi_uh.size == 0:
        return kept, None

    def only_multi(t: pa.Table) -> pa.Table:
        uh, pos, mxs, multi_arr = _probe(t)
        mp = np.searchsorted(multi_arr, uh)
        np.clip(mp, 0, multi_arr.size - 1, out=mp)
        return t.filter(pa.array(multi_arr[mp] == uh))

    tied = ds.map_batches(only_multi, batch_format="pyarrow")
    return kept, tied


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *, n_buckets: int = DEFAULT_BUCKETS):
    """Exact-content dedup: md5(text) hash-partition + per-group min id
    (SURVEY.md §2.7 D3/D4; manifest-skip analog ``s3sync.sh:47-51``).

    Output: one row per distinct text — the one with the smallest id —
    plus ``dup_count`` (how many rows shared the content).
    """
    from ..functions.hashing import content_digest

    def add_hash(batch: pa.Table) -> pa.Table:
        h = pa.array([content_digest(t) for t in batch[text_col].to_pylist()])
        return batch.append_column("_h", h)

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col], kind="mergesort")
        counts = df.groupby("_h", sort=False)[id_col].transform("size")
        df = df.assign(dup_count=counts.astype("int64"))
        out = df.drop_duplicates(subset=["_h"], keep="first")
        return out.drop(columns=["_bucket", "_h"])

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    ds = _add_bucket(ds, "_h", n_buckets)
    return ds.groupby("_bucket").map_groups(keep_min, batch_format="pandas")
