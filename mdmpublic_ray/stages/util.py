"""Shared wide-op building blocks: bucketed groupby and partial (combiner)
aggregation — the two patterns that keep shuffles scalable (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_array

DEFAULT_BUCKETS = 64


def as_arrow_type(t) -> pa.DataType:
    """ray.data Schema types are pyarrow types for arrow-derived datasets
    but numpy dtypes / Python classes for pandas-derived ones — normalize
    to a pyarrow type."""
    if isinstance(t, pa.DataType):
        return t
    if t is str:
        return pa.string()
    if t is bytes:
        return pa.binary()
    dt = np.dtype(t)
    if dt == np.dtype(object):
        # pandas-produced blocks report strings as object dtype
        return pa.string()
    return pa.from_numpy_dtype(dt)


def dataset_arrow_schema(ds) -> pa.Schema:
    """Best-effort pyarrow schema of a ray Dataset."""
    s = ds.schema()
    return pa.schema([(n, as_arrow_type(t)) for n, t in zip(s.names, s.types)])


from ray.data.datasource import Datasource as _RayDatasource


class RowGroupParquetDatasource(_RayDatasource):
    """Parquet source that issues one read task per ROW GROUP (chunked
    to the requested parallelism) instead of one per file.

    Ray 2.49's ``ParquetDatasource.get_read_tasks`` splits tasks by FILE
    fragment — a single 430 MB file is always ONE read task no matter
    the ``override_num_blocks`` (the split happens AFTER the serial
    decode, in ``SplitBlocks``). That serializes the whole decode onto
    one core: measured 2.1 s flat at 4 and 32 CPUs on the 242k-page
    scaling corpus — the largest single width-invariant term in the
    pipeline's floor F. Real 100 TB inputs are thousands of files and
    never hit this; single- or few-file inputs (test corpora, bench
    runs, small user datasets) do.

    Scope guards (``widen_scan`` only engages it under these): local
    filesystem, no hive partition columns in play, no row filter, no
    block UDF. ``columns=`` prunes at the read exactly like
    ``read_parquet(columns=...)``; per-row-group sizes come from parquet
    metadata so the executor sees real size estimates.
    """

    def __init__(self, paths: list[str], *, columns: list[str] | None = None):
        import pyarrow.parquet as pq

        self._paths = list(paths)
        self._columns = list(columns) if columns is not None else None
        self._frags: list[tuple[str, int, int, int]] = []  # path, rg, rows, bytes
        self._schema: pa.Schema | None = None
        for p in self._paths:
            f = pq.ParquetFile(p)
            md = f.metadata
            sch = f.schema_arrow
            if self._columns is not None:
                sch = pa.schema([sch.field(c) for c in self._columns])
            if self._schema is None:
                self._schema = sch
            names = (
                self._columns
                if self._columns is not None
                else [md.schema.column(j).name for j in range(md.num_columns)]
            )
            all_names = [md.schema.column(j).name for j in range(md.num_columns)]
            sel = [all_names.index(c) for c in names]
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                nbytes = sum(rg.column(j).total_uncompressed_size for j in sel)
                self._frags.append((p, i, rg.num_rows, nbytes))

    # --- ray.data.Datasource protocol (duck-typed; the abstract base
    # adds nothing we need and keeps this import-light) ---
    def get_name(self) -> str:
        return "RowGroupParquet"

    @property
    def supports_distributed_reads(self) -> bool:
        return False  # local-fs paths only (scope guard above)

    def estimate_inmemory_data_size(self):
        return sum(b for _, _, _, b in self._frags)

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        n = max(1, min(parallelism, len(self._frags)))
        cols = self._columns
        chunks = np.array_split(np.arange(len(self._frags)), n)
        tasks = []
        for idx in chunks:
            if len(idx) == 0:
                continue
            part = [self._frags[i] for i in idx]

            def read_fn(part=part, cols=cols):
                import pyarrow.parquet as pq

                by_path: dict[str, list[int]] = {}
                for p, rg, _, _ in part:
                    by_path.setdefault(p, []).append(rg)
                for p, rgs in by_path.items():
                    yield pq.ParquetFile(p).read_row_groups(
                        rgs, columns=cols, use_threads=False
                    )

            meta = BlockMetadata(
                num_rows=sum(r for _, _, r, _ in part),
                size_bytes=sum(b for _, _, _, b in part),
                exec_stats=None,
                input_files=sorted({p for p, _, _, _ in part}),
            )
            tasks.append(ReadTask(read_fn, meta, schema=self._schema))
        return tasks


def _is_local_fs(fs) -> bool:
    try:
        import pyarrow.fs as pafs

        return isinstance(fs, pafs.LocalFileSystem)
    except Exception:
        return False


_PLAN_API_OK: bool | None = None


def _plan_api_ok() -> bool:
    """Memoized loud capability check for the private plan-inspection
    API (see _compat.check_ray_plan_api — round-3 review item #9)."""
    global _PLAN_API_OK
    if _PLAN_API_OK is None:
        from .._compat import check_ray_plan_api

        _PLAN_API_OK = check_ray_plan_api()
    return _PLAN_API_OK


def _rg_read(paths, columns, n_tasks):
    """``read_datasource`` over :class:`RowGroupParquetDatasource` with
    one task per row group (capped). Raises if any path/column is
    unreadable — callers fall back."""
    import ray.data as rd

    src = RowGroupParquetDatasource(paths, columns=columns)
    n = max(1, min(len(src._frags), max(int(n_tasks), 1), 512))
    return rd.read_datasource(src, override_num_blocks=n)


def pruned_scan(ds, cols: list[str]):
    """Column-pruned view of ``ds``, pushing the projection into the
    parquet READ when provably safe.

    Ray 2.49 has NO projection pushdown: ``read_parquet(path)
    .select_columns(["a"])`` decodes EVERY column of every row group and
    drops the rest in a Project task afterwards (measured: 11.7 s vs
    0.15 s for a 2-of-5-column scan of a 434 MB table whose payload
    column dominates decode). Keys-only passes over payload-bearing
    tables (dedup winner scan, hot-host scan, CC node scan) would pay
    the full decode every time.

    Fast path — re-issue ``read_parquet(resolved_fragments,
    columns=cols)`` — only when the logical plan is exactly a parquet
    Read, optionally under pure column-SELECTION Projects (no renames,
    no expressions), with no block UDF, no row filter, no include_paths
    and no hive partition columns (partition VALUES live in paths, not
    files — a re-read would lose them). Anything else falls back to
    ``select_columns`` (transformed rows are not re-derivable from the
    files). Internal-plan inspection is wrapped defensively: any
    surprise shape falls back."""
    if not _plan_api_ok():
        return ds.select_columns(cols)
    try:
        dag = ds._logical_plan.dag
        visible: set | None = None
        while type(dag).__name__ == "Project":
            if (
                getattr(dag, "cols_rename", None)
                or getattr(dag, "exprs", None)
                or not getattr(dag, "cols", None)
            ):
                return ds.select_columns(cols)
            sel = set(dag.cols)
            visible = sel if visible is None else (visible & sel)
            dag = dag.input_dependency
        if type(dag).__name__ != "Read":
            return ds.select_columns(cols)
        from ray.data._internal.datasource.parquet_datasource import (
            ParquetDatasource,
        )

        dsrc = dag._datasource
        if isinstance(dsrc, RowGroupParquetDatasource):
            # a widened row-group read: re-issue it with the projection
            # pushed down (same path the plain parquet fast path takes)
            have = dsrc._columns
            if have is not None and not set(cols) <= set(have):
                return ds.select_columns(cols)
            if visible is not None and not set(cols) <= visible:
                return ds.select_columns(cols)
            return _rg_read(dsrc._paths, list(cols), len(dsrc._frags))
        if not isinstance(dsrc, ParquetDatasource):
            return ds.select_columns(cols)
        if (
            dsrc._block_udf is not None
            or getattr(dsrc, "_include_paths", False)
            or (getattr(dsrc, "_to_batches_kwargs", None) or {}).get("filter")
            is not None
            or getattr(dsrc, "_partition_columns", None)
        ):
            return ds.select_columns(cols)
        data_cols = getattr(dsrc, "_data_columns", None)
        if data_cols is not None and not set(cols) <= set(data_cols):
            return ds.select_columns(cols)
        if visible is not None and not set(cols) <= visible:
            return ds.select_columns(cols)
        paths = list(dsrc._pq_paths)
        # the re-read keeps the DEFAULT hive partitioning: ray 2.49's
        # ParquetDatasource raises UnboundLocalError on
        # (columns=..., partitioning=None). With columns= given the
        # output carries exactly the requested columns, so hive path
        # parsing cannot ADD phantom columns — but a requested column
        # whose name collides with a key=value path segment would be
        # sourced from the PATH instead of the file: fall back.
        lower = {c for c in cols}
        for p in paths:
            for seg in p.split("/"):
                if "=" in seg and seg.split("=", 1)[0] in lower:
                    return ds.select_columns(cols)
        import ray.data as rd

        return rd.read_parquet(
            paths,
            columns=list(cols),
            filesystem=dsrc._filesystem,
        )
    except Exception as exc:
        from .._compat import warn_once

        warn_once(
            "pruned-scan-fallback",
            f"pruned_scan: plan inspection failed ({exc!r}); falling "
            "back to select_columns (correct, but decodes every column)",
        )
        return ds.select_columns(cols)


def widen_scan(ds, min_blocks: int):
    """Re-issue an under-parallelized parquet READ with enough read
    tasks to feed the cluster, when provably safe (same plan-inspection
    contract as :func:`pruned_scan`).

    Ray sizes read tasks to ``target_max_block_size`` (128 MB), so a
    compute-heavy map fused onto the read of a FEW large files runs at
    file/row-group width, not cluster width — the ER pipeline's
    HTML→text extraction serialized onto ~8 tasks of a single 434 MB
    file (3.4 s scan → 1.5 s with one task per row group). Real inputs
    are thousands of files and never hit this; the fix matters for the
    single-file test corpora and any small-file-count read.

    Only widens: a read over ``>= min_blocks`` files is returned
    unchanged (override_num_blocks would COALESCE it). Projections
    stacked on the read are preserved via ``columns=``. Any other plan
    shape (or inspection surprise) returns ``ds`` unchanged.
    """
    if not _plan_api_ok():
        return ds
    try:
        dag = ds._logical_plan.dag
        visible: set | None = None
        while type(dag).__name__ == "Project":
            if (
                getattr(dag, "cols_rename", None)
                or getattr(dag, "exprs", None)
                or not getattr(dag, "cols", None)
            ):
                return ds
            sel = set(dag.cols)
            visible = sel if visible is None else (visible & sel)
            dag = dag.input_dependency
        if type(dag).__name__ != "Read":
            return ds
        from ray.data._internal.datasource.parquet_datasource import (
            ParquetDatasource,
        )

        dsrc = dag._datasource
        if not isinstance(dsrc, ParquetDatasource):
            return ds
        if (
            dsrc._block_udf is not None
            or getattr(dsrc, "_include_paths", False)
            or (getattr(dsrc, "_to_batches_kwargs", None) or {}).get("filter")
            is not None
            or getattr(dsrc, "_partition_columns", None)
        ):
            return ds
        paths = list(dsrc._pq_paths)
        if len(paths) >= min_blocks:
            return ds
        if getattr(dsrc, "_filesystem", None) is None or _is_local_fs(
            dsrc._filesystem
        ):
            # row-group-parallel read: the ONLY way to widen past file
            # count in ray 2.49 (override_num_blocks on a 1-file read
            # still decodes in ONE task; SplitBlocks splits after the
            # serial decode — see RowGroupParquetDatasource)
            try:
                cols2 = None
                if visible is not None:
                    cols2 = sorted(visible)
                else:
                    existing = getattr(dsrc, "_data_columns", None)
                    cols2 = list(existing) if existing is not None else None
                if cols2 is not None:
                    for p in paths:
                        for seg in p.split("/"):
                            if "=" in seg and seg.split("=", 1)[0] in set(cols2):
                                raise ValueError("hive column collision")
                return _rg_read(paths, cols2, min_blocks)
            except Exception:
                pass  # fall through to the override_num_blocks re-issue
        cols = None
        if visible is not None:
            data_cols = getattr(dsrc, "_data_columns", None)
            cols = sorted(visible)
            if data_cols is not None and not set(cols) <= set(data_cols):
                return ds
            # hive key=value path-segment collision: see pruned_scan
            for p in paths:
                for seg in p.split("/"):
                    if "=" in seg and seg.split("=", 1)[0] in visible:
                        return ds
        else:
            existing = getattr(dsrc, "_data_columns", None)
            cols = list(existing) if existing is not None else None
        import ray.data as rd

        return rd.read_parquet(
            paths,
            columns=cols,
            filesystem=dsrc._filesystem,
            override_num_blocks=min_blocks,
        )
    except Exception as exc:
        from .._compat import warn_once

        warn_once(
            "widen-scan-fallback",
            f"widen_scan: plan inspection failed ({exc!r}); read stays "
            "at file width (correct, but serializes few-file inputs)",
        )
        return ds


def default_partitions(cap: int = 32) -> int:
    """Shuffle-partition count sized to the cluster: Ray's hash-shuffle
    join spawns one aggregator actor per partition, so partitions ≫ CPUs
    just buys actor-startup overhead (measured: P=32 join ≈ 3× slower
    than P=8 on an 8-CPU node for small inputs). At real scale callers
    pass an explicit count sized to data volume instead."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus))


def default_actor_pool(min_actors: int = 1) -> tuple[int, int]:
    """Actor-pool concurrency sized to the CLUSTER: (min, total CPUs).
    A fixed (2, 8) cap silently serializes a 32-CPU node to 8 workers —
    the anti-scaling bug the first scaling bench exposed (efficiency
    0.23: 32 CPUs no faster than 8). Ray autoscales the pool between the
    bounds, so idle actors cost nothing on small inputs."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (min_actors, max(4, cpus))


def adaptive_partitions(n_rows: int, cap: int, *, rows_per_partition: int = 50_000) -> int:
    """Shuffle width sized to the DATA, bounded by the cluster cap: a
    6k-row label table shuffled 32 ways is pure latency (32 groups × 3
    shuffles × N rounds of near-empty tasks), while a 10^9-row table gets
    the full cap. Callers pass a count they already have (materialized
    stage counts are free)."""
    return max(2, min(cap, n_rows // rows_per_partition + 1))


def add_bucket(ds, key: str, n_buckets: int = DEFAULT_BUCKETS, out: str = "_bucket"):
    """Deterministic bucket column from a string or integer key column."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if pa.types.is_integer(col.type):
            b = (col.to_numpy(zero_copy_only=False).astype(np.int64) % n_buckets).astype(
                np.int32
            )
        else:
            b = (crc32_array(col.to_pylist()) % np.uint32(n_buckets)).astype(np.int32)
        # strip schema metadata: blocks that passed a pandas-format stage
        # carry b'pandas' metadata, which makes pa.Schema UNHASHABLE and
        # trips Ray's sort-boundary sampling into logging "Failed to hash
        # the schemas" on every downstream groupby shuffle
        return batch.append_column(out, pa.array(b)).replace_schema_metadata(None)

    return ds.map_batches(f, batch_format="pyarrow")


def bucketed_map_groups(ds, key: str, fn, *, n_buckets: int = DEFAULT_BUCKETS):
    """One shuffle, O(n_buckets) Python calls: ``fn`` receives the whole
    bucket as a pandas DataFrame (all rows whose key hashes to the bucket)
    and must handle per-key grouping itself (vectorized pandas groupby).
    The ``_bucket`` column is already dropped when ``fn`` runs."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=["_bucket"]))

    return add_bucket(ds, key, n_buckets).groupby("_bucket").map_groups(
        run, batch_format="pandas"
    )


def partial_sum_groupby(ds, keys: list[str], sums: dict[str, str], count_as: str | None):
    """Pre-aggregated grouped sum/count (map-side combine → small shuffle).

    ``sums``: {input_col: output_name} summed per group; ``count_as``: name
    for the per-group row count (None to skip). Per-batch pandas partials
    collapse each batch to ≤ |distinct keys in batch| rows BEFORE the
    groupby shuffle — at web scale this is the difference between shuffling
    10^12 rows and shuffling |keys| × #blocks rows.

    The final combine is a ``bucketed_map_groups`` over the first key
    (pandas sum per bucket), not ``Dataset.groupby().aggregate(Sum)``:
    Ray 2.49's hash-shuffle aggregate spins up aggregator ACTORS per
    call (~4 s fixed latency measured on a 20k-row combined set), while
    the sort-based map_groups path is pure tasks. Same single shuffle,
    same result; different keys may share a bucket, so the per-bucket
    pandas groupby runs over the FULL key list."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False)
        if sums:
            agg = g.agg(**{out: (src, "sum") for src, out in sums.items()})
            if count_as:
                agg[count_as] = g.size()["size"].to_numpy()
        else:
            agg = g.size().rename(columns={"size": count_as})
        return agg

    out_cols = list(sums.values()) + ([count_as] if count_as else [])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False)
        return g.agg(**{c: (c, "sum") for c in out_cols})

    combined = ds.map_batches(partial, batch_format="pandas")
    return bucketed_map_groups(combined, keys[0], final)


def grouped_agg(
    ds,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    *,
    n_buckets: int = DEFAULT_BUCKETS,
):
    """Grouped aggregation via one bucketed sort-shuffle + vectorized
    pandas per bucket — the engine's replacement for
    ``Dataset.groupby().aggregate(...)``, whose Ray 2.49 hash-shuffle
    implementation spins up aggregator ACTORS per call (~1-4 s fixed
    latency measured even on 20k-row inputs; pure-task map_groups is
    3-4× faster at bench scale and identical in shuffle shape).

    ``spec``: {out_col: (src_col, op)} with pandas-named ops ("sum",
    "min", "max", "count", ...). NOT pre-combined — callers whose rows
    per key are huge should map-side combine first (or use
    ``partial_sum_groupby`` for sums)."""

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False)
        return g.agg(**{out: (src, op) for out, (src, op) in spec.items()})

    return bucketed_map_groups(ds, keys[0], agg, n_buckets=n_buckets)


def bucketed_join(
    left,
    right,
    left_on: str,
    right_on: str,
    *,
    how: str = "inner",
    n_buckets: int = DEFAULT_BUCKETS,
    hot_keys=None,
    hot_salt: int = 8,
):
    """Partitioned hash join built from union + bucketed groupby — the
    engine's standard join.

    Why not ``Dataset.join``: Ray 2.49's hash-shuffle join crashes when a
    partition receives zero rows from one side (the empty partition loses
    its schema and ``pyarrow.Table.join`` raises "No match ... on left
    side"), which reliably happens for small or skewed inputs. This
    implementation is the portable pattern instead: tag each side, give
    both the SAME unified schema (missing columns null-typed), add
    ``bucket = crc32(key) % P``, one ``groupby(bucket)`` shuffle, then a
    vectorized ``pandas.merge`` per bucket. O(P) Python calls; payload
    columns (binary sketches included) ride through Arrow untouched.

    ``how``: "inner", "left" (unmatched left rows kept with nulls) or
    "outer" (full outer: unmatched rows of BOTH sides kept). Key columns
    must be string or integer; output columns = left's then right's
    (minus ``right_on``). For "outer" the join key survives as the left
    key column even for right-only rows.

    ``hot_keys``: optional set of join-key values (any type; compared as
    strings) whose rows would overwhelm a single bucket — the skewed-key
    treatment of the blocking stage (``blocking.py`` hot-host salting)
    generalized to joins. Each hot LEFT row lands in one of ``hot_salt``
    sub-buckets; each hot RIGHT row is REPLICATED into all of them, so
    every sub-bucket can join locally. The joined row SET is unchanged —
    only the partitioning spreads. Inner/left joins only ("outer" would
    emit an unmatched hot right row once per replica).
    """
    import pyarrow as _pa

    hotset = {str(k) for k in hot_keys} if hot_keys else None
    if hotset and how == "outer":
        raise ValueError("hot_keys salting supports how='inner'/'left' only")
    if hotset and hot_salt < 2:
        raise ValueError("hot_salt must be >= 2")
    # Sub-buckets use (base + sub) % n_buckets with sub in [0, hot_salt):
    # consecutive residues are guaranteed distinct as long as
    # hot_salt <= n_buckets, so no two replicas of one hot right row can
    # land in the same bucket (a multiplicative spread like sub*GOLD can
    # collide mod n_buckets and would duplicate joined rows).
    hot_salt = min(hot_salt, n_buckets)

    lschema = left.schema()  # ray.data Schema wrapper: .names + .types
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != right_on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"bucketed_join column collision: {overlap}")
    ltypes = {c: as_arrow_type(t) for c, t in zip(lschema.names, lschema.types)}
    rtypes = {
        c: as_arrow_type(t) for c, t in zip(rschema.names, rschema.types) if c != right_on
    }
    all_cols = lcols + rcols

    def tag(side_is_left: bool):
        def f(batch: _pa.Table) -> _pa.Table:
            n = batch.num_rows
            cols = {}
            for c in all_cols:
                want = ltypes.get(c) or rtypes.get(c)
                if (side_is_left and c in ltypes) or (not side_is_left and c in rtypes):
                    col = batch[c]
                    if col.type != want:
                        # an EMPTY pandas-derived block reports object
                        # columns as Arrow null type; pa.Table.join
                        # rejects null-typed non-key fields even at 0
                        # rows — normalize every block to the unified
                        # schema up front
                        col = _pa.compute.cast(col, want)
                    cols[c] = col
                else:
                    cols[c] = _pa.nulls(n, want)
            key = batch[left_on if side_is_left else right_on]
            cols["_jk"] = _pa.compute.cast(key, _pa.string())
            cols["_side"] = _pa.array(
                np.zeros(n, dtype=np.int8) if side_is_left else np.ones(n, dtype=np.int8)
            )
            t = _pa.table(cols)
            jk_list = t["_jk"].to_pylist()
            base = crc32_array(jk_list)
            if hotset:
                hot = np.fromiter((k in hotset for k in jk_list), dtype=bool, count=n)
                if side_is_left:
                    # spread hot left rows round-robin over sub-buckets
                    # (any assignment is correct: every sub-bucket holds
                    # all hot right rows)
                    sub = (np.arange(n, dtype=np.uint32) % np.uint32(hot_salt))
                    b = np.where(hot, (base + sub), base) % np.uint32(n_buckets)
                    return t.append_column("_bucket", _pa.array(b.astype(np.int32)))
                # replicate hot right rows into every sub-bucket
                cold_idx = np.nonzero(~hot)[0]
                hot_idx = np.nonzero(hot)[0]
                b_cold = (base[cold_idx] % np.uint32(n_buckets)).astype(np.int32)
                parts = [
                    t.take(_pa.array(cold_idx)).append_column(
                        "_bucket", _pa.array(b_cold)
                    )
                ]
                if len(hot_idx):
                    rep = np.repeat(hot_idx, hot_salt)
                    sub = np.tile(
                        np.arange(hot_salt, dtype=np.uint32), len(hot_idx)
                    )
                    b_hot = (
                        (np.repeat(base[hot_idx], hot_salt) + sub)
                        % np.uint32(n_buckets)
                    ).astype(np.int32)
                    parts.append(
                        t.take(_pa.array(rep)).append_column(
                            "_bucket", _pa.array(b_hot)
                        )
                    )
                return _pa.concat_tables(parts)
            b = base % np.uint32(n_buckets)
            return t.append_column("_bucket", _pa.array(b.astype(np.int32)))

        return f

    tagged = left.map_batches(tag(True), batch_format="pyarrow").union(
        right.map_batches(tag(False), batch_format="pyarrow")
    )

    out_schema = _pa.schema([(c, ltypes.get(c) or rtypes.get(c)) for c in all_cols])

    def strip(t: _pa.Table) -> _pa.Table:
        """Per-bucket hash join, PURE ARROW (``pyarrow.Table.join``).

        Never a pandas round-trip: the tagged union has nulls in the
        other side's columns, and pandas silently promotes int64-with-
        nulls to float64 — which ROUNDS values beyond 2^53 (64-bit doc
        uids land at multiples of 512, silently corrupting join keys
        downstream). Arrow preserves types and nulls exactly and its
        hash join is faster than pandas merge anyway."""
        import pyarrow.compute as _pc

        # Normalize null-typed columns HERE, after the shuffle: a group
        # bucket that received rows from only one side has all-null
        # other-side columns, and the sort's pandas round-trip erases
        # their declared type (object-all-None → Arrow null type), which
        # pa.Table.join rejects for non-key fields. Casting an all-null
        # column to its schema type is always valid.
        for idx, name in enumerate(t.schema.names):
            want = ltypes.get(name) or rtypes.get(name)
            if want is not None and _pa.types.is_null(t.schema.field(idx).type):
                t = t.set_column(idx, name, _pc.cast(t[name], want))

        side = t["_side"]
        lf = t.filter(_pc.equal(side, 0)).select(lcols + ["_jk"])
        rt = t.filter(_pc.equal(side, 1)).select(rcols + ["_jk"])
        jt = {"inner": "inner", "left": "left outer", "outer": "full outer"}[how]
        out = lf.join(rt, keys=["_jk"], join_type=jt)
        if how == "outer" and left_on in lcols:
            # right-only rows have a null left key column; recover it from
            # the join key so the output key is total
            key_t = out_schema.field(left_on).type
            out = out.set_column(
                out.schema.get_field_index(left_on),
                left_on,
                _pc.coalesce(out[left_on], _pc.cast(out["_jk"], key_t)),
            )
        out = out.select(all_cols)
        return out.cast(out_schema)

    def run(df: _pa.Table) -> _pa.Table:
        return strip(df.drop_columns(["_bucket"]))

    return tagged.groupby("_bucket").map_groups(run, batch_format="pyarrow")


def cents(col, scale: int = 100):
    """Exact fixed-point encoding for float money columns (pyarrow array →
    int64). Sums of these are integers ⇒ bit-identical across any
    execution order AND against the DuckDB oracle — see queries.py."""
    import pyarrow.compute as pc

    return pc.cast(pc.round(pc.multiply(col, float(scale))), pa.int64())


# ---------------------------------------------------------------------------
# Driver-memory-derived caps (round-3 review item #8)
# ---------------------------------------------------------------------------
# The size-aware physical-plan thresholds (local/medium CC closure,
# winner-broadcast dedup, broadcast scoring) bound DRIVER-side or
# broadcast-side memory. Hard constants sized for this 128-GiB box would
# mis-plan on a small head node; instead the caps scale linearly with
# the driver node's memory, calibrated so 128 GiB reproduces the
# historical constants exactly.

_DRIVER_MEM_BYTES: int | None = None


def driver_memory_bytes() -> int:
    """Memory budget of the DRIVER's node, in bytes.

    Resolution order: ``MDMPUBLIC_DRIVER_MEM_BYTES`` env override (ops /
    test hook) → the Ray ``memory`` resource of the node this driver is
    on (NOT the cluster sum — a 256-node cluster's workers don't grow
    the driver's heap) → psutil total → 128 GiB. Memoized per process."""
    global _DRIVER_MEM_BYTES
    import os

    ov = os.environ.get("MDMPUBLIC_DRIVER_MEM_BYTES")
    if ov:
        return int(ov)
    if _DRIVER_MEM_BYTES is not None:
        return _DRIVER_MEM_BYTES
    mem = None
    try:
        import ray

        if ray.is_initialized():
            nid = ray.get_runtime_context().get_node_id()
            for n in ray.nodes():
                r = n.get("Resources", {})
                if n.get("NodeID") == nid and r.get("memory"):
                    mem = int(r["memory"])
                    break
    except Exception:
        pass
    if mem is None:
        try:
            import psutil

            mem = int(psutil.virtual_memory().total)
        except Exception:
            mem = 128 << 30
    _DRIVER_MEM_BYTES = mem
    return mem


def memory_scaled_cap(base_at_128g: int, *, lo: int, hi: int | None = None) -> int:
    """Linear scale of a 128-GiB-calibrated cap to the actual driver
    memory, clamped to [lo, hi]."""
    scaled = int(base_at_128g * (driver_memory_bytes() / float(128 << 30)))
    if hi is not None:
        scaled = min(scaled, hi)
    return max(lo, scaled)
