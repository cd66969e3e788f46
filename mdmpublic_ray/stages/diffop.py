"""Run-over-run DATA diff (§2.9 / ST6's outer half at the row level).

``state/checkpoint.py::manifest_diff`` answers "which STAGES changed
between runs" from manifests; this operator answers "which ROWS changed"
between two keyed snapshots of the same logical table (the monitor
family's current-vs-previous comparison,
``/root/reference/jenkins_scripts/monitor/monitor_server_filechanges.sh:154-159``,
applied to records instead of file listings).

Classification per key: ``added`` (only in B), ``removed`` (only in A),
``changed`` (in both, any compared column differs — null-safe), ``same``.

Execution: presence flags on each side, ONE bucketed full-outer join
(``util.py::bucketed_join`` — hash-partitioned, pure-Arrow per-bucket
join), then a vectorized Arrow CASE per batch. The shuffle moves only
the key + compared columns; at web scale callers project first.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .util import DEFAULT_BUCKETS, bucketed_join


def snapshot_diff(
    a,
    b,
    key: str,
    compare: list[str],
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    keep_values: bool = False,
):
    """Diff snapshot ``b`` (current) against ``a`` (previous) by ``key``.

    Returns one row per key present in either side with columns
    ``(key, status)``; with ``keep_values=True`` the compared columns of
    both sides are kept as ``<col>_prev`` / ``<col>_cur``.
    """
    cols = [key] + list(compare)

    # A zero-row Dataset loses its schema in Ray (schema() is None) — but
    # an EMPTY PREVIOUS snapshot is the legitimate first-run case (and an
    # empty current one the drop-everything case). An empty side means
    # every surviving row classifies one way, so skip the join entirely.
    def _all_status(ds, status: str, present: str) -> "object":
        def f(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            out = {key: t[key], "status": pa.array([status] * t.num_rows)}
            if keep_values:
                for c in compare:
                    v = t[c]
                    out[f"{c}_prev"] = v if present == "prev" else pa.nulls(
                        t.num_rows, v.type
                    )
                    out[f"{c}_cur"] = v if present == "cur" else pa.nulls(
                        t.num_rows, v.type
                    )
            return pa.table(out)

        return ds.map_batches(f, batch_format="pyarrow")

    def tag_a(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        out = {key: t[key]}
        for c in compare:
            out[f"{c}_prev"] = t[c]
        out["_in_a"] = pa.array([1] * t.num_rows, pa.int8())
        return pa.table(out)

    def tag_b(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        out = {f"{key}_b": t[key]}
        for c in compare:
            out[f"{c}_cur"] = t[c]
        out["_in_b"] = pa.array([1] * t.num_rows, pa.int8())
        return pa.table(out)

    ta = a.map_batches(tag_a, batch_format="pyarrow")
    tb = b.map_batches(tag_b, batch_format="pyarrow")
    # schema() is None only for an empty schema-less side (zero-row
    # Datasets lose their schema through map_batches in Ray) — shortcut:
    # an empty side classifies every other-side row one way, no join.
    sa, sb = ta.schema(), tb.schema()
    if sa is None and sb is None:
        import ray.data as rd

        return rd.from_items([])  # nothing on either side: empty diff
    if sa is None:
        return _all_status(b, "added", "cur")
    if sb is None:
        return _all_status(a, "removed", "prev")
    joined = bucketed_join(ta, tb, key, f"{key}_b", how="outer",
                           n_buckets=n_buckets)

    def classify(t: pa.Table) -> pa.Table:
        in_a = pc.is_valid(t["_in_a"])
        in_b = pc.is_valid(t["_in_b"])
        any_diff = pa.array([False] * t.num_rows, pa.bool_())
        for c in compare:
            av, bv = t[f"{c}_prev"], t[f"{c}_cur"]
            eq = pc.fill_null(pc.equal(av, bv), False)
            both_null = pc.and_(pc.is_null(av), pc.is_null(bv))
            any_diff = pc.or_(any_diff, pc.invert(pc.or_(eq, both_null)))
        status = pc.if_else(
            pc.invert(in_a),
            pa.scalar("added"),
            pc.if_else(
                pc.invert(in_b),
                pa.scalar("removed"),
                pc.if_else(any_diff, pa.scalar("changed"), pa.scalar("same")),
            ),
        )
        out = {key: t[key], "status": status}
        if keep_values:
            for c in compare:
                out[f"{c}_prev"] = t[f"{c}_prev"]
                out[f"{c}_cur"] = t[f"{c}_cur"]
        return pa.table(out)

    return joined.map_batches(classify, batch_format="pyarrow")
