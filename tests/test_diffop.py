"""Row-level snapshot diff: classification, null-safety, and empty sides."""

import pandas as pd
import pyarrow as pa
import pytest

from mdmpublic_ray.stages.diffop import snapshot_diff


def _run(a_rows, b_rows, **kw):
    import ray.data as rd

    schema = pa.schema([("k", pa.int64()), ("v", pa.float64())])
    a = rd.from_arrow(pa.Table.from_pylist(a_rows, schema=schema))
    b = rd.from_arrow(pa.Table.from_pylist(b_rows, schema=schema))
    out = snapshot_diff(a, b, "k", ["v"], n_buckets=4, **kw).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_all_four_statuses(ray_session):
    a = [{"k": 1, "v": 1.0}, {"k": 2, "v": 2.0}, {"k": 3, "v": 3.0},
         {"k": 5, "v": None}]
    b = [{"k": 2, "v": 2.0}, {"k": 3, "v": 9.0}, {"k": 4, "v": 4.0},
         {"k": 5, "v": None}]
    out = _run(a, b)
    got = dict(zip(out["k"], out["status"]))
    assert got == {1: "removed", 2: "same", 3: "changed", 4: "added",
                   5: "same"}  # null == null is SAME (null-safe compare)


def test_null_to_value_is_changed(ray_session):
    out = _run([{"k": 1, "v": None}], [{"k": 1, "v": 0.0}])
    assert list(out["status"]) == ["changed"]


def test_empty_previous_side_all_added(ray_session):
    out = _run([], [{"k": 7, "v": 1.0}, {"k": 8, "v": 2.0}])
    assert list(out["status"]) == ["added", "added"]
    assert list(out["k"]) == [7, 8]


def test_keep_values(ray_session):
    out = _run([{"k": 1, "v": 1.0}], [{"k": 1, "v": 2.0}], keep_values=True)
    assert list(out.columns) == ["k", "status", "v_prev", "v_cur"]
    assert out.loc[0, "v_prev"] == 1.0 and out.loc[0, "v_cur"] == 2.0
    assert out.loc[0, "status"] == "changed"
