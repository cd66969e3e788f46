"""S9 cadence policy: weekday→mode map, run-kind metadata, and baseline
resolution (diff → latest run, accu → latest FULL run)."""

import datetime
import json

import pytest

from mdmpublic_ray.cli import build_parser
from mdmpublic_ray.state.cadence import (
    DEFAULT_POLICY,
    choose_mode,
    list_runs,
    plan_run,
    record_run_kind,
    resolve_prev,
)


def test_choose_mode_weekday_map():
    # 2026-08-16 is a Sunday, 2026-08-19 a Wednesday, 2026-08-18 a Tuesday
    assert choose_mode("2026-08-16") == "full"
    assert choose_mode("2026-08-19") == "accu"
    assert choose_mode("2026-08-18") == "diff"
    assert choose_mode(datetime.date(2026, 8, 16)) == "full"
    assert choose_mode("2026-08-16", policy={}) == "diff"  # empty policy
    with pytest.raises(ValueError):
        choose_mode("2026-08-16", policy={6: "weekly"})


def _publish(state, run_id, mode, when, prev=None):
    d = state / run_id / "stage=clusters"
    d.mkdir(parents=True)
    record_run_kind(str(state), run_id, mode, prev_run_id=prev, when=when)


def test_resolve_prev_and_plan(tmp_path):
    state = tmp_path / "state"
    # fresh store: any requested mode degrades to full
    assert plan_run(str(state), "2026-08-18") == {
        "mode": "full", "prev_run_id": None, "requested_mode": "diff",
    }
    _publish(state, "day0", "full", "2026-08-16")
    _publish(state, "day1", "diff", "2026-08-17", prev="day0")
    _publish(state, "day2", "diff", "2026-08-18", prev="day1")
    assert [r["run_id"] for r in list_runs(str(state))] == ["day0", "day1", "day2"]
    assert resolve_prev(str(state), "diff") == "day2"
    assert resolve_prev(str(state), "accu") == "day0"  # latest FULL
    assert resolve_prev(str(state), "full") is None
    # Wednesday → accu against the full snapshot, not yesterday
    assert plan_run(str(state), "2026-08-19") == {
        "mode": "accu", "prev_run_id": "day0", "requested_mode": "accu",
    }
    # Sunday → new full
    assert plan_run(str(state), "2026-08-23")["mode"] == "full"
    _publish(state, "day7", "full", "2026-08-23")
    assert resolve_prev(str(state), "accu") == "day7"


def test_same_day_runs_order_by_numeric_mtime(tmp_path):
    """Two runs stamped the same day must tie-break by NUMERIC mtime:
    stringified floats compare lexicographically ("1755500000.5" sorts
    before "955500000.5") and would hand resolve_prev the older run."""
    import os

    state = tmp_path / "state"
    _publish(state, "morning", "full", "2026-08-18")
    _publish(state, "evening", "diff", "2026-08-18", prev="morning")
    # mtimes chosen so str() ordering inverts numeric ordering
    os.utime(state / "morning", (955500000.5, 955500000.5))
    os.utime(state / "evening", (1755500000.5, 1755500000.5))
    assert [r["run_id"] for r in list_runs(str(state))] == ["morning", "evening"]
    assert resolve_prev(str(state), "diff") == "evening"


def test_record_is_atomic_and_idempotent(tmp_path):
    state = tmp_path / "s"
    meta = record_run_kind(str(state), "r1", "full", when="2026-08-16")
    assert meta["mode"] == "full"
    again = record_run_kind(str(state), "r1", "diff", prev_run_id="r0",
                            when="2026-08-17")
    runs = list_runs(str(state))
    assert len(runs) == 1 and runs[0]["mode"] == "diff"
    assert runs[0]["prev_run_id"] == "r0"
    assert again["when"] == "2026-08-17"
    with pytest.raises(ValueError):
        record_run_kind(str(state), "r1", "nope")


def test_plan_cli_roundtrip(tmp_path, capsys):
    state = tmp_path / "state"
    _publish(state, "day0", "full", "2026-08-16")
    _publish(state, "day1", "diff", "2026-08-17", prev="day0")
    args = build_parser().parse_args(
        ["plan", "--state", str(state), "--run-date", "2026-08-19",
         "--policy", '{"6": "full", "2": "accu"}']
    )
    out = args.fn(args)
    assert out["mode"] == "accu" and out["prev_run_id"] == "day0"
    # policy keys arrive as strings from JSON; ints after parsing
    args = build_parser().parse_args(
        ["plan", "--state", str(state), "--run-date", "2026-08-18"]
    )
    assert args.fn(args)["prev_run_id"] == "day1"
