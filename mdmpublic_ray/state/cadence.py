"""Run-cadence policy (SURVEY.md §2.1 S9): the reference schedules its
backup writer as ``cbbackup -m {full,diff,accu}`` chosen by a
day-of-week map (``python/db_backup/cb_backup.py:62-93``). Re-expressed
over the ER state store:

- ``full``  — ``run_er`` over the whole corpus (fresh state),
- ``diff``  — ``run_er_incremental`` against the LATEST published run
  (delta since yesterday),
- ``accu``  — ``run_er_incremental`` against the latest FULL run
  (accumulated delta since the last full snapshot; replaying one accu
  run restores the week, the reference's accu semantics).

Each published run records its kind in ``<state>/<run_id>/_run.json`` so
``resolve_prev`` can pick the right baseline without parsing run ids.
The planner is pure metadata — O(runs) driver work, no Ray.

Layering note: ``state.checkpoint.cadence_mode`` / ``plan_run`` are the
STAGE-RESUME half of S9 (does today's run reuse a checkpoint run_id);
this module is the PUBLISHED-STATE half (which previous run an
incremental run should base on).
"""

from __future__ import annotations

import datetime as _dt
import json
import os

_RUN_META = "_run.json"

# cb_backup's shape: one weekly full (Sunday), mid-week accumulated
# snapshot (Wednesday), plain diffs otherwise. Keys are date.weekday()
# ints (Monday=0) — mirroring the reference's day-of-week map.
DEFAULT_POLICY: dict[int, str] = {6: "full", 2: "accu"}

_MODES = ("full", "diff", "accu")


def _as_date(d) -> _dt.date:
    if isinstance(d, _dt.datetime):
        return d.date()
    if isinstance(d, _dt.date):
        return d
    return _dt.date.fromisoformat(str(d))


def choose_mode(run_date, policy: dict[int, str] | None = None) -> str:
    """Weekday → mode under ``policy`` (default :data:`DEFAULT_POLICY`);
    unlisted weekdays are ``diff``."""
    policy = DEFAULT_POLICY if policy is None else policy
    mode = policy.get(_as_date(run_date).weekday(), "diff")
    if mode not in _MODES:
        raise ValueError(f"unknown cadence mode {mode!r}")
    return mode


def record_run_kind(
    state_dir: str,
    run_id: str,
    mode: str,
    *,
    prev_run_id: str | None = None,
    when=None,
) -> dict:
    """Stamp a published run directory with its cadence kind. Call AFTER
    ``write_state`` / the checkpointed run — publication replaces the
    run directory wholesale."""
    if mode not in _MODES:
        raise ValueError(f"unknown cadence mode {mode!r}")
    meta = {
        "run_id": run_id,
        "mode": mode,
        "prev_run_id": prev_run_id,
        "when": _as_date(when).isoformat() if when is not None else None,
    }
    run_dir = os.path.join(state_dir, run_id)
    os.makedirs(run_dir, exist_ok=True)
    tmp = os.path.join(run_dir, _RUN_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(run_dir, _RUN_META))
    return meta


def list_runs(state_dir: str) -> list[dict]:
    """Published runs, oldest → newest. Ordering: recorded ``when`` date
    first (runs without one sort by directory mtime, interleaved on the
    same footing so mixed stores still order sensibly)."""
    out = []
    if not os.path.isdir(state_dir):
        return out
    for name in os.listdir(state_dir):
        run_dir = os.path.join(state_dir, name)
        if not os.path.isdir(run_dir) or name.startswith("."):
            continue
        meta = {"run_id": name, "mode": None, "prev_run_id": None, "when": None}
        p = os.path.join(run_dir, _RUN_META)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    meta.update(json.load(f))
            except (OSError, json.JSONDecodeError):
                pass
        # Tie-break same-day runs by NUMERIC mtime: stringified floats
        # compare lexicographically ("9.5" > "10.5") and would misorder
        # the baselines resolve_prev() depends on.
        mtime = os.path.getmtime(run_dir)
        key = (
            (meta["when"], mtime)
            if meta.get("when")
            else (_dt.date.fromtimestamp(mtime).isoformat(), mtime)
        )
        out.append({**meta, "_sort": key})
    out.sort(key=lambda m: m["_sort"])
    for m in out:
        m.pop("_sort")
    return out


def resolve_prev(state_dir: str, mode: str) -> str | None:
    """Baseline run for an incremental mode: ``diff`` → newest run of any
    kind; ``accu`` → newest FULL run; ``full`` → None (no baseline)."""
    if mode == "full":
        return None
    runs = list_runs(state_dir)
    if mode == "accu":
        runs = [r for r in runs if r.get("mode") == "full"]
    return runs[-1]["run_id"] if runs else None


def plan_run(state_dir: str, run_date, policy: dict[int, str] | None = None) -> dict:
    """The S9 decision: what kind of run today is, and what to base it
    on. A ``diff``/``accu`` day with no eligible baseline degrades to
    ``full`` (first run of a fresh store), like the reference's backup
    falling back to a full when no prior archive exists."""
    mode = choose_mode(run_date, policy)
    prev = resolve_prev(state_dir, mode)
    if mode != "full" and prev is None:
        return {"mode": "full", "prev_run_id": None, "requested_mode": mode}
    return {"mode": mode, "prev_run_id": prev, "requested_mode": mode}
