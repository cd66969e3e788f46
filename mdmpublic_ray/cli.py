"""Operational CLI — the ``ray job submit`` entry point of the engine
(BASELINE.json north_star: "runs ... via ray job submit on fixed N-node
and 4N-node clusters"). On a real cluster:

    ray job submit --working-dir . -- \
        python -m mdmpublic_ray run --input s3://pages/ --state /state --run-id day0
    ray job submit --working-dir . -- \
        python -m mdmpublic_ray incremental --input s3://delta/ \
            --state /state --prev-run-id day0 --run-id day1

In this sandbox the same commands run standalone (``ray.init`` local).
The CLI owns the Ray session; the library never calls ``ray.init``.

Subcommands
-----------
run          full ER over a pages parquet dir/file; checkpoints per stage,
             publishes state, writes clusters+golden parquet
incremental  resolve a delta against a previous run's state; publishes the
             combined state under --run-id and writes outputs
diff         manifest-level run-over-run diff of two published states
golden-diff  record-level golden diff of two published states
retention    prune old published run states (keep-last / max-age)
plan         cadence decision (S9 full/diff/accu by weekday policy):
             what kind of run today is and which published run to base
             it on — feed its prev_run_id into ``incremental``

Every command prints ONE JSON summary line to stdout (timings, row
counts, per-stage metrics), in the spirit of the reference's timestamped
run reports (``/root/reference/bash/backup_dir/backup_dir.sh:133-160``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cfg_from_args(args) -> "ERConfig":
    from .pipelines.er import ERConfig

    cfg = ERConfig()
    for name in ("seed", "max_block_size", "threshold"):
        v = getattr(args, name, None)
        if v is not None:
            setattr(cfg, name, v)
    if getattr(args, "no_salt", False):
        cfg.salt_hot_hosts = False
    return cfg


def _default_out(state_dir: str, run_id: str) -> str:
    """Default results dir: a SIBLING of the state dir — the state dir
    must hold only run-state directories (retention prunes anything
    inside it by age)."""
    return os.path.join(f"{state_dir.rstrip(os.sep)}-out", run_id)


def _write_outputs(out: dict, out_dir: str) -> dict:
    """Persist the user-facing results as partitioned parquet (resumable
    output layout: one directory per result, many fragments)."""
    counts = {}
    for name in ("clusters", "golden"):
        d = os.path.join(out_dir, name)
        out[name].write_parquet(d)
        counts[name] = out[name].count()
    return counts


def _stage_metrics(state_dir: str, run_id: str) -> list[dict]:
    run = os.path.join(state_dir, run_id)
    rows = []
    if not os.path.isdir(run):
        return rows
    for d in sorted(os.listdir(run)):
        mp = os.path.join(run, d, "_metrics.json")
        try:
            with open(mp) as f:
                rows.append(json.load(f))
        except OSError:
            continue
    return rows


def cmd_run(args) -> dict:
    import ray.data as rd

    from .pipelines.er import run_er

    _init_ray(args.num_cpus)
    cfg = _cfg_from_args(args)
    cfg.checkpoint_dir = args.state
    cfg.run_id = args.run_id
    t0 = time.monotonic()
    out = run_er(rd.read_parquet(args.input), cfg)
    counts = _write_outputs(out, args.out or _default_out(args.state, args.run_id))
    from .state.cadence import record_run_kind

    record_run_kind(args.state, args.run_id, "full", when=args.run_date)
    return {
        "command": "run",
        "run_id": args.run_id,
        "wall_sec": round(time.monotonic() - t0, 3),
        **counts,
        "stages": _stage_metrics(args.state, args.run_id),
    }


def cmd_incremental(args) -> dict:
    import ray.data as rd

    from .pipelines.er_incremental import run_er_incremental, write_state

    _init_ray(args.num_cpus)
    cfg = _cfg_from_args(args)
    t0 = time.monotonic()
    deleted = None
    if getattr(args, "deleted", None):
        with open(args.deleted) as f:
            deleted = [ln.strip() for ln in f if ln.strip()]
    out = run_er_incremental(
        rd.read_parquet(args.input),
        cfg,
        state_dir=args.state,
        prev_run_id=args.prev_run_id,
        deleted_urls=deleted,
    )
    write_state(out, args.state, args.run_id, cfg)
    counts = _write_outputs(out, args.out or _default_out(args.state, args.run_id))
    from .state.cadence import list_runs, record_run_kind

    # accu = incremental whose baseline is the latest FULL run (S9)
    prior = {r["run_id"]: r for r in list_runs(args.state)}
    base = prior.get(args.prev_run_id, {})
    mode = "accu" if base.get("mode") == "full" else "diff"
    record_run_kind(
        args.state, args.run_id, mode,
        prev_run_id=args.prev_run_id, when=args.run_date,
    )
    return {
        "command": "incremental",
        "run_id": args.run_id,
        "prev_run_id": args.prev_run_id,
        "wall_sec": round(time.monotonic() - t0, 3),
        **counts,
        **out["incremental"],
    }


def cmd_compact(args) -> dict:
    from .state.checkpoint import compact_run

    _init_ray(args.num_cpus)
    rep = compact_run(
        args.state,
        args.run_id,
        rows_per_fragment=args.rows_per_fragment,
        target_fragments=args.target_fragments,
    )
    return {"command": "compact", "run_id": args.run_id, **rep}


def cmd_plan(args) -> dict:
    import datetime

    from .state.cadence import plan_run

    policy = None
    if args.policy:
        policy = {int(k): v for k, v in json.loads(args.policy).items()}
    run_date = args.run_date or datetime.date.today().isoformat()
    return {"command": "plan", "run_date": str(run_date),
            **plan_run(args.state, run_date, policy)}


def cmd_diff(args) -> dict:
    from .state.checkpoint import manifest_diff

    tbl = manifest_diff(args.state, args.run_a, args.run_b, deep=args.deep)
    return {
        "command": "diff",
        "stages": tbl.to_pylist(),
    }


def cmd_golden_diff(args) -> dict:
    from .pipelines.er_incremental import golden_diff
    from .state.checkpoint import CheckpointRunner

    _init_ray(args.num_cpus)
    a = CheckpointRunner(args.state, args.run_a).read_stage("golden")
    b = CheckpointRunner(args.state, args.run_b).read_stage("golden")
    df = golden_diff(a, b).to_pandas()
    by_status = df["status"].value_counts().to_dict()
    return {
        "command": "golden-diff",
        "counts": {k: int(v) for k, v in by_status.items()},
        "changed": df[df["status"] != "same"].to_dict("records")[: args.limit],
    }


def cmd_retention(args) -> dict:
    from .state.checkpoint import apply_retention

    removed = apply_retention(
        args.state, keep_last=args.keep_last, max_age_days=args.max_age_days
    )
    return {"command": "retention", "removed": removed}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mdmpublic_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, state=True):
        sp.add_argument("--num-cpus", type=int, default=None)
        if state:
            sp.add_argument("--state", required=True, help="state/checkpoint base dir")

    def er_params(sp):
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--max-block-size", dest="max_block_size", type=int, default=None)
        sp.add_argument("--threshold", type=float, default=None)
        sp.add_argument("--no-salt", action="store_true")
        sp.add_argument("--out", default=None, help="output parquet dir")
        sp.add_argument(
            "--run-date", dest="run_date", default=None,
            help="ISO date recorded in the run's cadence metadata",
        )

    sp = sub.add_parser("run", help="full ER over a pages parquet path")
    sp.add_argument("--input", required=True)
    sp.add_argument("--run-id", dest="run_id", required=True)
    common(sp)
    er_params(sp)
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("incremental", help="resolve a delta against previous state")
    sp.add_argument("--input", required=True)
    sp.add_argument("--prev-run-id", dest="prev_run_id", required=True)
    sp.add_argument("--run-id", dest="run_id", required=True)
    sp.add_argument(
        "--deleted",
        default=None,
        help="text file of urls to tombstone (one per line); deletions "
        "may accompany a delta or run alone against an empty delta",
    )
    common(sp)
    er_params(sp)
    sp.set_defaults(fn=cmd_incremental)

    sp = sub.add_parser("diff", help="manifest-level diff of two runs")
    sp.add_argument("--run-a", dest="run_a", required=True)
    sp.add_argument("--run-b", dest="run_b", required=True)
    sp.add_argument("--deep", action="store_true")
    common(sp)
    sp.set_defaults(fn=cmd_diff)

    sp = sub.add_parser("golden-diff", help="record-level golden diff of two runs")
    sp.add_argument("--run-a", dest="run_a", required=True)
    sp.add_argument("--run-b", dest="run_b", required=True)
    sp.add_argument("--limit", type=int, default=50)
    common(sp)
    sp.set_defaults(fn=cmd_golden_diff)

    sp = sub.add_parser(
        "compact", help="merge a run's small stage fragments (lineage-preserving)"
    )
    sp.add_argument("--run-id", dest="run_id", required=True)
    sp.add_argument("--rows-per-fragment", dest="rows_per_fragment",
                    type=int, default=500_000)
    sp.add_argument("--target-fragments", dest="target_fragments",
                    type=int, default=None)
    common(sp)
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser("plan", help="S9 cadence decision for a run date")
    sp.add_argument("--run-date", dest="run_date", default=None)
    sp.add_argument(
        "--policy", default=None,
        help='JSON weekday→mode map, e.g. \'{"6": "full", "2": "accu"}\' (Mon=0)',
    )
    common(sp)
    sp.set_defaults(fn=cmd_plan)

    sp = sub.add_parser("retention", help="prune old run states")
    sp.add_argument("--keep-last", dest="keep_last", type=int, default=3)
    sp.add_argument("--max-age-days", dest="max_age_days", type=float, default=None)
    common(sp)
    sp.set_defaults(fn=cmd_retention)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    result = args.fn(args)
    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
