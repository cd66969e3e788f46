"""Per-stage Parquet checkpoints with lineage manifests — the engine's
resumability layer.

Reference ancestry: the manifest-skip S3 sink (``/root/reference/bash/
S3Sync/s3sync.sh:47-51`` — upload only paths absent from the metadata
file), checksum-diff repo sync (``jenkins_scripts/jenkins/
sync_http_repo_server.sh:42-105``) and the BACKUP→…→DONE/FAILED run-state
file (``bash/backup_dir/backup_dir.sh:20-27,133-160``). Here the same
ideas become: each stage writes partitioned Parquet into
``<dir>/<run_id>/stage=<name>/`` plus ``_manifest.json`` (row count,
fragment list with sizes, wall time, engine version) and ``_metrics.json``;
a rerun validates the manifest against the files on disk and SKIPS the
stage, re-reading its Parquet instead of recomputing. Writes are atomic:
data lands in ``.tmp-<name>`` and is renamed into place only after the
manifest is written, so a killed run never leaves a half-valid stage.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def _fragments(d: str) -> list[dict]:
    out = []
    for root, _, files in os.walk(d):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out.append(
                    {"path": os.path.relpath(p, d), "bytes": os.path.getsize(p)}
                )
    return out


class CheckpointRunner:
    def __init__(self, base_dir: str, run_id: str = "run0") -> None:
        self.dir = os.path.join(base_dir, run_id)
        os.makedirs(self.dir, exist_ok=True)
        self.skipped: list[str] = []
        self.ran: list[str] = []

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.dir, f"stage={name}")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "_manifest.json")

    def manifest_digest(self, name: str) -> str | None:
        """sha256 of the stage's manifest file — the lineage token a
        downstream stage records. A parent that re-ran gets a fresh
        manifest (new created_unix/wall) → new digest → every descendant
        invalidates, even if the parent's data happens to be identical
        (conservative, always safe)."""
        mp = self._manifest_path(name)
        try:
            with open(mp, "rb") as f:
                return hashlib.sha256(f.read()).hexdigest()
        except OSError:
            return None

    def is_valid(
        self,
        name: str,
        parent_digests: dict[str, str | None] | None = None,
        params_digest: str | None = None,
    ) -> bool:
        """A stage is valid iff its manifest exists, every fragment it
        lists is present with the recorded size, (when lineage is tracked)
        the recorded parent-manifest digests match the parents' CURRENT
        manifests, and the recorded params digest matches the caller's
        CURRENT stage parameters (a re-run with a changed config must not
        serve stale outputs)."""
        mp = self._manifest_path(name)
        if not os.path.exists(mp):
            return False
        try:
            with open(mp) as f:
                man = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        if parent_digests is not None and man.get("parents", {}) != parent_digests:
            return False
        if params_digest is not None and man.get("params_digest") != params_digest:
            return False
        sd = self._stage_dir(name)
        for frag in man.get("fragments", []):
            p = os.path.join(sd, frag["path"])
            if not os.path.exists(p) or os.path.getsize(p) != frag["bytes"]:
                return False
        return True

    def run_stage(
        self,
        name: str,
        make,
        parents: tuple[str, ...] = (),
        params: dict | None = None,
    ):
        """Return a Dataset for stage ``name``: re-read the checkpoint when
        valid, else build via ``make()``, write, manifest, and re-read.
        ``parents`` names upstream stages; their manifest digests are
        recorded for lineage-aware invalidation. ``params``: the
        JSON-serializable stage-relevant config — its digest is part of
        the manifest, so changing a threshold/seed/cap invalidates the
        stage even when every parent is unchanged."""
        import ray.data as rd

        parent_digests = {p: self.manifest_digest(p) for p in parents}
        params_digest = (
            hashlib.sha256(
                json.dumps(params, sort_keys=True).encode()
            ).hexdigest()
            if params is not None
            else None
        )
        sd = self._stage_dir(name)
        if self.is_valid(name, parent_digests, params_digest):
            self.skipped.append(name)
            return self._read(sd)

        tmp = os.path.join(self.dir, f".tmp-{name}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(sd, ignore_errors=True)
        t0 = time.monotonic()
        ds = make()
        ds.write_parquet(tmp)
        wall = time.monotonic() - t0
        # an empty dataset writes no fragment — and no directory at all
        os.makedirs(tmp, exist_ok=True)
        frags = _fragments(tmp)
        # row count from parquet footers (cheap, no second pass over data)
        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(os.path.join(tmp, fr["path"])).num_rows for fr in frags
        )
        manifest = {
            "stage": name,
            "rows": rows,
            "fragments": frags,
            "parents": parent_digests,
            "params_digest": params_digest,
            "wall_seconds": round(wall, 3),
            "created_unix": int(time.time()),
        }
        if not frags:
            # a zero-row stage writes no parquet fragment, so the schema
            # would be unrecoverable on re-read — persist it in the
            # manifest (IPC-serialized) and _read reconstructs a typed
            # empty dataset instead of failing on an empty directory.
            try:
                import pyarrow as _pa  # noqa: F401

                manifest["empty_schema"] = bytes(
                    ds.schema(fetch_if_missing=True).base_schema.serialize()
                ).hex()
            except Exception:
                pass
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        with open(os.path.join(tmp, "_metrics.json"), "w") as f:
            json.dump(
                {"stage": name, "rows": rows, "wall_seconds": round(wall, 3),
                 "bytes": sum(fr["bytes"] for fr in frags)},
                f, indent=1, sort_keys=True,
            )
        os.replace(tmp, sd)  # atomic publish
        self.ran.append(name)
        return self._read(sd)

    def read_stage(self, name: str):
        """Re-read a previously-written stage as a Dataset (the public
        entry for consumers of a prior run's state, e.g. the incremental
        ER pipeline)."""
        return self._read(self._stage_dir(name))

    def stage_stats(self, name: str) -> dict:
        """{"rows", "wall_seconds"} recorded in the stage's manifest —
        the cost-model inputs for run-over-run plan selection
        (er_incremental.choose_incremental_plan). Empty dict if the
        stage or manifest is missing."""
        import json as _json

        try:
            with open(
                os.path.join(self._stage_dir(name), "_manifest.json")
            ) as f:
                man = _json.load(f)
            return {
                "rows": int(man.get("rows", 0)),
                "wall_seconds": float(man.get("wall_seconds", 0.0)),
            }
        except Exception:
            return {}

    def stage_names(self) -> list[str]:
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(self.dir)
            if d.startswith("stage=") and os.path.isdir(os.path.join(self.dir, d))
        )

    def _read(self, sd: str):
        """Re-read a checkpointed stage.

        ``partitioning=None``: the `stage=<name>` directory name must NOT
        be hive-parsed into a phantom "stage" column (it would collide
        when two checkpointed stages are joined).

        ``override_num_blocks``: a stage written from a 64-way shuffle
        leaves 64+ tiny parquet fragments; re-reading them 1:1 floods
        downstream wide ops with micro-blocks (measured: a 48k×48k join
        over 192-fragment inputs ran 3× slower than over right-sized
        blocks). Blocks are re-sized to the row count, capped by the
        fragment count — at real scale rows/50k dominates and this is a
        no-op."""
        import json as _json

        import ray.data as rd

        from ..stages.util import adaptive_partitions

        try:
            with open(os.path.join(sd, "_manifest.json")) as f:
                man = _json.load(f)
            if not man.get("fragments") and man.get("empty_schema"):
                import pyarrow as _pa
                import pyarrow.ipc as _ipc

                schema = _ipc.read_schema(
                    _pa.BufferReader(bytes.fromhex(man["empty_schema"]))
                )
                return rd.from_arrow(schema.empty_table())
            n_frags = max(1, len(man.get("fragments", [])))
            rows = man.get("rows", 0)
            # ~10k rows per block: enough rows that per-task overhead
            # amortizes, enough BLOCKS that a downstream CPU-heavy
            # map_batches can use the whole cluster (map parallelism is
            # block-bound — a 231k-row stage re-read as 5 blocks ran its
            # scorer on 5 cores).
            blocks = min(
                n_frags, adaptive_partitions(rows, n_frags, rows_per_partition=10_000)
            )
        except OSError:
            blocks = None
        return rd.read_parquet(
            sd,
            file_extensions=["parquet"],
            partitioning=None,
            override_num_blocks=blocks,
        )


def _stage_value_digest(stage_dir: str) -> str:
    """Order-insensitive digest of a stage's parquet VALUES: per-row
    pandas hashes summed (commutative), so shuffle-nondeterministic row
    and fragment order hashes identically. Full-read cost — deep mode
    only; fine for validating modest stages, sampling at 100 TB."""
    import pandas as pd
    import pyarrow.parquet as pq

    total = 0
    for frag in _fragments(stage_dir):
        df = pq.read_table(os.path.join(stage_dir, frag["path"])).to_pandas()
        df = df[sorted(df.columns)]
        if len(df):
            total = (total + int(pd.util.hash_pandas_object(df, index=False).sum())) & (
                (1 << 64) - 1
            )
    return f"{total:016x}"


def manifest_diff(base_dir: str, run_a: str, run_b: str, *, deep: bool = False):
    """Run-over-run state diff (ST6 / §2.9; the monitor family's "what
    changed since the last run" — ``monitor_server_filechanges.sh:154-159``
    diffs the current inotify snapshot against the previous one).

    Compares the per-stage manifests of two runs under ``base_dir`` and
    returns one row per stage: ``status`` ∈ {added, removed, changed,
    same}. Manifest-level identity is (rows, params_digest) — fragment
    sizes and order vary run-to-run under parallel shuffle writes, and
    wall-clock fields are per-run noise. ``deep=True`` additionally
    compares an order-insensitive digest of the parquet values (reads
    both runs' data — the cksum-diff of ``sync_http_repo_server.sh``).
    """
    import pyarrow as pa

    a = CheckpointRunner(base_dir, run_a)
    b = CheckpointRunner(base_dir, run_b)

    def content(runner: CheckpointRunner, name: str):
        try:
            with open(runner._manifest_path(name)) as f:
                man = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        out = {
            "rows": man.get("rows"),
            "params_digest": man.get("params_digest"),
        }
        if deep:
            out["value_digest"] = _stage_value_digest(runner._stage_dir(name))
        return out

    names = sorted(set(a.stage_names()) | set(b.stage_names()))
    rows = []
    for name in names:
        ca, cb = content(a, name), content(b, name)
        if ca is None and cb is None:
            continue
        if ca is None:
            status = "added"
        elif cb is None:
            status = "removed"
        elif ca == cb:
            status = "same"
        else:
            status = "changed"
        rows.append(
            {
                "stage": name,
                "status": status,
                "rows_a": -1 if ca is None else int(ca["rows"] or 0),
                "rows_b": -1 if cb is None else int(cb["rows"] or 0),
            }
        )
    return pa.table(
        {
            "stage": pa.array([r["stage"] for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
            "rows_a": pa.array([r["rows_a"] for r in rows], pa.int64()),
            "rows_b": pa.array([r["rows_b"] for r in rows], pa.int64()),
        }
    )


def apply_retention(
    base_dir: str, *, keep_last: int = 3, max_age_days: float | None = None
) -> list[str]:
    """Checkpoint retention job (S11; ``backup_dir.sh:127-160`` — delete
    archives older than N days, keep the newest).

    Run directories under ``base_dir`` are aged by their newest stage
    manifest's ``created_unix`` (directory mtime when no manifest). The
    newest ``keep_last`` runs always survive; older ones are deleted, as
    is anything beyond ``max_age_days`` (outside the keep set). Returns
    the removed run ids (deterministic order: oldest first).
    """
    runs: list[tuple[float, str]] = []
    for d in sorted(os.listdir(base_dir)):
        p = os.path.join(base_dir, d)
        if not os.path.isdir(p):
            continue
        newest = 0.0
        for sd in os.listdir(p):
            mp = os.path.join(p, sd, "_manifest.json")
            try:
                with open(mp) as f:
                    newest = max(newest, float(json.load(f).get("created_unix", 0)))
            except (OSError, json.JSONDecodeError, ValueError):
                continue
        if newest == 0.0:
            newest = os.path.getmtime(p)
        runs.append((newest, d))
    runs.sort()
    keep = {d for _, d in runs[-keep_last:]} if keep_last > 0 else set()
    now = time.time()
    removed = []
    for ts, d in runs:
        if d in keep:
            continue
        # outside the keep set: removed unconditionally when no age bound
        # is given, else only once older than the bound
        if max_age_days is None or (now - ts) > max_age_days * 86400:
            shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)
            removed.append(d)
    return removed


def cadence_mode(weekday: int, *, full_day: int = 6) -> str:
    """STAGE-RESUME cadence (S9, checkpoint layer): one weekly FULL run
    (fresh run_id — every stage recomputes), DIFF otherwise (same run_id
    — valid stages skip via their manifests). ``weekday``: 0=Monday …
    6=Sunday. The PUBLISHED-STATE cadence (full/diff/accu baseline
    selection across runs, ``cb_backup.py:62-93``) lives in
    ``state/cadence.py``."""
    return "full" if weekday % 7 == full_day else "diff"


def plan_run(base_dir: str, date_tag: str, weekday: int, *, full_day: int = 6) -> dict:
    """Resolve the cadence policy into CheckpointRunner inputs: FULL days
    open a fresh ``run_id`` (= date_tag); DIFF days resume the most
    recent existing run (falling back to a fresh one when none exists)."""
    mode = cadence_mode(weekday, full_day=full_day)
    existing = sorted(
        d for d in (os.listdir(base_dir) if os.path.isdir(base_dir) else [])
        if os.path.isdir(os.path.join(base_dir, d))
    )
    if mode == "full" or not existing:
        return {"mode": mode, "run_id": date_tag, "resumed": False}
    return {"mode": mode, "run_id": existing[-1], "resumed": True}


def compact_run(
    base_dir: str,
    run_id: str,
    *,
    stages: list[str] | None = None,
    rows_per_fragment: int = 500_000,
    target_fragments: int | None = None,
) -> dict:
    """Compact a published run's stage parquet into fewer fragments
    WITHOUT invalidating resume lineage (the small-files maintenance job:
    a 64-way shuffle leaves 64+ tiny fragments per stage per run; at real
    scale that is an object-store listing/metadata tax on every resume —
    the tar/compress step of the reference's backup writer,
    ``bash/backup_dir/backup_dir.sh:61-92``, re-expressed).

    For each stage whose fragment count exceeds the target
    (``target_fragments`` or ceil(rows / rows_per_fragment)): re-read,
    ``repartition(target)``, write aside, verify the row count, swap the
    stage directory, and rewrite the manifest with the new fragment list
    (rows / parents / params_digest preserved). Because downstream
    manifests record the PARENT MANIFEST FILE's sha256, every rewritten
    manifest's new digest is then CASCADED: a descendant's recorded
    parent digest is updated only when it matches the parent's
    pre-compaction digest — genuinely stale lineage stays stale (the
    repair must not mask a real invalidation). Crash mid-swap leaves the
    stage invalid → it simply rebuilds on the next run.

    Returns {stage: {"fragments_before": n, "fragments_after": m}} plus
    a "cascaded" list of manifests whose lineage digests were updated.
    """
    import math

    import ray.data as rd  # noqa: F401  (ensures ray.data import context)

    runner = CheckpointRunner(base_dir, run_id)
    all_names = runner.stage_names()
    targets = stages if stages is not None else all_names
    rewritten: dict[str, tuple[str, str]] = {}  # name -> (old digest, new)
    report: dict = {}

    for name in targets:
        sd = runner._stage_dir(name)
        mp = runner._manifest_path(name)
        try:
            with open(mp) as f:
                man = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        frags = man.get("fragments", [])
        rows = int(man.get("rows") or 0)
        if rows == 0 or not frags:
            continue
        tgt = (
            target_fragments
            if target_fragments is not None
            else max(1, math.ceil(rows / rows_per_fragment))
        )
        if len(frags) <= tgt:
            continue
        old_digest = runner.manifest_digest(name)
        ds = runner._read(sd)
        tmp = os.path.join(runner.dir, f".compact-{name}")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.repartition(tgt).write_parquet(tmp)
        os.makedirs(tmp, exist_ok=True)
        new_frags = _fragments(tmp)
        import pyarrow.parquet as pq

        new_rows = sum(
            pq.read_metadata(os.path.join(tmp, fr["path"])).num_rows
            for fr in new_frags
        )
        if new_rows != rows:  # never swap in a lossy rewrite
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compact_run: stage {name} rewrote {new_rows} rows, expected {rows}"
            )
        man["fragments"] = new_frags
        man["compacted_unix"] = int(time.time())
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(man, f, indent=1, sort_keys=True)
        metrics = os.path.join(sd, "_metrics.json")
        if os.path.exists(metrics):
            shutil.copy2(metrics, os.path.join(tmp, "_metrics.json"))
        old_sd = sd + ".old"
        shutil.rmtree(old_sd, ignore_errors=True)
        os.rename(sd, old_sd)
        os.rename(tmp, sd)
        shutil.rmtree(old_sd, ignore_errors=True)
        rewritten[name] = (old_digest, runner.manifest_digest(name))
        report[name] = {
            "fragments_before": len(frags),
            "fragments_after": len(new_frags),
        }

    # cascade digest updates through descendants (bounded by DAG depth)
    cascaded: list[str] = []
    for _ in range(len(all_names) + 1):
        changed = False
        for name in all_names:
            mp = runner._manifest_path(name)
            try:
                with open(mp) as f:
                    man = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            parents = man.get("parents") or {}
            upd = False
            for p, d in parents.items():
                if p in rewritten and d == rewritten[p][0]:
                    parents[p] = rewritten[p][1]
                    upd = True
            if upd:
                orig = rewritten.get(name, (runner.manifest_digest(name),))[0]
                tmp_mp = mp + ".tmp"
                with open(tmp_mp, "w") as f:
                    json.dump(man, f, indent=1, sort_keys=True)
                os.replace(tmp_mp, mp)
                rewritten[name] = (orig, runner.manifest_digest(name))
                cascaded.append(name)
                changed = True
        if not changed:
            break
    return {**report, "cascaded": sorted(set(cascaded))}
