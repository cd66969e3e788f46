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

    def is_valid(self, name: str) -> bool:
        """A stage is valid iff its manifest exists and every fragment it
        lists is present with the recorded size."""
        mp = self._manifest_path(name)
        if not os.path.exists(mp):
            return False
        try:
            with open(mp) as f:
                man = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        sd = self._stage_dir(name)
        for frag in man.get("fragments", []):
            p = os.path.join(sd, frag["path"])
            if not os.path.exists(p) or os.path.getsize(p) != frag["bytes"]:
                return False
        return True

    def run_stage(self, name: str, make):
        """Return a Dataset for stage ``name``: re-read the checkpoint when
        valid, else build via ``make()``, write, manifest, and re-read."""
        import ray.data as rd

        sd = self._stage_dir(name)
        if self.is_valid(name):
            self.skipped.append(name)
            # partitioning=None: the `stage=<name>` directory name must NOT
            # be hive-parsed into a phantom "stage" column (it would collide
            # when two checkpointed stages are joined).
            return rd.read_parquet(sd, file_extensions=["parquet"], partitioning=None)

        tmp = os.path.join(self.dir, f".tmp-{name}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(sd, ignore_errors=True)
        t0 = time.monotonic()
        ds = make()
        ds.write_parquet(tmp)
        wall = time.monotonic() - t0
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
            "wall_seconds": round(wall, 3),
            "created_unix": int(time.time()),
        }
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
        # partitioning=None: the `stage=<name>` directory name must NOT be
        # hive-parsed into a phantom "stage" column (it would collide when
        # two checkpointed stages are joined).
        return rd.read_parquet(sd, file_extensions=["parquet"], partitioning=None)
