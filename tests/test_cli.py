"""Operational CLI (`python -m mdmpublic_ray`): the ray-job-submit entry
point must drive run → incremental → diff → golden-diff → retention end
to end as subprocesses, each owning its own Ray session and printing one
JSON summary line."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

REPO = str(Path(__file__).resolve().parent.parent)


def _run(args: list[str]) -> dict:
    r = subprocess.run(
        [sys.executable, "-m", "mdmpublic_ray", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    from mdmpublic_ray.corpus import generate_pages, split_base_delta

    d = tmp_path_factory.mktemp("cli")
    pages, _, _ = generate_pages(n_clusters=30, seed=3)
    base, delta = split_base_delta(pages)
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(delta, str(d / "delta.parquet"))
    pq.write_table(pages, str(d / "all.parquet"))
    pq.write_table(base.schema.empty_table(), str(d / "empty.parquet"))
    return d


def test_cli_full_cycle(cli_corpus):
    d = cli_corpus
    state = str(d / "state")

    out1 = _run(
        ["run", "--input", str(d / "base.parquet"), "--state", state,
         "--run-id", "day0", "--num-cpus", "4"]
    )
    assert out1["clusters"] > 0 and out1["golden"] > 0
    assert any(s["stage"] == "golden" for s in out1["stages"])

    out2 = _run(
        ["incremental", "--input", str(d / "delta.parquet"), "--state", state,
         "--prev-run-id", "day0", "--run-id", "day1", "--num-cpus", "4"]
    )
    assert out2["n_effective"] > 0
    assert out2["clusters"] >= out1["clusters"]
    # outputs are parquet on disk (sibling of the state dir)
    outdir = os.path.join(f"{state}-out", "day1", "clusters")
    assert sum(f.endswith(".parquet") for f in os.listdir(outdir)) > 0

    d1 = _run(["diff", "--state", state, "--run-a", "day0", "--run-b", "day1"])
    stages = {s["stage"]: s["status"] for s in d1["stages"]}
    assert stages.get("clusters") == "changed"

    gd = _run(
        ["golden-diff", "--state", state, "--run-a", "day0", "--run-b", "day1"]
    )
    assert gd["counts"].get("same", 0) > 0
    assert sum(gd["counts"].values()) >= out1["golden"]

    # day2: deletion-only increment via --deleted tombstone file
    base_urls = pq.read_table(str(d / "base.parquet"), columns=["url"])
    tomb = sorted(set(base_urls["url"].to_pylist()))[:2]
    tomb_file = str(d / "tombstones.txt")
    with open(tomb_file, "w") as f:
        f.write("\n".join(tomb) + "\n")
    out3 = _run(
        ["incremental", "--input", str(d / "empty.parquet"), "--state", state,
         "--prev-run-id", "day1", "--run-id", "day2", "--num-cpus", "4",
         "--deleted", tomb_file]
    )
    assert out3["n_deleted"] == 2
    assert out3["clusters"] <= out2["clusters"]

    ret = _run(["retention", "--state", state, "--keep-last", "1"])
    assert "day0" in ret["removed"]
    assert os.path.isdir(os.path.join(state, "day2"))
