"""Resumability: per-stage Parquet checkpoints + lineage manifests
(north_rule "resumable from checkpoint with per-partition lineage +
metrics"; reference analogs s3sync.sh:47-51 manifest-skip and
backup_dir.sh run-state files)."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pytest

from mdmpublic_ray.pipelines.er import ERConfig, run_er

STAGES = ["deduped", "features", "blocks", "pairs", "scored", "clusters", "golden"]


def _golden_df(out) -> pd.DataFrame:
    return (
        out["golden"].to_pandas().sort_values("cluster_id", kind="mergesort").reset_index(drop=True)
    )


@pytest.fixture()
def ck_env(ray_session, corpus_dir, tmp_path):
    import ray.data as rd

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    ckdir = str(tmp_path / "ck")
    cfg = ERConfig(num_partitions=8, n_buckets=16, checkpoint_dir=ckdir, run_id="r1")
    return pages, cfg, os.path.join(ckdir, "r1")


def test_full_rerun_skips_every_stage(ck_env):
    from mdmpublic_ray.state.checkpoint import CheckpointRunner

    pages, cfg, run_dir = ck_env
    g1 = _golden_df(run_er(pages, cfg))

    # every stage has a manifest + metrics sidecar with rows recorded
    for s in STAGES:
        man = json.load(open(os.path.join(run_dir, f"stage={s}", "_manifest.json")))
        assert man["rows"] >= 0 and man["fragments"], s
        assert os.path.exists(os.path.join(run_dir, f"stage={s}", "_metrics.json"))

    # rerun: all stages valid → skipped, identical output
    g2 = _golden_df(run_er(pages, cfg))
    pd.testing.assert_frame_equal(g1, g2)
    ck = CheckpointRunner(cfg.checkpoint_dir, cfg.run_id)
    for s in STAGES:
        assert ck.is_valid(s), s


def test_corrupted_stage_invalidates_and_recovers(ck_env):
    pages, cfg, run_dir = ck_env
    g1 = _golden_df(run_er(pages, cfg))

    # truncate a fragment of the `pairs` stage → its size check fails
    sd = os.path.join(run_dir, "stage=pairs")
    frag = json.load(open(os.path.join(sd, "_manifest.json")))["fragments"][0]
    with open(os.path.join(sd, frag["path"]), "wb") as f:
        f.write(b"corrupt")

    before = {
        s: json.load(open(os.path.join(run_dir, f"stage={s}", "_manifest.json")))[
            "created_unix"
        ]
        for s in STAGES
    }
    g2 = _golden_df(run_er(pages, cfg))
    pd.testing.assert_frame_equal(g1, g2)  # recovery is exact

    after = {
        s: json.load(open(os.path.join(run_dir, f"stage={s}", "_manifest.json")))[
            "created_unix"
        ]
        for s in STAGES
    }
    # upstream of pairs untouched (manifest files not rewritten)
    mtime = lambda s: os.path.getmtime(os.path.join(run_dir, f"stage={s}", "_manifest.json"))
    assert before["deduped"] == after["deduped"]
    assert before["features"] == after["features"]
    assert before["blocks"] == after["blocks"]


def test_parent_rerun_invalidates_descendants(ck_env):
    """Lineage chain: deleting an upstream stage forces it to re-run,
    and its new manifest digest must invalidate every descendant —
    nothing downstream may serve stale data."""
    from mdmpublic_ray.state.checkpoint import CheckpointRunner

    pages, cfg, run_dir = ck_env
    g1 = _golden_df(run_er(pages, cfg))

    shutil.rmtree(os.path.join(run_dir, "stage=features"))
    g2 = _golden_df(run_er(pages, cfg))
    pd.testing.assert_frame_equal(g1, g2)

    # features re-ran, and so did every descendant (fresh manifests);
    # deduped (no parent among the removed) was skipped.
    man = lambda s: json.load(
        open(os.path.join(run_dir, f"stage={s}", "_manifest.json"))
    )
    ck = CheckpointRunner(cfg.checkpoint_dir, cfg.run_id)
    # descendants' recorded parent digests must match the CURRENT parents
    assert man("blocks")["parents"]["features"] == ck.manifest_digest("features")
    assert man("scored")["parents"]["pairs"] == ck.manifest_digest("pairs")
    assert man("golden")["parents"]["clusters"] == ck.manifest_digest("clusters")


def test_mid_run_kill_resumes_from_partial_state(ck_env):
    """Simulated crash: only the first three stages exist (as after a kill
    during `pairs`); the rerun must skip them and complete the rest with
    output identical to an uninterrupted run."""
    from mdmpublic_ray.state.checkpoint import CheckpointRunner

    pages, cfg, run_dir = ck_env
    g1 = _golden_df(run_er(pages, cfg))

    for s in ["pairs", "scored", "clusters", "golden"]:
        shutil.rmtree(os.path.join(run_dir, f"stage={s}"))
    kept = {
        s: os.path.getmtime(os.path.join(run_dir, f"stage={s}", "_manifest.json"))
        for s in ["deduped", "features", "blocks"]
    }

    g2 = _golden_df(run_er(pages, cfg))
    pd.testing.assert_frame_equal(g1, g2)
    for s, t in kept.items():
        assert os.path.getmtime(os.path.join(run_dir, f"stage={s}", "_manifest.json")) == t, (
            f"{s} should have been skipped"
        )


def test_changed_params_invalidate_stage(ck_env):
    """Re-running with a different ERConfig must NOT serve stale stage
    outputs even though every parent manifest is unchanged."""
    from mdmpublic_ray.state.checkpoint import CheckpointRunner

    pages, cfg, run_dir = ck_env
    run_er(pages, cfg)
    ck = CheckpointRunner(cfg.checkpoint_dir, cfg.run_id)
    scored_before = json.load(
        open(os.path.join(run_dir, "stage=scored", "_manifest.json"))
    )

    import dataclasses

    cfg2 = dataclasses.replace(cfg, threshold=0.9)
    out = run_er(pages, cfg2)
    out["golden"].count()
    scored_after = json.load(
        open(os.path.join(run_dir, "stage=scored", "_manifest.json"))
    )
    # scored re-ran under the new threshold (fresh manifest, new digest)
    assert scored_after["params_digest"] != scored_before["params_digest"]
    # and upstream stages with unchanged params were still skipped
    ck2 = CheckpointRunner(cfg.checkpoint_dir, cfg.run_id)
    assert "deduped" not in ck2.ran


def test_hot_hosts_stage_is_checkpointed(ck_env):
    pages, cfg, run_dir = ck_env
    run_er(pages, cfg)
    man = json.load(
        open(os.path.join(run_dir, "stage=hot_hosts", "_manifest.json"))
    )
    assert man["rows"] >= 1  # sentinel row guarantees non-empty


def test_manifest_diff_between_runs(ray_session, corpus_dir, tmp_path):
    import dataclasses

    import ray.data as rd

    from mdmpublic_ray.state.checkpoint import manifest_diff

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    ckdir = str(tmp_path / "ckd")
    cfg_a = ERConfig(num_partitions=8, n_buckets=16, checkpoint_dir=ckdir, run_id="a")
    run_er(pages, cfg_a)
    # run b: higher threshold → scored/clusters/golden content changes
    cfg_b = dataclasses.replace(cfg_a, run_id="b", threshold=0.95)
    run_er(pages, cfg_b)

    diff = manifest_diff(ckdir, "a", "b", deep=True).to_pandas().set_index("stage")
    # upstream deterministic stages are content-identical run over run
    assert diff.loc["deduped", "status"] == "same"
    assert diff.loc["features", "status"] == "same"
    # the thresholded stage differs (params digest at minimum)
    assert diff.loc["scored", "status"] == "changed"
    assert set(diff["status"]) <= {"same", "changed", "added", "removed"}


def test_retention_and_cadence(tmp_path):
    """S11 retention + S9 cadence policy — pure-filesystem ops, no Ray."""
    import time as _time

    from mdmpublic_ray.state.checkpoint import (
        apply_retention, cadence_mode, plan_run)

    base = str(tmp_path / "runs")
    os.makedirs(base)
    # five runs with increasing manifest ages
    now = int(_time.time())
    for i, rid in enumerate(["r1", "r2", "r3", "r4", "r5"]):
        sd = os.path.join(base, rid, "stage=x")
        os.makedirs(sd)
        with open(os.path.join(sd, "_manifest.json"), "w") as f:
            json.dump({"created_unix": now - (5 - i) * 86400, "rows": 1,
                       "fragments": []}, f)
    removed = apply_retention(base, keep_last=2)
    assert removed == ["r1", "r2", "r3"]
    assert sorted(os.listdir(base)) == ["r4", "r5"]
    # age bound: nothing outside keep is old enough → nothing removed
    assert apply_retention(base, keep_last=1, max_age_days=30) == []

    assert cadence_mode(6) == "full" and cadence_mode(2) == "diff"
    # diff day resumes the newest existing run; full day opens a new one
    p = plan_run(base, "2024-01-10", 2)
    assert p == {"mode": "diff", "run_id": "r5", "resumed": True}
    p = plan_run(base, "2024-01-14", 6)
    assert p == {"mode": "full", "run_id": "2024-01-14", "resumed": False}
    # diff with empty base falls back to fresh
    p = plan_run(str(tmp_path / "none"), "2024-01-10", 2)
    assert p["resumed"] is False


def test_empty_stage_roundtrip(ray_session, tmp_path):
    """A zero-row stage writes no parquet fragment; the manifest persists
    the schema so read_stage returns a typed empty dataset instead of
    failing on an empty directory."""
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.state.checkpoint import CheckpointRunner

    ck = CheckpointRunner(str(tmp_path / "ck"), "r")
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    ck.run_stage("empty", lambda: rd.from_arrow(schema.empty_table()))

    got = ck.read_stage("empty")
    assert got.count() == 0
    assert got.schema().base_schema.equals(schema)
    # a rerun still treats the fragment-less stage as valid → skipped
    ck2 = CheckpointRunner(str(tmp_path / "ck"), "r")
    ck2.run_stage("empty", lambda: rd.from_arrow(schema.empty_table()))
    assert ck2.skipped == ["empty"]
