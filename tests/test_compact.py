"""Lineage-preserving stage compaction: fewer fragments, identical
values, downstream stages STILL skip on resume; genuinely stale lineage
is not repaired."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray

from mdmpublic_ray.state.checkpoint import CheckpointRunner, compact_run


def _table(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {"k": np.arange(n, dtype=np.int64), "v": rng.integers(0, 100, n)}
    )


def _build(base, run_id="r0"):
    """Two-stage lineage: a (16 fragments) -> b (depends on a)."""
    ck = CheckpointRunner(str(base), run_id)
    t = _table()
    ck.run_stage("a", lambda: ray.data.from_arrow(t).repartition(16),
                 params={"p": 1})
    ck.run_stage(
        "b",
        lambda: ck.read_stage("a").map_batches(
            lambda x: x, batch_format="pyarrow"
        ),
        parents=("a",),
        params={"q": 2},
    )
    return ck, t


def _frag_count(ck, name):
    with open(ck._manifest_path(name)) as f:
        return len(json.load(f)["fragments"])


def test_compact_preserves_values_and_lineage(ray_session, tmp_path):
    ck, t = _build(tmp_path)
    assert _frag_count(ck, "a") == 16
    rep = compact_run(str(tmp_path), "r0", target_fragments=2)
    assert rep["a"]["fragments_before"] == 16
    assert rep["a"]["fragments_after"] <= 2
    assert "b" in rep["cascaded"]
    # values identical
    got = ck.read_stage("a").to_pandas().sort_values("k").reset_index(drop=True)
    assert got.equals(t.to_pandas())
    # resume: both stages skip (no recompute)
    ck2 = CheckpointRunner(str(tmp_path), "r0")

    def boom():
        raise AssertionError("stage should have been skipped")

    ck2.run_stage("a", boom, params={"p": 1})
    ck2.run_stage("b", boom, parents=("a",), params={"q": 2})
    assert ck2.skipped == ["a", "b"] and ck2.ran == []


def test_compact_skips_already_small(ray_session, tmp_path):
    ck, _ = _build(tmp_path)
    rep = compact_run(str(tmp_path), "r0", rows_per_fragment=10)  # 4000/10 > 16
    assert "a" not in rep and rep["cascaded"] == []


def test_compact_does_not_repair_stale_lineage(ray_session, tmp_path):
    ck, _ = _build(tmp_path)
    # make b's recorded parent digest genuinely stale
    mp = ck._manifest_path("b")
    with open(mp) as f:
        man = json.load(f)
    man["parents"]["a"] = "deadbeef" * 8
    with open(mp, "w") as f:
        json.dump(man, f)
    compact_run(str(tmp_path), "r0", target_fragments=2)
    ck2 = CheckpointRunner(str(tmp_path), "r0")
    ran = []
    ck2.run_stage("a", lambda: ray.data.from_arrow(_table()), params={"p": 1})
    ck2.run_stage(
        "b",
        lambda: (ran.append("b"), ray.data.from_arrow(_table()))[1],
        parents=("a",),
        params={"q": 2},
    )
    # the pre-corrupted digest must NOT have been rewritten to a's new
    # digest during the cascade — b stays invalid and rebuilds
    assert "b" in ck2.ran and ran == ["b"]


def test_compact_full_er_state_resume(ray_session, corpus_dir, tmp_path):
    """Real pipeline: compact every stage of a checkpointed run_er state,
    then rerun — every stage must still skip and golden be identical."""
    import ray.data as rd

    from mdmpublic_ray.pipelines.er import ERConfig, run_er

    pages = rd.read_parquet(f"{corpus_dir}/pages.parquet")
    cfg = ERConfig(num_partitions=8, n_buckets=16,
                   checkpoint_dir=str(tmp_path / "st"), run_id="v1")
    g1 = run_er(pages, cfg)["golden"].to_pandas()
    rep = compact_run(str(tmp_path / "st"), "v1", target_fragments=1)
    assert any(k != "cascaded" for k in rep), "expected at least one compaction"
    ck = CheckpointRunner(str(tmp_path / "st"), "v1")
    out = run_er(rd.read_parquet(f"{corpus_dir}/pages.parquet"), cfg)
    g2 = out["golden"].to_pandas()
    key = sorted(g1.columns)
    assert (
        g1[key].sort_values(key).reset_index(drop=True)
        .equals(g2[key].sort_values(key).reset_index(drop=True))
    )


def test_compact_cli(ray_session, tmp_path, capsys):
    """CLI path: `compact --run-id` reports fragment reduction as JSON."""
    from mdmpublic_ray.cli import build_parser

    _build(tmp_path, "r9")
    args = build_parser().parse_args(
        ["compact", "--state", str(tmp_path), "--run-id", "r9",
         "--target-fragments", "2"]
    )
    out = args.fn(args)
    assert out["command"] == "compact" and out["run_id"] == "r9"
    assert out["a"]["fragments_before"] == 16
    assert out["a"]["fragments_after"] <= 2
