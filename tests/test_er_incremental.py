"""Incremental ER: delta runs against checkpointed state must EQUAL a
full run over the combined corpus (the invariant stated in
``pipelines/er_incremental.py``), across new docs, new members of
existing clusters, and updated (re-crawled) docs that invalidate edges."""

from __future__ import annotations

import pandas as pd
import pytest

from mdmpublic_ray.corpus import generate_pages, split_base_delta
from mdmpublic_ray.pipelines.er import ERConfig, run_er
from mdmpublic_ray.pipelines.er_incremental import (
    run_er_incremental,
    write_state,
)


def _clusters_df(out) -> pd.DataFrame:
    return (
        out["clusters"]
        .to_pandas()
        .sort_values("url", kind="mergesort")
        .reset_index(drop=True)
    )


def _golden_df(out) -> pd.DataFrame:
    return (
        out["golden"]
        .to_pandas()
        .sort_values("cluster_id", kind="mergesort")
        .reset_index(drop=True)
    )


def _cfg(ckdir=None, run_id="base") -> ERConfig:
    return ERConfig(
        num_partitions=8,
        n_buckets=16,
        checkpoint_dir=ckdir,
        run_id=run_id,
    )


@pytest.fixture(scope="module")
def split_corpus():
    pages, truth, _ = generate_pages(n_clusters=60, seed=7)
    base, delta = split_base_delta(pages)
    assert len(base) and len(delta)
    return pages, base, delta


def test_incremental_equals_full_run(ray_session, split_corpus, tmp_path):
    import ray.data as rd

    pages, base, delta = split_corpus
    state = str(tmp_path / "state")
    run_er(rd.from_arrow(base), _cfg(state, "base"))

    inc = run_er_incremental(
        rd.from_arrow(delta), _cfg(), state_dir=state, prev_run_id="base"
    )
    diag = inc["incremental"]
    # the split plants all three delta kinds
    assert diag["n_effective"] > 0
    assert diag["n_invalidated"] > 0
    assert diag["n_new_pairs"] > 0

    full = run_er(rd.from_arrow(pages), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(inc), _golden_df(full))


def test_incremental_chain_two_deltas(ray_session, split_corpus, tmp_path):
    """Apply the delta in two halves with state published between — the
    final state must still equal the one-shot full run."""
    import zlib

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    pages, base, delta = split_corpus
    # deterministic half-split of the delta by url hash
    urls = delta["url"].to_pylist()
    first = [zlib.crc32(u.encode()) % 2 == 0 for u in urls]

    mask = pa.array(first, pa.bool_())
    d1 = delta.filter(mask)
    d2 = delta.filter(pc.invert(mask))

    state = str(tmp_path / "state")
    run_er(rd.from_arrow(base), _cfg(state, "base"))

    inc1 = run_er_incremental(
        rd.from_arrow(d1), _cfg(), state_dir=state, prev_run_id="base"
    )
    write_state(inc1, state, "inc1", _cfg())
    inc2 = run_er_incremental(
        rd.from_arrow(d2), _cfg(), state_dir=state, prev_run_id="inc1"
    )

    full = run_er(rd.from_arrow(pages), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc2), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(inc2), _golden_df(full))


def test_empty_delta_passthrough(ray_session, split_corpus, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.corpus import PAGES_SCHEMA

    _, base, _ = split_corpus
    state = str(tmp_path / "state")
    out0 = run_er(rd.from_arrow(base), _cfg(state, "base"))
    c0 = _clusters_df(out0)

    inc = run_er_incremental(
        rd.from_arrow(PAGES_SCHEMA.empty_table()),
        _cfg(),
        state_dir=state,
        prev_run_id="base",
    )
    assert inc["incremental"]["n_effective"] == 0
    pd.testing.assert_frame_equal(_clusters_df(inc), c0)


def test_stale_redelivery_is_noop(ray_session, split_corpus, tmp_path):
    """Re-delivering rows already in the state (same or older warc_ts)
    must change nothing — the incumbent wins ties."""
    import pyarrow as pa
    import ray.data as rd

    _, base, _ = split_corpus
    state = str(tmp_path / "state")
    out0 = run_er(rd.from_arrow(base), _cfg(state, "base"))
    c0 = _clusters_df(out0)

    resend = base.slice(0, min(50, len(base)))
    inc = run_er_incremental(
        rd.from_arrow(resend), _cfg(), state_dir=state, prev_run_id="base"
    )
    assert inc["incremental"]["n_effective"] == 0
    pd.testing.assert_frame_equal(_clusters_df(inc), c0)


def test_candidate_pairs_delta_invariant(ray_session):
    """Randomized (seeded) set identity: for any flagged block table,
    delta pair-gen must emit exactly full-pairs(all members) minus
    full-pairs(old members only) — same caps, same dedup."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.pipelines.er_incremental import candidate_pairs_delta
    from mdmpublic_ray.stages.pairs import candidate_pairs

    rng = np.random.default_rng(5)
    n_rows = 3000
    keys = rng.integers(0, 150, n_rows, dtype=np.int64)  # some blocks big
    uids = rng.integers(0, 800, n_rows, dtype=np.int64)
    new_uid = rng.random(800) < 0.3
    is_new = new_uid[uids]
    tbl = pa.table(
        {
            "block_key": pa.array(keys),
            "uid": pa.array(uids),
            "is_new": pa.array(is_new),
        }
    )
    cap = 40  # below some block sizes → exercises the cap path too

    def pairs_set(ds_pairs):
        df = ds_pairs.to_pandas()
        return set(zip(df["uid_a"], df["uid_b"]))

    got = pairs_set(
        candidate_pairs_delta(
            rd.from_arrow(tbl), max_block_size=cap, n_buckets=8
        )
    )
    all_pairs = pairs_set(
        candidate_pairs(
            rd.from_arrow(tbl.select(["block_key", "uid"])),
            max_block_size=cap,
            n_buckets=8,
        )
    )
    old_tbl = tbl.filter(pa.compute.invert(tbl["is_new"]))
    # old-only pair-gen must see the SAME block membership (old rows of
    # full blocks), hence same cap decisions are NOT guaranteed — compute
    # instead: expected = pairs involving >=1 new uid within full blocks
    new_set = set(np.flatnonzero(new_uid))
    expected = {p for p in all_pairs if p[0] in new_set or p[1] in new_set}
    assert got == expected


def test_golden_diff_statuses(ray_session, split_corpus, tmp_path):
    """Record-level run-over-run diff: statuses must exactly partition
    prev ∪ cur cluster ids, with added/removed derived from set algebra."""
    import ray.data as rd

    from mdmpublic_ray.pipelines.er_incremental import golden_diff

    _, base, delta = split_corpus
    state = str(tmp_path / "state")
    out0 = run_er(rd.from_arrow(base), _cfg(state, "base"))
    prev_golden = out0["golden"]
    inc = run_er_incremental(
        rd.from_arrow(delta), _cfg(), state_dir=state, prev_run_id="base"
    )

    d = golden_diff(prev_golden, inc["golden"]).to_pandas()
    prev_ids = set(prev_golden.to_pandas()["cluster_id"])
    cur_ids = set(inc["golden"].to_pandas()["cluster_id"])

    assert set(d["cluster_id"]) == prev_ids | cur_ids
    assert len(d) == len(prev_ids | cur_ids)
    by = {s: set(g["cluster_id"]) for s, g in d.groupby("status")}
    assert by.get("added", set()) == cur_ids - prev_ids
    assert by.get("removed", set()) == prev_ids - cur_ids
    # the delta plants new docs → some clusters must be added or changed
    assert by.get("added") or by.get("changed")
    # untouched clusters report same with stable member counts
    same = d[d["status"] == "same"]
    assert len(same) > 0
    assert (same["n_members_prev"] == same["n_members_cur"]).all()


def test_update_splits_cluster(ray_session, tmp_path):
    """The hardest incremental path: an UPDATED page whose new text is
    unrelated must leave its old cluster (stale edges dropped, affected
    cluster re-closed from surviving edges) — and the result must still
    equal the full run over the combined corpus."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.corpus import PAGES_SCHEMA, build_html

    host = "site-000.example"

    def page(url, ts, toks, crawl=0):
        text = " ".join(toks)
        return {
            "url": url,
            "warc_ts": ts,
            "html": build_html(" ".join(toks[:3]), [text], f"crawl {crawl}"),
            "text": text,
            "lang": "en",
        }

    t0 = dt.datetime(2024, 1, 1)
    shared = [f"tok{i}" for i in range(40)]
    other = [f"zzz{i}" for i in range(40)]
    # base: a 3-member cluster (a, b, c near-identical) + an unrelated pair
    base_rows = [
        page(f"https://{host}/a", t0, shared),
        page(f"https://{host}/b", t0, shared[:-1] + ["tokx"]),
        page(f"https://{host}/c", t0, shared[:-2] + ["toky", "tokz"]),
        page(f"https://{host}/d", t0, other),
        page(f"https://{host}/e", t0, other[:-1] + ["zzzx"]),
    ]
    # delta: /b re-crawled with COMPLETELY different text → must leave
    # {a,b,c}; a and c must STAY clustered via their own direct edge
    new_text = [f"qqq{i}" for i in range(40)]
    delta_rows = [page(f"https://{host}/b", t0 + dt.timedelta(days=1), new_text, 1)]

    def tbl(rows):
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    state = str(tmp_path / "state")
    out0 = run_er(rd.from_arrow(tbl(base_rows)), _cfg(state, "base"))
    c0 = dict(
        zip(*(lambda d: (d["url"], d["cluster_id"]))(_clusters_df(out0)))
    )
    assert c0[f"https://{host}/a"] == c0[f"https://{host}/b"] == c0[f"https://{host}/c"]

    inc = run_er_incremental(
        rd.from_arrow(tbl(delta_rows)), _cfg(), state_dir=state, prev_run_id="base"
    )
    assert inc["incremental"]["n_invalidated"] == 1
    ci = dict(
        zip(*(lambda d: (d["url"], d["cluster_id"]))(_clusters_df(inc)))
    )
    # b left; a and c still together
    assert ci[f"https://{host}/a"] == ci[f"https://{host}/c"]
    assert ci[f"https://{host}/b"] != ci[f"https://{host}/a"]

    full = run_er(rd.from_arrow(tbl(base_rows + delta_rows)), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(inc), _golden_df(full))


def test_incremental_with_hot_host_salting(ray_session, tmp_path):
    """Skew path: base state built WITH an active hot-host table (small
    max_block_size forces the big portal hot); the delta reuses the
    recorded salt table so its block keys stay comparable, and the final
    clustering must still be perfect against planted truth."""
    import ray.data as rd

    from mdmpublic_ray.corpus import generate_pages, split_base_delta
    from mdmpublic_ray.pipelines.er import pairwise_metrics

    pages, truth, labels = generate_pages(
        n_clusters=50, seed=13, hot_host_frac=0.5
    )
    base, delta = split_base_delta(pages)

    def cfg(ck=None, rid="base"):
        c = _cfg(ck, rid)
        c.max_block_size = 32  # big-portal exceeds this → salted
        return c

    state = str(tmp_path / "state")
    out0 = run_er(rd.from_arrow(base), cfg(state, "base"))
    hot = {
        r["host"]
        for r in out0["hot_hosts"].take_all()
        if r["n_pages"] >= 0 and r["host"]
    }
    assert "big-portal.example" in hot  # the salt table is genuinely active

    inc = run_er_incremental(
        rd.from_arrow(delta), cfg(), state_dir=state, prev_run_id="base"
    )
    m = pairwise_metrics(inc["clusters"], rd.from_arrow(labels))
    assert m["f1"] == 1.0, m


def test_missing_state_raises(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.corpus import PAGES_SCHEMA

    with pytest.raises(ValueError, match="missing stages"):
        run_er_incremental(
            rd.from_arrow(PAGES_SCHEMA.empty_table()),
            _cfg(),
            state_dir=str(tmp_path / "nope"),
            prev_run_id="ghost",
        )


def test_corrupt_state_raises(ray_session, split_corpus, tmp_path):
    """A truncated fragment in the published state must fail loudly at
    entry (manifest-vs-fragment validation), not crash mid-pipeline."""
    import glob
    import os

    import ray.data as rd

    from mdmpublic_ray.corpus import PAGES_SCHEMA

    _, base, _ = split_corpus
    state = str(tmp_path / "state")
    run_er(rd.from_arrow(base), _cfg(state, "base"))
    frag = sorted(glob.glob(os.path.join(state, "base", "stage=features", "*.parquet")))[0]
    with open(frag, "r+b") as f:
        f.truncate(os.path.getsize(frag) // 2)
    with pytest.raises(ValueError, match="invalid/corrupt"):
        run_er_incremental(
            rd.from_arrow(PAGES_SCHEMA.empty_table()),
            _cfg(),
            state_dir=state,
            prev_run_id="base",
        )


def test_config_mismatch_raises(ray_session, split_corpus, tmp_path):
    """Processing a delta with a different seed/threshold than the state
    was built with silently breaks equivalence — it must fail loudly."""
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.corpus import PAGES_SCHEMA

    _, base, _ = split_corpus
    state = str(tmp_path / "state")
    run_er(rd.from_arrow(base), _cfg(state, "base"))

    bad = _cfg()
    bad.seed = 99
    with pytest.raises(ValueError, match="ERConfig mismatch"):
        run_er_incremental(
            rd.from_arrow(PAGES_SCHEMA.empty_table()),
            bad,
            state_dir=state,
            prev_run_id="base",
        )

    # snm_window >= 2 is structurally unsupported on the delta path (SNM
    # pairs need the GLOBAL sort order): refuse before touching state, and
    # also catch a state built with SNM on via the pairs params digest.
    snm = _cfg()
    snm.snm_window = 3
    with pytest.raises(ValueError, match="snm_window"):
        run_er_incremental(
            rd.from_arrow(PAGES_SCHEMA.empty_table()),
            snm,
            state_dir=state,
            prev_run_id="base",
        )


def test_write_state_replaces_and_keeps_hot_hosts(ray_session, split_corpus, tmp_path):
    """write_state must (a) carry the hot-host table from run_er's output
    (checkpoint-less base runs included) and (b) REPLACE an existing
    run_id rather than silently serving the stale state."""
    import ray.data as rd

    from mdmpublic_ray.state.checkpoint import CheckpointRunner

    pages, base, delta = split_corpus
    state = str(tmp_path / "state")

    out0 = run_er(rd.from_arrow(base), _cfg())  # NO checkpoint dir
    assert "hot_hosts" in out0
    write_state(out0, state, "latest", _cfg())
    assert "hot_hosts" in CheckpointRunner(state, "latest").stage_names()

    inc = run_er_incremental(
        rd.from_arrow(delta), _cfg(), state_dir=state, prev_run_id="latest"
    )
    full = run_er(rd.from_arrow(pages), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc), _clusters_df(full))

    # republish under the SAME id: the new (post-delta) state must win
    write_state(inc, state, "latest", _cfg())
    rows = CheckpointRunner(state, "latest").read_stage("clusters").count()
    assert rows == len(_clusters_df(full))


def _purge(tbl, urls):
    import pyarrow as pa
    import pyarrow.compute as pc

    m = pc.is_in(tbl["url"], value_set=pa.array(sorted(urls), pa.string()))
    return tbl.filter(pc.invert(m))


def _pick_deletions(out):
    """(a multi-member cluster's representative, another member, a
    singleton url) from a resolved state."""
    clusters = out["clusters"].to_pandas()
    sizes = clusters.groupby("cluster_id").size().sort_values(ascending=False)
    multi = sizes[sizes >= 3].index[0]
    members = sorted(clusters[clusters["cluster_id"] == multi]["url"])
    singleton = sizes[sizes == 1].index[0]  # cluster_id == url for singletons
    return members[0], members[1], singleton


def test_incremental_deletion_only(ray_session, split_corpus, tmp_path):
    """Tombstones with an empty delta: deleting a cluster REPRESENTATIVE
    (min-url member) and a singleton must equal the full run over the
    purged corpus — the surviving members re-close and re-label."""
    import ray.data as rd

    pages, base, delta = split_corpus
    state = str(tmp_path / "state")
    out = run_er(rd.from_arrow(base), _cfg(state, "base"))
    rep, _other, singleton = _pick_deletions(out)
    deleted = {rep, singleton}

    inc = run_er_incremental(
        rd.from_arrow(base.schema.empty_table()),
        _cfg(),
        state_dir=state,
        prev_run_id="base",
        deleted_urls=sorted(deleted) + ["http://nonexistent.example/x"],
    )
    assert inc["incremental"]["n_deleted"] == 2
    assert inc["incremental"]["n_effective"] == 0

    full = run_er(rd.from_arrow(_purge(base, deleted)), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(inc), _golden_df(full))
    # deleted urls are gone from every state surface
    dd = inc["deduped"].to_pandas()
    assert not set(dd["url"]) & deleted


def test_incremental_delete_and_add(ray_session, split_corpus, tmp_path):
    """Deletions alongside a normal delta: result equals the full run
    over (base − deleted) + delta."""
    import ray.data as rd

    pages, base, delta = split_corpus
    state = str(tmp_path / "state")
    out = run_er(rd.from_arrow(base), _cfg(state, "base"))
    _rep, other, singleton = _pick_deletions(out)
    deleted = {other, singleton}

    inc = run_er_incremental(
        rd.from_arrow(delta),
        _cfg(),
        state_dir=state,
        prev_run_id="base",
        deleted_urls=sorted(deleted),
    )
    assert inc["incremental"]["n_deleted"] == 2

    import pyarrow as pa

    combined = pa.concat_tables([_purge(base, deleted), delta])
    full = run_er(rd.from_arrow(combined), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(inc), _golden_df(full))


def test_incremental_readd_after_delete(ray_session, split_corpus, tmp_path):
    """A url that is deleted AND re-delivered in the same increment is
    re-added with the delta content regardless of crawl timestamp."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    pages, base, delta = split_corpus
    state = str(tmp_path / "state")
    out = run_er(rd.from_arrow(base), _cfg(state, "base"))
    rep, _other, singleton = _pick_deletions(out)
    deleted = {rep, singleton}

    readd_rows = base.filter(pc.equal(base["url"], rep))  # same ts as incumbent
    inc = run_er_incremental(
        rd.from_arrow(readd_rows),
        _cfg(),
        state_dir=state,
        prev_run_id="base",
        deleted_urls=sorted(deleted),
    )
    d = inc["incremental"]
    assert d["n_deleted"] == 2 and d["n_effective"] == 1

    full = run_er(rd.from_arrow(_purge(base, {singleton})), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(inc), _golden_df(full))


def test_incremental_chain_delete_then_delta(ray_session, split_corpus, tmp_path):
    """Deletions chain like any increment: delete → write_state → apply
    the delta against the published state; final state equals the full
    run over (base − deleted) + delta."""
    import pyarrow as pa
    import ray.data as rd

    pages, base, delta = split_corpus
    state = str(tmp_path / "state")
    out = run_er(rd.from_arrow(base), _cfg(state, "base"))
    _rep, other, singleton = _pick_deletions(out)
    deleted = {other, singleton}

    inc1 = run_er_incremental(
        rd.from_arrow(base.schema.empty_table()),
        _cfg(),
        state_dir=state,
        prev_run_id="base",
        deleted_urls=sorted(deleted),
    )
    write_state(inc1, state, "afterdel", _cfg())

    inc2 = run_er_incremental(
        rd.from_arrow(delta), _cfg(), state_dir=state, prev_run_id="afterdel"
    )

    combined = pa.concat_tables([_purge(base, deleted), delta])
    full = run_er(rd.from_arrow(combined), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(inc2), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(inc2), _golden_df(full))


# ---------------------------------------------------------------------------
# Run-over-run plan selection (round-3 review item #3)
# ---------------------------------------------------------------------------


def test_choose_incremental_plan_cost_model():
    from mdmpublic_ray.pipelines.er_incremental import choose_incremental_plan

    # bench-scale calibration point: full wall below the delta path's
    # fixed overhead → full rerun wins
    d = choose_incremental_plan(713, 6537, 1.75)
    assert d["plan"] == "full"
    # soak-scale: big corpus, ~1% delta → delta path wins
    d = choose_incremental_plan(2_200, 220_000, 70.0)
    assert d["plan"] == "delta"
    # huge delta fraction is out of the incremental envelope
    d = choose_incremental_plan(120_000, 220_000, 70.0)
    assert d["plan"] == "full" and "fraction" in d["reason"]
    # no usable previous state
    assert choose_incremental_plan(10, 0, 0.0)["plan"] == "full"


def test_auto_plan_full_rerun_equals_incremental(ray_session, split_corpus, tmp_path):
    """At test scale the planner must choose the full rerun, and the
    auto result must equal both the plain full run and the delta path
    (the standing equivalence invariant)."""
    import ray.data as rd

    from mdmpublic_ray.pipelines.er_incremental import run_er_incremental_auto

    pages, base, delta = split_corpus
    state = str(tmp_path / "state_auto")
    run_er(rd.from_arrow(base), _cfg(state, "base"))

    auto = run_er_incremental_auto(
        rd.from_arrow(delta), _cfg(), state_dir=state, prev_run_id="base",
        full_pages_ds=rd.from_arrow(pages),
    )
    assert auto["incremental"]["plan"] == "full"
    full = run_er(rd.from_arrow(pages), _cfg())
    pd.testing.assert_frame_equal(_clusters_df(auto), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(auto), _golden_df(full))

    # without a full corpus the decision degrades to the delta path,
    # which still equals the full result (equivalence invariant)
    fallback = run_er_incremental_auto(
        rd.from_arrow(delta), _cfg(), state_dir=state, prev_run_id="base",
    )
    assert fallback["incremental"]["plan"] == "delta"
    assert "no full corpus" in fallback["incremental"]["reason"]
    pd.testing.assert_frame_equal(_clusters_df(fallback), _clusters_df(full))


def test_auto_plan_deletions_take_delta_path(ray_session, split_corpus, tmp_path):
    import ray.data as rd

    from mdmpublic_ray.pipelines.er_incremental import run_er_incremental_auto

    pages, base, delta = split_corpus
    state = str(tmp_path / "state_del")
    run_er(rd.from_arrow(base), _cfg(state, "base"))
    tomb = sorted(set(base["url"].to_pylist()))[::50]
    out = run_er_incremental_auto(
        rd.from_arrow(base.schema.empty_table()), _cfg(),
        state_dir=state, prev_run_id="base",
        full_pages_ds=rd.from_arrow(pages), deleted_urls=tomb,
    )
    assert out["incremental"]["plan"] == "delta"
    assert out["incremental"]["n_deleted"] == len(tomb)


def test_auto_plan_full_rerun_never_serves_stale_checkpoint(
    ray_session, split_corpus, tmp_path
):
    """Round-4 advice: a state-maintaining caller passing
    cfg.checkpoint_dir=state_dir with cfg.run_id=prev_run_id must NOT
    have the full rerun served from the OLD corpus's checkpoints (stage
    params/parents are unchanged, so CheckpointRunner would consider
    them valid and silently drop the delta)."""
    import ray.data as rd

    from mdmpublic_ray.pipelines.er_incremental import run_er_incremental_auto

    pages, base, delta = split_corpus
    state = str(tmp_path / "state_stale")
    run_er(rd.from_arrow(base), _cfg(state, "base"))

    # the hazardous config: same checkpoint dir AND same run_id
    out = run_er_incremental_auto(
        rd.from_arrow(delta), _cfg(state, "base"),
        state_dir=state, prev_run_id="base",
        full_pages_ds=rd.from_arrow(pages),
    )
    assert out["incremental"]["plan"] == "full"
    full = run_er(rd.from_arrow(pages), _cfg())
    # stale-serve would reproduce the BASE corpus's clusters instead
    pd.testing.assert_frame_equal(_clusters_df(out), _clusters_df(full))
    pd.testing.assert_frame_equal(_golden_df(out), _golden_df(full))
