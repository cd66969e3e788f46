"""Incremental entity resolution: resolve a DELTA of new/updated pages
against the checkpointed state of a previous run, touching work
proportional to the delta — not the corpus.

At 10^12-document scale a daily crawl delta is ~1% of the corpus; a full
re-run re-shuffles everything. This is the run-over-run half of the
reference's diff-style jobs (SURVEY.md §2.9 / ST6 — e.g. the monitor
family diffing current vs previous state,
``/root/reference/bash/monitor_server_filechanges/
monitor_server_filechanges.sh:154-159``, and the full/diff backup cadence
``python/db_backup/cb_backup.py:62-93``) applied to the MDM matching flow
itself. The incremental plan:

1. delta extract → dedup-latest (the same operators as the full pipeline)
2. winner resolution vs previous state: a delta url is EFFECTIVE iff it
   is new or strictly newer than the incumbent crawl; replaced incumbents
   become INVALIDATED (their features / blocks / match edges are stale).
   Ties on equal ``warc_ts`` keep the incumbent (a re-delivered crawl is
   a no-op).
3. features + blocking for effective delta rows only (the previous run's
   hot-host table is reused so block keys stay comparable run-over-run;
   the weekly FULL run of ``state.checkpoint.cadence_mode`` re-derives
   skew from scratch)
4. touched-block discovery: broadcast the delta's block-key set
   (``ray.put`` once) and linear-scan the previous blocks checkpoint — a
   pure map filter, no all-to-all. Candidate pairs are generated ONLY
   inside touched blocks, and ONLY pairs with >=1 delta member (old×old
   pairs were already scored last run).
5. scoring features: the previous features checkpoint is linear-scan
   filtered to the old uids actually appearing in new pairs, union'd
   with the delta features, and scored by the standard vectorized scorer.
6. clustering on a CONTRACTED graph: an unaffected previous cluster
   collapses to its representative (cluster_id == min member url, so
   contraction preserves the min-label invariant); clusters containing an
   invalidated url are re-closed from their surviving previous edges
   (an update can SPLIT a cluster); connected components runs over
   delta urls + affected members + touched representatives only.
7. golden records are recomputed only for clusters whose membership
   changed; every other golden row passes through from the previous run.

Equivalence: with deterministic scoring, an unchanged hot-host set and no
block-size-cap crossings, the incremental result EQUALS ``run_er`` over
(previous corpus + delta) — asserted by ``tests/test_er_incremental.py``.
The excluded cases are exactly where a full periodic re-run (the FULL leg
of the backup cadence) re-syncs the state. The sorted-neighborhood
blocking pass (``ERConfig.snm_window >= 2``) is one of them BY
CONSTRUCTION: SNM pairs depend on each row's neighbors in the GLOBAL
(title, uid) sort order, which a delta cannot know without re-sorting the
corpus — so ``run_er_incremental`` refuses such configs loudly (and the
pairs-stage param digest check catches a state built with SNM on).

Scale shape: the corpus is only ever touched by embarrassingly-parallel
map scans over the columnar checkpoints (broadcast-filter via ``ray.put``
+ ``pc.is_in``) — never a shuffle. Everything shuffled or collected is
delta-sized; driver-side sets (delta urls, touched keys, affected
members, new-edge endpoints) are guarded by ``delta_cap``. At 100 TB the
broadcast filters become bloom filters and the checkpoint scans prune by
partition, but the dataflow is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.blocking import (
    FEATURES_HASHV,
    block_keys_stage,
    doc_uid,
    features_stage,
)
from ..stages.cluster import connected_components
from ..stages.dedup import dedup_latest
from ..stages.extract import extract_stage
from ..stages.golden import golden_records
from ..stages.util import pruned_scan
from ..stages.pairs import dedup_pairs
from ..stages.scoring import score_pairs
from ..state.checkpoint import CheckpointRunner
from .er import ERConfig, run_er

# The incremental path collects delta-bounded sets on the driver; beyond
# this the full pipeline is the right tool (and the error says so).
DELTA_CAP = 2_000_000

STATE_STAGES = ("deduped", "features", "blocks", "scored", "clusters", "golden")


# Above this many values, FP-tolerant broadcast filters switch from an
# exact Arrow value set to a Bloom filter (functions/bloom.py) — at 10^9
# delta keys the exact set is too big to probe per batch, the Bloom
# filter is a fixed-size bit array probed with k gathers.
BLOOM_MIN = 100_000


def _share_values(arr: np.ndarray, *, approx_ok: bool, bloom_min: int | None = None):
    """ray.put either the exact int64 value set or (over ``bloom_min``,
    when the call site tolerates false positives) a Bloom filter.
    ``bloom_min`` defaults to the module's BLOOM_MIN at CALL time (tests
    monkeypatch it to force the Bloom route)."""
    import ray

    from ..functions.bloom import BloomFilter

    if bloom_min is None:
        bloom_min = BLOOM_MIN
    if approx_ok and arr.size > bloom_min:
        return ray.put(BloomFilter.build(arr))
    return ray.put(pa.array(arr, pa.int64()))


def _isin_scan(ds, col: str, value_ref, *, keep: bool = True):
    """Broadcast-filter map scan: keep (or drop) rows whose ``col`` is in
    the ``ray.put``-shared value set — an exact Arrow array, or a Bloom
    filter (keep-side only; the producing site must tolerate false
    positives — see functions/bloom.py for the per-site analysis). Pure
    map — the corpus-sized side streams, the delta-sized side rides the
    object store once per node."""

    def f(t: pa.Table) -> pa.Table:
        import ray

        from ..functions.bloom import BloomFilter

        vs = ray.get(value_ref)
        if isinstance(vs, BloomFilter):
            assert keep, "Bloom filters admit false positives; drop-side filters must be exact"
            m = pa.array(vs.contains_many(t[col].to_numpy(zero_copy_only=False)))
            return t.filter(m)
        m = pc.is_in(t[col], value_set=vs)
        return t.filter(m if keep else pc.invert(m))

    return ds.map_batches(f, batch_format="pyarrow")


def _to_pandas(ds, cols: list[str], *, cap: int | None = None, what: str = "") -> pd.DataFrame:
    """Driver collect that survives empty datasets (a zero-row Dataset
    loses its schema through filter scans, so ``to_pandas`` returns a
    column-less frame — rebuild the expected empty columns) and, when
    ``cap`` is given, bounds driver memory BEFORE absorbing the data:
    ``limit(cap+1)`` streams and stops early, so an oversized collect
    raises without the driver ever holding more than ``cap`` rows."""
    if cap is not None:
        df = ds.limit(cap + 1).to_pandas()
        if len(df) > cap:
            raise ValueError(
                f"incremental driver collect '{what}' exceeds {cap} rows; "
                "the delta/affected set is too large — run the full pipeline"
            )
    else:
        df = ds.to_pandas()
    if df.shape[1] == 0:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
    return df


def _column_numpy(ds, col: str):
    """One column of a (bounded) dataset to the driver as a numpy array."""
    return _to_pandas(ds.select_columns([col]), [col])[col].to_numpy()


def _distinct_int64(ds, col: str) -> np.ndarray:
    """Distinct values of an int64 column, with a per-batch ``np.unique``
    combiner so only each block's distinct set reaches the driver."""

    def u(t: pa.Table) -> pa.Table:
        vals = np.unique(t[col].to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(vals, pa.int64())})

    return np.unique(
        _column_numpy(ds.map_batches(u, batch_format="pyarrow"), col)
    )


def candidate_pairs_delta(
    blocks_flagged,
    *,
    max_block_size: int = 256,
    n_buckets: int = 64,
):
    """(block_key, uid, is_new) → deduped pairs(uid_a, uid_b) where at
    least one side is new.

    Identical block semantics to ``pairs.candidate_pairs`` (the size cap
    applies to the COMBINED block, matching what a full run over the
    merged corpus would see), but emits only new×new triangles and
    new×old cross pairs — old×old pairs were generated and scored by the
    previous run."""
    from ..stages.util import add_bucket

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, g in df.groupby("block_key", sort=False):
            uids = g["uid"].to_numpy()
            flags = g["is_new"].to_numpy(dtype=bool)
            order = np.argsort(uids, kind="mergesort")
            uids = uids[order]
            flags = flags[order]
            first = np.ones(uids.size, dtype=bool)
            first[1:] = uids[1:] != uids[:-1]
            starts = np.flatnonzero(first)
            # a uid can appear via several key rows; it is "new" if ANY is
            merged_flags = np.maximum.reduceat(
                flags.astype(np.int8), starts
            ).astype(bool)
            u = uids[first]
            n = u.size
            if n < 2 or n > max_block_size:
                continue
            new_u = u[merged_flags]
            old_u = u[~merged_flags]
            if new_u.size == 0:
                continue
            if new_u.size >= 2:
                ii, jj = np.triu_indices(new_u.size, k=1)
                out_a.append(new_u[ii])
                out_b.append(new_u[jj])
            if old_u.size:
                A = np.repeat(new_u, old_u.size)
                B = np.tile(old_u, new_u.size)
                out_a.append(np.minimum(A, B))
                out_b.append(np.maximum(A, B))
        if not out_a:
            return pd.DataFrame(
                {
                    "uid_a": pd.Series([], dtype="int64"),
                    "uid_b": pd.Series([], dtype="int64"),
                }
            )
        res = pd.DataFrame(
            {"uid_a": np.concatenate(out_a), "uid_b": np.concatenate(out_b)}
        )
        return res.drop_duplicates()

    pairs = (
        add_bucket(blocks_flagged, "block_key", n_buckets)
        .groupby("_bucket")
        .map_groups(gen, batch_format="pandas")
    )
    return dedup_pairs(pairs, n_buckets=n_buckets)


def _flag(value: bool):
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_new", pa.array(np.full(len(t), value), pa.bool_())
        )

    return f


def _stage_params(cfg: ERConfig) -> dict[str, dict]:
    """The per-stage parameters that must MATCH between the state
    producer and an incremental consumer for result equivalence (the
    same params run_er records in its stage manifests)."""
    return {
        # each entry must mirror run_er's stage record exactly (digest
        # compare) — including the conditional emb keys, so a state built
        # with the cosine-over-embedding signal (which the delta path
        # refuses, see run_er_incremental) fails the compat check loudly.
        "features": {
            "seed": cfg.seed,
            "hashv": FEATURES_HASHV,
            **({"emb_dim": cfg.emb_dim} if cfg.emb_dim else {}),
        },
        "blocks": {
            "max_block_size": cfg.max_block_size,
            "salt_hot_hosts": cfg.salt_hot_hosts,
            "hashv": FEATURES_HASHV,
        },
        # catches a state built with snm_window >= 2, which the delta path
        # cannot reproduce (see module docstring).
        "pairs": {"max_block_size": cfg.max_block_size, "snm_window": cfg.snm_window},
        "scored": {
            "threshold": cfg.threshold,
            **({"emb_weight": cfg.emb_weight} if cfg.emb_weight else {}),
        },
    }


def write_state(
    outputs: dict, state_dir: str, run_id: str, cfg: ERConfig | None = None
) -> CheckpointRunner:
    """Publish a result dict (from ``run_er`` or ``run_er_incremental``)
    as a checkpointed state under ``state_dir/run_id`` so a later
    incremental run can resume from it. Writes the :data:`STATE_STAGES`
    plus ``hot_hosts`` when present.

    An existing ``run_id`` directory is REPLACED (publication semantics —
    without this, CheckpointRunner would see valid manifests and silently
    keep the old state). The replace is write-aside-then-swap: the
    incoming datasets may be lazy scans OVER the old state's parquet, so
    the old directory must stay readable until every stage is written.
    Pass ``cfg`` to record the stage-relevant parameters in the manifests
    so a later ``run_er_incremental`` can verify config compatibility."""
    import os
    import shutil

    tmp_id = f".publishing-{run_id}"
    tmp = CheckpointRunner(state_dir, tmp_id)
    shutil.rmtree(tmp.dir, ignore_errors=True)
    tmp = CheckpointRunner(state_dir, tmp_id)
    params = _stage_params(cfg) if cfg is not None else {}
    for name in STATE_STAGES + (("hot_hosts",) if "hot_hosts" in outputs else ()):
        ds = outputs[name]
        tmp.run_stage(name, lambda ds=ds: ds, params=params.get(name))
    final_dir = os.path.join(state_dir, run_id)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp.dir, final_dir)
    return CheckpointRunner(state_dir, run_id)


def _check_cfg_compat(prev: CheckpointRunner, cfg: ERConfig) -> None:
    """The full-run-equivalence contract requires the delta to be
    processed with the SAME seed / block cap / threshold the state was
    built with. The manifests record exactly those params (run_er and
    write_state both write them) — compare their digests and fail loudly
    on a mismatch instead of silently producing orphan singletons."""
    import hashlib
    import json

    mismatched = []
    for stage, params in _stage_params(cfg).items():
        mp = prev._manifest_path(stage)
        try:
            with open(mp) as f:
                recorded = json.load(f).get("params_digest")
        except OSError:
            continue
        if recorded is None:
            continue  # state published without cfg — nothing to check
        expected = hashlib.sha256(
            json.dumps(params, sort_keys=True).encode()
        ).hexdigest()
        if recorded != expected:
            mismatched.append(stage)
    if mismatched:
        raise ValueError(
            f"ERConfig mismatch vs previous state for stages {mismatched}: "
            "the incremental run must use the same seed / max_block_size / "
            "salt_hot_hosts / snm_window / threshold the state was built with"
        )


def run_er_incremental(
    delta_pages_ds,
    cfg: ERConfig | None = None,
    *,
    state_dir: str,
    prev_run_id: str,
    delta_cap: int = DELTA_CAP,
    deleted_urls=None,
) -> dict:
    """Resolve ``delta_pages_ds`` against the previous run's checkpointed
    state; returns the COMBINED state (same keys as ``run_er``: deduped,
    features, blocks, scored, clusters, golden) plus incremental
    diagnostics under ``"incremental"``. Pass the result to
    :func:`write_state` to persist it for the next delta.

    ``deleted_urls``: urls to REMOVE from the corpus (tombstones — the
    right-to-erasure / dead-page half of run-over-run MDM). Semantics:
    the result equals ``run_er`` over (previous corpus − deleted) +
    delta. A deleted url's features, block rows and match edges are
    purged; clusters it belonged to are re-closed from their surviving
    edges (removing a bridge member can SPLIT a cluster) and their
    golden records recomputed. A url both deleted and re-delivered in
    the delta is re-added with the delta's content regardless of crawl
    timestamp (the incumbent no longer counts). Unknown urls are
    ignored. Deletion-only calls (empty delta) are supported."""
    import ray
    import ray.data as rd

    from ..stages.util import default_partitions

    cfg = cfg or ERConfig()
    if cfg.snm_window >= 2:
        raise ValueError(
            "run_er_incremental does not support ERConfig.snm_window >= 2: "
            "sorted-neighborhood pairs depend on the GLOBAL (title, uid) "
            "sort order, which a delta cannot reproduce without re-sorting "
            "the corpus — run the full pipeline for SNM configs (see module "
            "docstring, excluded cases)"
        )
    if cfg.emb_dim or cfg.emb_weight:
        raise ValueError(
            "run_er_incremental does not support the cosine-over-embedding "
            "scoring signal (ERConfig.emb_dim / emb_weight): the delta "
            "scorer does not carry the emb column — run the full pipeline "
            "for embedding-scored configs (the stage-params compat check "
            "also refuses states built with it)"
        )
    if cfg.num_partitions is None:
        cfg.num_partitions = default_partitions()

    prev = CheckpointRunner(state_dir, prev_run_id)
    have = set(prev.stage_names())
    missing = [s for s in STATE_STAGES if s not in have]
    if missing:
        raise ValueError(
            f"previous run '{prev_run_id}' in {state_dir} is missing stages "
            f"{missing}; run the full pipeline with a checkpoint_dir first"
        )
    _check_cfg_compat(prev, cfg)
    corrupt = [s for s in STATE_STAGES if not prev.is_valid(s)]
    if corrupt:
        raise ValueError(
            f"previous run '{prev_run_id}' has invalid/corrupt stages "
            f"{corrupt} (manifest-vs-fragment mismatch); re-publish the "
            "state or run the full pipeline"
        )
    prev_deduped = prev.read_stage("deduped")
    prev_features = prev.read_stage("features")
    prev_blocks = prev.read_stage("blocks")
    prev_scored = prev.read_stage("scored")
    prev_clusters = prev.read_stage("clusters")
    prev_golden = prev.read_stage("golden")
    hot_hosts: dict = {}
    if "hot_hosts" in have:
        hot_hosts = {
            r["host"]: int(r["n_pages"])
            for r in prev.read_stage("hot_hosts").take_all()
            if r["n_pages"] >= 0
        }

    # ---- 0. tombstones: which requested deletions actually exist --------
    req_del = sorted(set(deleted_urls or []))
    if len(req_del) > delta_cap:
        raise ValueError(
            f"{len(req_del)} deletions > delta_cap={delta_cap}; "
            "run the full pipeline over the purged corpus instead"
        )
    del_present: set = set()
    if req_del:
        dref = ray.put(pa.array(req_del, pa.string()))
        del_present = set(
            _to_pandas(
                _isin_scan(pruned_scan(prev_deduped, ["url"]), "url", dref),
                ["url"],
                cap=delta_cap,
                what="deleted urls",
            )["url"]
        )

    # ---- 1. delta extract + dedup-latest (the standard entry stages) ----
    delta_schema = delta_pages_ds.schema()
    if delta_schema is None:
        # a zero-row Dataset loses its schema in Ray; deletion-only calls
        # legitimately pass one — treat as an empty delta
        delta_deduped = rd.from_arrow(
            pa.schema(
                [
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us")),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                ]
            ).empty_table()
        )
    else:
        cols = delta_schema.names
        slim = (
            delta_pages_ds.select_columns([c for c in cols if c != "text"])
            if "text" in cols
            else delta_pages_ds
        )
        try:
            nb = slim.num_blocks()
        except Exception:
            nb = None
        if nb is not None and nb < cfg.num_partitions:
            slim = slim.repartition(cfg.num_partitions)
        delta_deduped = dedup_latest(
            extract_stage(
                slim,
                batch_size=cfg.extract_batch_size,
                concurrency=cfg.extract_concurrency,
            ),
            "url",
            "warc_ts",
            n_buckets=cfg.n_buckets,
        ).materialize()

    n_delta = delta_deduped.count()
    if n_delta > delta_cap:
        raise ValueError(
            f"delta has {n_delta} unique pages > delta_cap={delta_cap}; "
            "run the full pipeline instead"
        )

    def passthrough(n_eff: int = 0) -> dict:
        # same key set as the normal path — callers must not crash only
        # on the no-op-delta day
        out = {
            "deduped": prev_deduped,
            "features": prev_features,
            "blocks": prev_blocks,
            "scored": prev_scored,
            "clusters": prev_clusters,
            "golden": prev_golden,
            "delta_deduped": rd.from_arrow(
                pa.schema(
                    [
                        ("url", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
                        ("text", pa.string()),
                        ("lang", pa.string()),
                    ]
                ).empty_table()
            ),
            "pairs": rd.from_arrow(
                pa.schema(
                    [("uid_a", pa.int64()), ("uid_b", pa.int64())]
                ).empty_table()
            ),
            "incremental": {
                "n_delta": n_delta,
                "n_effective": n_eff,
                "n_invalidated": 0,
                "n_deleted": 0,
                "n_new_pairs": 0,
                "n_new_edges": 0,
                "n_affected_clusters": 0,
                "n_changed_clusters": 0,
            },
        }
        if "hot_hosts" in have:
            out["hot_hosts"] = prev.read_stage("hot_hosts")
        return out

    if n_delta == 0 and not del_present:
        return passthrough()

    # ---- 2. winner resolution: effective delta + invalidated incumbents -
    ddf = _to_pandas(
        delta_deduped.select_columns(["url", "warc_ts"]), ["url", "warc_ts"]
    )
    delta_url_ref = ray.put(pa.array(ddf["url"], pa.string()))
    incumbent = _to_pandas(
        _isin_scan(
            prev_deduped.select_columns(["url", "warc_ts"]), "url", delta_url_ref
        ),
        ["url", "warc_ts"],
    )
    prev_ts = dict(zip(incumbent["url"], incumbent["warc_ts"]))
    eff_mask = np.array(
        [
            # a deleted incumbent no longer counts: a re-delivered crawl
            # of a deleted url re-adds it regardless of timestamp
            (u not in prev_ts) or (ts > prev_ts[u]) or (u in del_present)
            for u, ts in zip(ddf["url"], ddf["warc_ts"])
        ],
        dtype=bool,
    )
    has_delta = bool(eff_mask.any())
    if not has_delta and not del_present:
        return passthrough()
    eff_urls = ddf["url"].to_numpy()[eff_mask] if len(ddf) else np.array([], dtype=object)
    eff_set = set(eff_urls)
    invalidated = sorted(
        {u for u in eff_urls if u in prev_ts} | del_present
    )
    inval_set = set(invalidated)
    inval_uids = np.sort(
        np.array([doc_uid(u) for u in invalidated], dtype=np.int64)
    )

    if has_delta:
        eff_ref = ray.put(pa.array(np.sort(eff_urls), pa.string()))
        delta_eff = _isin_scan(delta_deduped, "url", eff_ref).materialize()

        # ---- 3. delta features + block keys (prev hot-host table reused) -
        delta_features = features_stage(
            delta_eff, concurrency=cfg.features_concurrency, seed=cfg.seed
        ).materialize()
        delta_blocks = block_keys_stage(
            delta_features, hot_hosts=hot_hosts, max_block_size=cfg.max_block_size
        ).materialize()

        # ---- 4. touched blocks → delta-involving candidate pairs ---------
        delta_keys = _distinct_int64(delta_blocks, "block_key")
        # FP-tolerant: a false-positive "touched" block has no delta
        # member, so delta-only pair generation emits nothing from it
        key_ref = _share_values(delta_keys, approx_ok=True)
        touched_prev = _isin_scan(prev_blocks, "block_key", key_ref)
        if inval_uids.size:
            # an updated doc re-enters via its NEW keys; its stale block
            # rows (old content's keys, and every deleted doc's rows)
            # must not pair it with anything
            inval_uid_ref = ray.put(pa.array(inval_uids, pa.int64()))
            touched_prev = _isin_scan(
                touched_prev, "uid", inval_uid_ref, keep=False
            )
        blocks_flagged = delta_blocks.map_batches(
            _flag(True), batch_format="pyarrow"
        ).union(touched_prev.map_batches(_flag(False), batch_format="pyarrow"))
        pairs = candidate_pairs_delta(
            blocks_flagged,
            max_block_size=cfg.max_block_size,
            n_buckets=cfg.n_buckets,
        ).materialize()
        n_pairs = pairs.count()
    else:
        # deletion-only increment: nothing new to extract, block or score
        delta_eff = None
        delta_features = None
        delta_blocks = None
        pairs = rd.from_arrow(
            pa.schema([("uid_a", pa.int64()), ("uid_b", pa.int64())]).empty_table()
        )
        n_pairs = 0

    # ---- 5. score new pairs against delta ∪ (needed old) features -------
    if n_pairs:
        def batch_uids(t: pa.Table) -> pa.Table:
            u = np.unique(
                np.concatenate(
                    [
                        t["uid_a"].to_numpy(zero_copy_only=False),
                        t["uid_b"].to_numpy(zero_copy_only=False),
                    ]
                )
            )
            return pa.table({"uid": pa.array(u, pa.int64())})

        pair_uids = np.unique(
            _column_numpy(
                pairs.map_batches(batch_uids, batch_format="pyarrow"), "uid"
            )
        )
        delta_uids = np.sort(_column_numpy(delta_features, "uid"))
        old_need = np.setdiff1d(pair_uids, delta_uids)
        feats = delta_features
        if old_need.size:
            # FP-tolerant: an extra feature row is dropped by the pair join
            old_feats = _isin_scan(
                prev_features, "uid", _share_values(old_need, approx_ok=True)
            )
            feats = feats.union(old_feats)
        scored = score_pairs(
            pairs,
            feats.materialize(),
            num_partitions=cfg.num_partitions,
            threshold=cfg.threshold,
        ).materialize()
        new_edges = _to_pandas(
            scored.map_batches(
                lambda t: t.filter(t["is_match"]).select(["url_a", "url_b"]),
                batch_format="pyarrow",
            ),
            ["url_a", "url_b"],
            cap=delta_cap * 4,
            what="new match edges",
        )
    else:
        from ..stages.scoring import scored_schema

        scored = rd.from_arrow(scored_schema().empty_table())
        new_edges = pd.DataFrame({"url_a": [], "url_b": []}, dtype=str)

    # ---- 6. affected clusters (contain an invalidated url) --------------
    aff_cids: list[str] = []
    aff_members = pd.DataFrame({"url": [], "cluster_id": []}, dtype=str)
    prev_edges = pd.DataFrame({"url_a": [], "url_b": []}, dtype=str)
    if inval_set:
        inval_ref = ray.put(pa.array(sorted(inval_set), pa.string()))
        hit = _to_pandas(
            _isin_scan(prev_clusters, "url", inval_ref), ["url", "cluster_id"]
        )
        aff_cids = sorted(set(hit["cluster_id"]))
    if aff_cids:
        cid_ref = ray.put(pa.array(aff_cids, pa.string()))
        aff_members = _to_pandas(
            _isin_scan(prev_clusters, "cluster_id", cid_ref),
            ["url", "cluster_id"],
            cap=delta_cap,
            what="affected cluster members",
        )
        aset_ref = ray.put(pa.array(np.sort(aff_members["url"].to_numpy()), pa.string()))

        def aff_edges(t: pa.Table) -> pa.Table:
            import ray as _ray

            vs = _ray.get(aset_ref)
            m = pc.and_(
                t["is_match"],
                pc.or_(
                    pc.is_in(t["url_a"], value_set=vs),
                    pc.is_in(t["url_b"], value_set=vs),
                ),
            )
            return t.filter(m).select(["url_a", "url_b"])

        prev_edges = _to_pandas(
            prev_scored.map_batches(aff_edges, batch_format="pyarrow"),
            ["url_a", "url_b"],
            cap=delta_cap * 4,
            what="surviving edges of affected clusters",
        )
        # edges touching an invalidated url are stale (updated content is
        # re-scored via the delta path; deleted content is gone for good)
        keep = ~prev_edges["url_a"].isin(inval_set) & ~prev_edges["url_b"].isin(
            inval_set
        )
        prev_edges = prev_edges[keep]
    # deleted members leave their clusters entirely (unless re-added via
    # the delta, in which case they are in eff_set)
    aff_urls = set(aff_members["url"]) - del_present

    # ---- 7. contracted graph + connected components ----------------------
    endpoints = set(new_edges["url_a"]) | set(new_edges["url_b"])
    old_eps = sorted(endpoints - eff_set - aff_urls)
    ep_map: dict[str, str] = {}
    if old_eps:
        ep_ref = ray.put(pa.array(old_eps, pa.string()))
        m = _to_pandas(
            _isin_scan(prev_clusters, "url", ep_ref), ["url", "cluster_id"]
        )
        ep_map = dict(zip(m["url"], m["cluster_id"]))
    rep_nodes = set(ep_map.values())

    ea = [ep_map.get(u, u) for u in new_edges["url_a"]]
    eb = [ep_map.get(u, u) for u in new_edges["url_b"]]
    edges_all = pd.DataFrame(
        {
            "url_a": ea + list(prev_edges["url_a"]),
            "url_b": eb + list(prev_edges["url_b"]),
        }
    )
    edges_all = edges_all[edges_all["url_a"] != edges_all["url_b"]]
    active_nodes = sorted(eff_set | aff_urls | rep_nodes)
    if len(active_nodes) + len(edges_all) > delta_cap * 4:
        raise ValueError(
            "incremental active graph exceeds delta_cap bounds; "
            "run the full pipeline instead"
        )
    if active_nodes:
        cc = connected_components(
            rd.from_arrow(
                pa.table(
                    {
                        "url_a": pa.array(edges_all["url_a"], pa.string()),
                        "url_b": pa.array(edges_all["url_b"], pa.string()),
                    }
                )
            ),
            rd.from_arrow(pa.table({"url": pa.array(active_nodes, pa.string())})),
            num_partitions=cfg.num_partitions,
            max_rounds=cfg.max_cc_rounds,
        ).to_pandas()
        label = dict(zip(cc["url"], cc["cluster_id"]))
    else:
        # pure-singleton deletions: nothing left to re-close
        label = {}

    # ---- 8. final clusters ----------------------------------------------
    # reps of unaffected clusters whose label moved → remap their members
    changed_rep = {
        r: label[r] for r in rep_nodes if r in label and label[r] != r
    }
    drop_cids = set(aff_cids)

    def remap_prev(df: pd.DataFrame) -> pd.DataFrame:
        if drop_cids:
            df = df[~df["cluster_id"].isin(drop_cids)]
        if changed_rep:
            df = df.copy()
            df["cluster_id"] = (
                df["cluster_id"].map(changed_rep).fillna(df["cluster_id"])
            )
        return df

    active_member_urls = sorted(eff_set | aff_urls)
    active_tbl = pa.table(
        {
            "url": pa.array(active_member_urls, pa.string()),
            "cluster_id": pa.array(
                [label[u] for u in active_member_urls], pa.string()
            ),
        }
    )
    clusters = (
        prev_clusters.map_batches(remap_prev, batch_format="pandas")
        .union(rd.from_arrow(active_tbl))
        .materialize()
    )

    # ---- 9. golden records: recompute changed clusters only --------------
    changed_final = {label[u] for u in active_member_urls}
    removed_old = drop_cids | set(changed_rep) | changed_final
    inval_ref2 = ray.put(pa.array(sorted(inval_set), pa.string()))
    surviving_prev = _isin_scan(prev_deduped, "url", inval_ref2, keep=False)

    def drop_removed(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["cluster_id"].isin(removed_old)]

    if changed_final:
        changed_ref = ray.put(pa.array(sorted(changed_final), pa.string()))
        changed_members = _isin_scan(
            clusters, "cluster_id", changed_ref
        ).materialize()
        member_ref = ray.put(
            pa.array(
                np.sort(
                    _to_pandas(
                        changed_members.select_columns(["url"]),
                        ["url"],
                        cap=delta_cap * 4,
                        what="changed cluster members",
                    )["url"].to_numpy()
                ),
                pa.string(),
            )
        )
        # combined deduped view of the changed members: previous rows
        # (minus invalidated) + effective delta rows — both pure map scans
        changed_pages = _isin_scan(surviving_prev, "url", member_ref)
        if delta_eff is not None:
            changed_pages = changed_pages.union(
                _isin_scan(delta_eff, "url", member_ref)
            )
        fresh_golden = golden_records(
            changed_members,
            changed_pages,
            num_partitions=cfg.num_partitions,
            n_buckets=cfg.n_buckets,
        )
        golden = (
            prev_golden.map_batches(drop_removed, batch_format="pandas")
            .union(fresh_golden)
            .materialize()
        )
    else:
        # deletions removed whole clusters and touched nothing else
        golden = prev_golden.map_batches(
            drop_removed, batch_format="pandas"
        ).materialize()

    # ---- 10. combined state for the next increment ------------------------
    deduped = surviving_prev
    feats_prev = prev_features
    blocks_prev = prev_blocks
    if inval_uids.size:
        iu_ref = ray.put(pa.array(inval_uids, pa.int64()))
        feats_prev = _isin_scan(feats_prev, "uid", iu_ref, keep=False)
        blocks_prev = _isin_scan(blocks_prev, "uid", iu_ref, keep=False)
    features = feats_prev
    blocks = blocks_prev
    if delta_eff is not None:
        deduped = deduped.union(delta_eff)
        features = features.union(delta_features)
        blocks = blocks.union(delta_blocks)

    def drop_inval_edges(t: pa.Table) -> pa.Table:
        import ray as _ray

        vs = _ray.get(inval_ref2)
        m = pc.or_(
            pc.is_in(t["url_a"], value_set=vs),
            pc.is_in(t["url_b"], value_set=vs),
        )
        return t.filter(pc.invert(m))

    scored_all = prev_scored.map_batches(
        drop_inval_edges, batch_format="pyarrow"
    ).union(scored)

    out = {
        "deduped": deduped,
        "features": features,
        "blocks": blocks,
        "scored": scored_all,
        "clusters": clusters,
        "golden": golden,
        "delta_deduped": delta_eff
        if delta_eff is not None
        else rd.from_arrow(
            pa.schema(
                [
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us")),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                ]
            ).empty_table()
        ),
        "pairs": pairs,
        "incremental": {
            "n_delta": int(n_delta),
            "n_effective": int(len(eff_set)),
            "n_invalidated": int(len(inval_set)),
            "n_deleted": int(len(del_present)),
            "n_new_pairs": int(n_pairs),
            "n_new_edges": int(len(new_edges)),
            "n_affected_clusters": int(len(aff_cids)),
            "n_changed_clusters": int(len(changed_final)),
        },
    }
    if "hot_hosts" in have:
        # pass the skew table through so a chained increment keys blocks
        # identically (a periodic FULL run refreshes it)
        out["hot_hosts"] = prev.read_stage("hot_hosts")
    return out


def golden_diff(prev_golden, cur_golden, *, n_buckets: int = 64):
    """Record-level run-over-run diff of two golden-record outputs (the
    data-plane complement of ``state.checkpoint.manifest_diff``): one row
    per cluster_id with ``status`` ∈ {added, removed, changed, same} and
    the member-count transition.

    One bucketed full-outer merge on cluster_id — both sides are
    golden-record-sized (clusters, not pages), and the comparison is a
    vectorized column equality per bucket."""
    from ..stages.util import bucketed_map_groups

    CMP = ["canonical_url", "n_members", "langs", "max_warc_ts", "text_len"]

    def tag(ds, side: str):
        def f(t: pa.Table) -> pa.Table:
            cols = {"cluster_id": t["cluster_id"]}
            for c in CMP:
                for s in ("prev", "cur"):
                    cols[f"{c}_{s}"] = (
                        t[c] if s == side else pa.nulls(len(t), t.schema.field(c).type)
                    )
            return pa.table(cols)

        return ds.map_batches(f, batch_format="pyarrow")

    both = tag(prev_golden, "prev").union(tag(cur_golden, "cur"))

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_id", sort=False, as_index=False).first()
        has_prev = g["canonical_url_prev"].notna()
        has_cur = g["canonical_url_cur"].notna()
        same = np.ones(len(g), dtype=bool)
        for c in CMP:
            same &= (g[f"{c}_prev"] == g[f"{c}_cur"]).to_numpy(dtype=bool)
        status = np.where(
            ~has_prev, "added", np.where(~has_cur, "removed", np.where(same, "same", "changed"))
        )
        return pd.DataFrame(
            {
                "cluster_id": g["cluster_id"],
                "status": status,
                "n_members_prev": g["n_members_prev"].fillna(-1).astype("int64"),
                "n_members_cur": g["n_members_cur"].fillna(-1).astype("int64"),
            }
        )

    return bucketed_map_groups(both, "cluster_id", diff)




# ---------------------------------------------------------------------------
# Run-over-run plan selection (round-3 review item #3)
# ---------------------------------------------------------------------------
# The delta path's work is delta-proportional but carries a fixed stage
# overhead (~a dozen small Ray stages, broadcast builds, driver collects
# — measured ≈3–4 s regardless of size). At bench scale (7k pages /
# ~1.8 s full rerun) that FIXED cost exceeds the whole full pipeline, so
# the delta path LOSES below a corpus-size/delta-fraction crossover
# (r3 bench: 3.17 s delta vs 1.75 s full at 10% delta), while at 1M
# pages it wins 8.9×. Nothing selected the plan before; this does.

INCREMENTAL_FIXED_OVERHEAD_SEC = 3.5
DELTA_COST_FACTOR = 2.0  # delta-path per-row cost vs full-pipeline per-row
DELTA_FRACTION_CUTOFF = 0.25


def choose_incremental_plan(
    n_delta: int,
    n_corpus: int,
    prev_total_wall: float,
    *,
    fixed_overhead_sec: float = INCREMENTAL_FIXED_OVERHEAD_SEC,
    delta_cost_factor: float = DELTA_COST_FACTOR,
    frac_cutoff: float = DELTA_FRACTION_CUTOFF,
) -> dict:
    """Cost-model plan choice: delta path vs full rerun.

    est_full  = prev_total_wall · (1 + r)            (r = delta fraction)
    est_delta = fixed_overhead + prev_total_wall · r · delta_cost_factor

    ``prev_total_wall`` is the sum of the previous run's checkpointed
    stage walls (CheckpointRunner.stage_stats — the manifests record
    them per stage), so the model self-calibrates to the actual corpus
    and hardware rather than to row-count constants. The fraction cutoff
    guards the equivalence envelope: a delta rewriting >25% of the
    corpus stresses the incremental contraction for no win.

    Calibration against measured walls: at sf0.1 (W=1.75 s, r=0.11) →
    est_delta 3.9 vs est_full 1.9 → full (measured: 3.17 vs 1.75 —
    correct choice); at the 1M soak (W≈70 s, r≈0.01) → est_delta 4.9 vs
    est_full 70.7 → delta (measured 8.9× win — correct choice)."""
    if n_corpus <= 0 or prev_total_wall <= 0:
        return {
            "plan": "full",
            "reason": "no previous state to amortize",
            "est_delta_sec": None,
            "est_full_sec": None,
        }
    r = n_delta / float(n_corpus)
    est_full = prev_total_wall * (1.0 + r)
    est_delta = fixed_overhead_sec + prev_total_wall * r * delta_cost_factor
    if r > frac_cutoff:
        plan, reason = "full", f"delta fraction {r:.2f} > {frac_cutoff}"
    elif est_delta < est_full:
        plan, reason = "delta", f"est {est_delta:.2f}s < full {est_full:.2f}s"
    else:
        plan, reason = "full", f"est {est_delta:.2f}s >= full {est_full:.2f}s"
    return {
        "plan": plan,
        "reason": reason,
        "delta_fraction": round(r, 4),
        "est_delta_sec": round(est_delta, 3),
        "est_full_sec": round(est_full, 3),
        "prev_total_wall": round(prev_total_wall, 3),
    }


def run_er_incremental_auto(
    delta_pages_ds,
    cfg: "ERConfig | None" = None,
    *,
    state_dir: str,
    prev_run_id: str,
    full_pages_ds=None,
    deleted_urls=None,
    **kw,
) -> dict:
    """Plan-selected run-over-run ER: consult
    :func:`choose_incremental_plan` against the previous run's manifests
    and run either the delta path or a full rerun.

    ``full_pages_ds``: the combined corpus (previous input + delta) for
    the full-rerun plan; when absent and the model picks full, the delta
    path runs anyway with the decision logged (the caller kept only the
    state, so a rerun is impossible from here). Tombstone deletions are
    inherently delta-shaped and always take the delta path. The result
    carries the decision under ``["incremental"]["plan"]``."""
    import logging
    import os

    cfg = cfg or ERConfig()
    prev = CheckpointRunner(state_dir, prev_run_id)
    n_corpus = (prev.stage_stats("deduped") or {}).get("rows", 0)
    total_wall = sum(
        (prev.stage_stats(s) or {}).get("wall_seconds", 0.0)
        for s in STATE_STAGES
    )
    try:
        n_delta = delta_pages_ds.count()
    except Exception:
        n_delta = 0
    decision = choose_incremental_plan(n_delta, n_corpus, total_wall)
    if deleted_urls is not None:
        decision = {**decision, "plan": "delta",
                    "reason": "tombstone deletions are delta-shaped"}
    if decision["plan"] == "full" and full_pages_ds is None:
        logging.getLogger(__name__).warning(
            "incremental plan chose full rerun (%s) but no full corpus "
            "was provided — running the delta path", decision["reason"],
        )
        decision = {**decision, "plan": "delta",
                    "reason": decision["reason"] + " (no full corpus given)"}

    if decision["plan"] == "full":
        # Checkpoint-reuse hazard (round-4 advice): a state-maintaining
        # caller naturally passes cfg.checkpoint_dir=state_dir with
        # cfg.run_id=prev_run_id — but CheckpointRunner validates stages
        # by params/parents, NOT input fingerprints, so the rerun would
        # silently serve the OLD corpus's outputs and drop the delta.
        # Force a fresh run_id for the rerun (unique per call: repeated
        # reruns under one id would stale-serve each other the same way).
        if cfg.checkpoint_dir and cfg.run_id == prev_run_id and (
            os.path.abspath(cfg.checkpoint_dir) == os.path.abspath(state_dir)
        ):
            import dataclasses
            import uuid

            fresh = f"{prev_run_id}-fullrerun-{uuid.uuid4().hex[:12]}"
            logging.getLogger(__name__).warning(
                "full-rerun requested against the previous run's own "
                "checkpoint state (run_id=%r in %s) — forcing fresh "
                "run_id=%r so stale stage outputs cannot be served",
                prev_run_id, state_dir, fresh,
            )
            cfg = dataclasses.replace(cfg, run_id=fresh)
        out = run_er(full_pages_ds, cfg)
        out["incremental"] = {
            **decision,
            "n_delta": n_delta,
            "n_corpus": n_corpus,
        }
        return out

    out = run_er_incremental(
        delta_pages_ds, cfg, state_dir=state_dir, prev_run_id=prev_run_id,
        deleted_urls=deleted_urls, **kw,
    )
    out["incremental"] = {**out.get("incremental", {}), **decision}
    return out
