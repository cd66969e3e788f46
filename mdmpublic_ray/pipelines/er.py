"""The flagship entity-resolution pipeline (BASELINE.json north_star):

  read pages (text column pruned) → HTML→text extraction (map tasks)
  → dedup-latest per url (shuffle of text rows, never html)
  → per-doc match features (MinHash / bottom-k sketch / title / uid)
  → multi-pass blocking (canonical host + LSH bands, int64 keys,
    skew-aware salting of hot hosts; optional sorted-neighborhood
    window pass over titles, cfg.snm_window)
  → capped within-block candidate pairs (uid pairs) → pair dedup
  → vectorized pairwise scoring (Jaccard + Jaro-Winkler, optional
    cosine-over-embedding via cfg.emb_dim/emb_weight; broadcast /
    feature-store / shuffle-join plan picked by feature-table size)
  → match edges
  → transitive closure (driver union-find small / hash-partitioned
    min-label rounds large) → clusters
  → golden-record survivorship

This is the Ray-Data re-expression of the MDM flow: staging bucket →
match index → master bucket (SURVEY.md §0; ``cb_backup.py:45``,
``es_backup.py:61``). Every wide step's key is listed in SURVEY.md §7.3.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..stages.blocking import (
    FEATURES_HASHV,
    block_keys_stage,
    block_size_stats,
    features_stage,
)
from ..stages.cluster import connected_components
from ..stages.dedup import dedup_latest
from ..stages.extract import extract_stage
from ..stages.golden import golden_records
from ..stages.pairs import candidate_pairs
from ..stages.scoring import score_pairs
from ..stages.util import pruned_scan


@dataclass
class ERConfig:
    seed: int = 42
    # None → sized to the Ray cluster at runtime (util.default_partitions)
    num_partitions: int | None = None
    n_buckets: int = 64
    max_block_size: int = 256
    threshold: float = 0.35
    extract_batch_size: int = 256
    # None → actor pool sized to the cluster (util.default_actor_pool)
    extract_concurrency: tuple | None = None
    features_concurrency: tuple | None = None
    max_cc_rounds: int = 15
    # hot-host skew salting (north_rule): hosts with more pages than
    # max_block_size are split into salted sub-blocks (see blocking.py)
    salt_hot_hosts: bool = True
    # optional third blocking pass (0 = off): sorted-neighborhood window
    # over (title, uid) — recall for near-dups whose similarity shows in
    # the title ordering but misses both the host key and LSH bands
    # (stages/snm.py; Hernandez & Stolfo SIGMOD 1995)
    snm_window: int = 0
    # extract before the dedup shuffle (text shuffles instead of html —
    # see make_deduped; False restores dedup-first, results identical)
    extract_before_dedup: bool = True
    # compress text through the dedup shuffle (zlib level 1 in the map,
    # decompressed right after the groupby): converts all-to-all BYTES —
    # the cpu-count-invariant floor on one box, the NIC budget on a real
    # cluster — into embarrassingly-parallel CPU. Results identical
    # (compression is a bijection and dedup never inspects the payload).
    compress_text_shuffle: bool = True
    # winner-broadcast dedup (stages/dedup.py): when the corpus has at
    # most this many distinct urls, dedup-latest broadcasts the
    # (url → max warc_ts) winner table and keeps winning rows with a pure
    # filter map — the full-row exchange disappears entirely. Beyond the
    # threshold (winner table too big to ship to every task) the classic
    # bucketed shuffle runs. 5M urls ≈ 400 MB broadcast — one shared-
    # memory copy per node. None (default) derives the cap from the
    # driver node's memory (5M at the 128-GiB calibration point —
    # util.memory_scaled_cap, round-3 review item #8); 0 disables.
    dedup_winner_broadcast_rows: int | None = None
    checkpoint_dir: str | None = None  # per-stage parquet + manifests
    run_id: str = "run0"
    # beyond-broadcast scoring: when the feature table exceeds the
    # broadcast threshold, probe a uid-bucketed parquet feature store
    # (stages/featurestore.py — pairs-only shuffle) instead of the
    # two-join fallback. None → derived as <checkpoint_dir>/<run_id>/
    # feature_store when a checkpoint dir is set (the store IS a stage
    # artifact); set explicitly for store-only reuse across runs.
    feature_store_dir: str | None = None
    # optional cosine-over-embedding scoring signal (north-star scoring
    # recipe: JW on url/title + token-Jaccard + cosine-over-embedding on
    # text). emb_dim > 0 adds a hashed-text-embedding column to features
    # (blocking.hashed_embeddings_batch); emb_weight > 0 blends its
    # per-pair cosine into the score: (1-w)·base + w·cos, plus a
    # cos_text output column. Default OFF: on this corpus the hashed
    # unigram cosine is informationally redundant with the shingle-
    # sketch jaccard (same token evidence), so the default score keeps
    # the published weights; a deployment with MODEL embeddings flips
    # these on to use semantic similarity the sketches cannot see.
    # Supported on all three scoring paths (broadcast / join / feature
    # store — a store written without the emb column refuses loudly);
    # the incremental path refuses emb configs (see er_incremental).
    emb_dim: int = 0
    emb_weight: float = 0.0
    # learned embedding model (ST5): path to an embmodel.EmbeddingModel
    # npz applied on top of the hashed counts (loaded once per features
    # actor). None keeps the plain hashed projection. emb_model_gpus is
    # the per-actor GPU request — clamped to 0 with a loud warning on a
    # GPU-less cluster (embmodel.resolve_num_gpus), where the model runs
    # its CPU backend; results are device-invariant.
    emb_model_path: str | None = None
    emb_model_gpus: float = 0.0


def run_er(pages_ds, cfg: ERConfig | None = None) -> dict:
    """Run the full pipeline; returns a dict of (lazy) Datasets:
    deduped, features, blocks, pairs, scored, edges, clusters, golden.

    When ``cfg.checkpoint_dir`` is set, each stage's output is written as
    partitioned parquet with a lineage manifest and re-read (checkpoint +
    lineage truncation); already-valid stages are SKIPPED on rerun —
    see ``state/checkpoint.py``.
    """
    from ..stages.util import default_partitions

    cfg = cfg or ERConfig()
    if cfg.emb_weight and not cfg.emb_dim:
        raise ValueError(
            "ERConfig.emb_weight > 0 requires emb_dim > 0 (the features "
            "stage must produce the emb column the scorer consumes)"
        )
    if cfg.num_partitions is None:
        cfg.num_partitions = default_partitions()
    ck = None
    if cfg.checkpoint_dir:
        from ..state.checkpoint import CheckpointRunner

        ck = CheckpointRunner(cfg.checkpoint_dir, cfg.run_id)
    else:
        # Uncheckpointed mode pins the whole diamond DAG (deduped +
        # features + pairs + scored) live in the object store at once.
        # Past roughly half of plasma that degrades into eviction /
        # recompute thrash (measured: a 1M-page / 2.4 GB-input corpus
        # stalls on a 128 GiB box, while the same corpus checkpointed
        # finishes in ~300 s). Warn early — the fix is one config field.
        try:
            import ray as _ray

            plasma = _ray.cluster_resources().get("object_store_memory", 0)
            est = pages_ds.size_bytes() or 0
            # intermediates ≈ 12× input bytes at web-page shapes
            # (features sketches + pair edges + scored rows, measured
            # at the 1M-page soak)
            if plasma and est * 12 > plasma * 0.5:
                import warnings

                warnings.warn(
                    f"run_er without checkpoint_dir on a ~{est/1e9:.1f} GB "
                    "input: the materialized stage DAG may exceed the "
                    "object store and thrash; set ERConfig.checkpoint_dir "
                    "(partitioned-parquet stage spill + resume) for "
                    "corpora this size.",
                    ResourceWarning,
                    stacklevel=2,
                )
        except Exception:
            pass

    stage_walls: dict[str, float] = {}

    def stage(name, make, parents=(), params=None):
        """Stage boundary. With a checkpoint dir: parquet + manifest +
        skip-if-valid (``params`` — the stage-relevant config — is part
        of the manifest, so a changed threshold/seed/cap invalidates the
        stage even when parents are unchanged). Without: ``materialize()``
        — the pipeline DAG is a diamond (deduped feeds
        extraction+nodes+golden; features feeds blocking+scoring; edges is
        consumed repeatedly by the CC loop), so un-pinned branch points
        would re-execute the whole upstream lineage once per consumer.
        These intermediates are O(unique urls) / O(candidate pairs) — they
        spill to the object store, not the driver heap.

        Both modes record the stage's wall seconds in the run output's
        ``_stage_walls`` (S4 metrics parity: the checkpointed path already
        persists ``_metrics.json`` per stage; this surfaces the same
        numbers for in-memory runs so scaling work can see WHERE the wall
        goes without adding a checkpoint dir)."""
        import time as _time

        t0 = _time.monotonic()
        out = (
            make().materialize()
            if ck is None
            else ck.run_stage(name, make, parents=parents, params=params)
        )
        stage_walls[name] = round(_time.monotonic() - t0, 3)
        return out

    def make_deduped():
        # prune at the start: the input table may carry a `text` column
        # (input_hint schema) but the pipeline re-derives text from html
        # (byte-identity invariant) — carrying it through the dedup
        # shuffle would move ~45% more bytes for nothing.
        src = pages_ds
        try:
            nb = src.num_blocks()  # known for from_arrow/materialized;
        except Exception:          # lazy reads raise — they split themselves
            nb = None
        if nb is not None and nb < cfg.num_partitions:
            # a driver-built table (from_arrow) arrives as ONE block and
            # map parallelism is block-bound — extraction would serialize
            # onto one core; one cheap repartition restores cluster width
            src = src.repartition(cfg.num_partitions)
        elif nb is None:
            # lazy parquet read: Ray sizes read tasks to 128 MB blocks,
            # so a few-large-files input serializes the fused
            # filter+extract maps onto a handful of cores — re-issue the
            # read at cluster width (no-op for many-file inputs)
            from ..stages.util import widen_scan

            src = widen_scan(src, cfg.num_partitions)
        cols = src.schema().names
        # pruned_scan, not select_columns: pushes the projection into
        # the (row-group-widened) read so the `text` column is never
        # decoded — select_columns would decode-then-drop it
        slim = (
            pruned_scan(src, [c for c in cols if c != "text"])
            if "text" in cols
            else src
        )
        wbr = cfg.dedup_winner_broadcast_rows
        if wbr is None:
            from ..stages.util import memory_scaled_cap

            wbr = memory_scaled_cap(5_000_000, lo=100_000)
        if cfg.extract_before_dedup:
            if wbr:
                # winner-FIRST plan (cheapest, size-aware): the dedup
                # winner set (url → max warc_ts) depends ONLY on input
                # columns, so it comes from a column-pruned scan of the
                # RAW input — no text ever shuffles, no full-corpus
                # materialize, and extraction runs ONLY on surviving
                # rows (re-crawled losers — ~25% of a web crawl — are
                # dropped before the expensive HTML→text work instead
                # of after). Tie-broken keys (>1 row at the max ts) are
                # extracted and classic-deduped on just those rows, so
                # the deterministic full-column tie-break semantics
                # match dedup_latest over extracted rows exactly.
                from ..stages.dedup import dedup_winner_split

                split = dedup_winner_split(
                    slim, "url", "warc_ts", n_buckets=cfg.n_buckets,
                    winner_broadcast_rows=wbr,
                )
                if split is not None:
                    kept, tied = split
                    ext = extract_stage(
                        kept,
                        batch_size=cfg.extract_batch_size,
                        concurrency=cfg.extract_concurrency,
                    )
                    if tied is None:
                        return ext
                    # tiny path: rows of tied keys only. Cast the pandas
                    # -shuffled branch back to the arrow branch's schema
                    # so the union is homogeneous.
                    in_s = slim.schema().base_schema
                    ext_schema = pa.schema(
                        [
                            ("url", in_s.field("url").type),
                            ("warc_ts", in_s.field("warc_ts").type),
                            ("text", pa.string()),
                            ("lang", in_s.field("lang").type),
                        ]
                    )

                    def _cast(df):
                        t = pa.Table.from_pandas(df, preserve_index=False)
                        return t.select(ext_schema.names).cast(ext_schema)

                    ext_tied = dedup_latest(
                        extract_stage(
                            tied,
                            batch_size=cfg.extract_batch_size,
                            concurrency=cfg.extract_concurrency,
                        ),
                        "url",
                        "warc_ts",
                        n_buckets=cfg.n_buckets,
                    ).map_batches(_cast, batch_format="pandas")
                    return ext.union(ext_tied)
                # winner table beyond the broadcast bound (corpus-sized
                # key set at web scale) → the shuffle plans below
            # extract FIRST (map tasks — scales with the cluster; the
            # ~25% duplicate-crawl extraction overhead is parallel work),
            # so the dedup shuffle moves extracted text, not raw html —
            # on real web pages html is 5-10× the text, making this the
            # dominant shuffle-volume lever. Result rows are identical
            # either way: extraction is a pure function of html and
            # dedup keeps the same (url, max warc_ts) row.
            extracted = extract_stage(
                slim,
                batch_size=cfg.extract_batch_size,
                concurrency=cfg.extract_concurrency,
            )
            if cfg.compress_text_shuffle:
                # shrink the ONE all-to-all that moves document text:
                # compress in the extract map (parallel), shuffle the
                # opaque bytes, decompress in a map right after — the
                # deduped stage's schema is unchanged. ~3-4× fewer bytes
                # through the fabric floor for ~0.2 core-ms/doc of
                # perfectly scalable CPU.
                import zlib

                def _pack(t: pa.Table) -> pa.Table:
                    z = [zlib.compress(s.encode("utf-8"), 1)
                         for s in t["text"].to_pylist()]
                    return pa.table(
                        {"url": t["url"], "warc_ts": t["warc_ts"],
                         "text_z": pa.array(z, pa.binary()), "lang": t["lang"]}
                    )

                def _unpack(t: pa.Table) -> pa.Table:
                    txt = [zlib.decompress(b).decode("utf-8")
                           for b in t["text_z"].to_pylist()]
                    return pa.table(
                        {"url": t["url"], "warc_ts": t["warc_ts"],
                         "text": pa.array(txt, pa.string()), "lang": t["lang"]}
                    )

                # winner_broadcast_rows=0: the winner plan already
                # refused above (key set too big) — retrying it here
                # would repeat the keys-only shuffle just to refuse again
                packed = extracted.map_batches(_pack, batch_format="pyarrow")
                return dedup_latest(
                    packed, "url", "warc_ts", n_buckets=cfg.n_buckets,
                ).map_batches(_unpack, batch_format="pyarrow")
            return dedup_latest(
                extracted, "url", "warc_ts", n_buckets=cfg.n_buckets,
            )
        return extract_stage(
            dedup_latest(slim, "url", "warc_ts", n_buckets=cfg.n_buckets),
            batch_size=cfg.extract_batch_size,
            concurrency=cfg.extract_concurrency,
        )

    deduped = stage(
        "deduped",
        make_deduped,
        params={"extract_before_dedup": cfg.extract_before_dedup},
    )
    if deduped.count() == 0:
        return _empty_outputs(cfg)

    # hot-host discovery only needs `deduped` — run it on a driver thread
    # CONCURRENTLY with the features stage (independent datasets, separate
    # streaming executors; the hot scan is latency- not CPU-bound, so it
    # hides entirely behind the feature computation).
    hot_box: dict = {}
    hot_err: list = []
    hot_thread = None
    if cfg.salt_hot_hosts:
        import threading

        def _hot_bg():
            try:
                mapping, hot_ds = _hot_hosts_checkpointed(stage, deduped, cfg)
                hot_box["map"] = mapping
                hot_box["ds"] = hot_ds
            except BaseException as exc:  # surfaced after join
                hot_err.append(exc)

        hot_thread = threading.Thread(target=_hot_bg, daemon=True)
        hot_thread.start()

    _model_digest = None
    if cfg.emb_model_path:
        from ..stages.embmodel import model_file_digest

        _model_digest = model_file_digest(cfg.emb_model_path)
    features = stage(
        "features",
        lambda: features_stage(
            deduped, concurrency=cfg.features_concurrency, seed=cfg.seed,
            emb_dim=cfg.emb_dim, emb_model_path=cfg.emb_model_path,
            num_gpus=cfg.emb_model_gpus,
        ),
        parents=("deduped",),
        # emb_dim / model digest in the digest only when enabled; hashv
        # invalidates states built under a different similarity-hash
        # space; a changed model FILE invalidates via its content digest
        params={"seed": cfg.seed, "hashv": FEATURES_HASHV,
                **({"emb_dim": cfg.emb_dim} if cfg.emb_dim else {}),
                **({"emb_model": _model_digest} if _model_digest else {})},
    )
    hot_hosts: dict = {}
    hot_hosts_ds = None
    if hot_thread is not None:
        hot_thread.join()
        if hot_err:
            raise hot_err[0]
        hot_hosts = hot_box["map"]
        hot_hosts_ds = hot_box["ds"]

    # prebuild the broadcast scorer payload CONCURRENTLY with the
    # blocks/pairs stages (same driver-thread overlap as hot_hosts): the
    # build needs only `features` (materialized above) and costs ~1 s of
    # driver pull + string encode — width-invariant floor if left on the
    # critical path between pairs and scoring. Only when the broadcast
    # plan will actually be chosen (same size test score_pairs applies).
    bc_box: dict = {}
    bc_thread = None
    from ..stages.scoring import (
        broadcast_features_rows,
        build_broadcast_features_ref,
    )

    # resume guard: when a checkpointed `scored` stage looks re-usable,
    # don't burn a background features scan — if the stage turns out
    # invalid after all (changed params), score_pairs builds inline.
    scored_likely_cached = ck is not None and ck.is_valid("scored")
    if not scored_likely_cached and (
        0 < features.count() <= broadcast_features_rows()
    ):
        import threading

        def _bc_bg():
            try:
                bc_box["ref"] = build_broadcast_features_ref(
                    features, emb_weight=cfg.emb_weight
                )
            except BaseException as exc:  # surfaced at join
                bc_box["err"] = exc

        bc_thread = threading.Thread(target=_bc_bg, daemon=True)
        bc_thread.start()
    blocks = stage(
        "blocks",
        lambda: block_keys_stage(
            features, hot_hosts=hot_hosts, max_block_size=cfg.max_block_size
        ),
        parents=("features", "hot_hosts") if cfg.salt_hot_hosts else ("features",),
        params={
            "max_block_size": cfg.max_block_size,
            "salt_hot_hosts": cfg.salt_hot_hosts,
            # band-key family version (see FEATURES_HASHV): states whose
            # blocks were built under blake2b band keys refuse to resume
            "hashv": FEATURES_HASHV,
        },
    )
    def make_pairs():
        base = candidate_pairs(
            blocks, max_block_size=cfg.max_block_size, n_buckets=cfg.n_buckets
        )
        if cfg.snm_window < 2:
            return base
        # SNM pass: window pairs over the global (title, uid) sort order,
        # normalized to the canonical uid_a < uid_b pair identity and
        # deduped against the host/LSH pairs in one bucketed pass.
        from ..stages.pairs import dedup_pairs
        from ..stages.snm import sorted_window_pairs

        def norm(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            a, b = t["id_a"], t["id_b"]
            return pa.table(
                {
                    "uid_a": _pc.min_element_wise(a, b),
                    "uid_b": _pc.max_element_wise(a, b),
                }
            )

        snm = sorted_window_pairs(
            pruned_scan(features, ["title", "uid"]),
            sort_cols=["title", "uid"],
            id_col="uid",
            window=cfg.snm_window,
        ).map_batches(norm, batch_format="pyarrow")
        return dedup_pairs(base.union(snm), n_buckets=cfg.n_buckets)

    pairs = stage(
        "pairs",
        make_pairs,
        parents=("blocks", "features") if cfg.snm_window >= 2 else ("blocks",),
        params={"max_block_size": cfg.max_block_size, "snm_window": cfg.snm_window},
    )
    def make_scored():
        import ray.data as rd

        from ..stages.scoring import scored_schema

        if pairs.count() == 0:
            # empty datasets lose their schema through groupby shuffles;
            # joins on them fail — emit a typed empty result instead.
            return rd.from_arrow(scored_schema(with_cos=cfg.emb_weight > 0).empty_table())
        store = cfg.feature_store_dir
        if store is None and cfg.checkpoint_dir:
            import os as _os

            store = _os.path.join(cfg.checkpoint_dir, cfg.run_id, "feature_store")
        ref = None
        if bc_thread is not None:
            bc_thread.join()
            if "err" in bc_box:
                raise bc_box["err"]
            ref = bc_box.get("ref")
        return score_pairs(
            pairs,
            features,
            num_partitions=cfg.num_partitions,
            threshold=cfg.threshold,
            feature_store_dir=store,
            emb_weight=cfg.emb_weight,
            prebuilt_broadcast_ref=ref,
        )

    scored = stage(
        "scored",
        make_scored,
        parents=("pairs", "features"),
        params={"threshold": cfg.threshold,
                **({"emb_weight": cfg.emb_weight} if cfg.emb_weight else {})},
    )
    # Non-broadcast exit path (round-3 advice): if `scored` was served
    # from a checkpoint that became valid after the guard check, the
    # prebuild thread was started but never consumed — join it briefly
    # so a failing build is at least logged instead of silently dropped.
    if bc_thread is not None and bc_thread.is_alive():
        bc_thread.join(timeout=5.0)
    if "err" in bc_box:
        import logging

        logging.getLogger(__name__).warning(
            "broadcast-features prebuild failed (unused result): %r",
            bc_box["err"],
        )
    edges = scored.map_batches(
        lambda t: t.filter(t["is_match"]).select(["url_a", "url_b"]),
        batch_format="pyarrow",
    )
    nodes = pruned_scan(deduped, ["url"])
    clusters = stage(
        "clusters",
        lambda: connected_components(
            edges,
            nodes,
            num_partitions=cfg.num_partitions,
            max_rounds=cfg.max_cc_rounds,
        ),
        parents=("scored", "deduped"),
        params={"max_cc_rounds": cfg.max_cc_rounds},
    )
    golden = stage(
        "golden",
        lambda: golden_records(
            clusters, deduped, num_partitions=cfg.num_partitions, n_buckets=cfg.n_buckets
        ),
        parents=("clusters", "deduped"),
    )
    out = {
        "deduped": deduped,
        "features": features,
        "blocks": blocks,
        "block_stats": block_size_stats(blocks),
        "pairs": pairs,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
        "golden": golden,
        # per-stage wall seconds (diagnostic, both execution modes);
        # underscore key → not a Dataset, skipped by state publication
        "_stage_walls": stage_walls,
    }
    if hot_hosts_ds is not None:
        # part of the published state: er_incremental.write_state persists
        # it so a chained delta run keys blocks identically
        out["hot_hosts"] = hot_hosts_ds
    return out


def _hot_hosts_checkpointed(stage, deduped, cfg: ERConfig) -> dict:
    """Hot-host sizes as a checkpointed stage: a fully-resumed run skips
    the scan+groupby and re-reads the (tiny) table, and the hot-host
    input to blocking is covered by recorded lineage. A sentinel row
    ("", -1) guarantees the parquet checkpoint is never zero-row (an
    empty stage directory cannot be re-read). Returns
    ``(mapping, dataset)`` — the dataset is surfaced in run_er's output
    so state publication keeps it."""
    from ..stages.blocking import hot_host_sizes

    def make():
        import ray.data as rd

        hh = hot_host_sizes(pruned_scan(deduped, ["url"]), cfg.max_block_size)
        hosts = [""] + list(hh.keys())
        sizes = [-1] + [int(v) for v in hh.values()]
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array(hosts, pa.string()),
                    "n_pages": pa.array(sizes, pa.int64()),
                }
            )
        )

    hot_ds = stage(
        "hot_hosts",
        make,
        parents=("deduped",),
        params={"max_block_size": cfg.max_block_size},
    )
    mapping = {
        r["host"]: r["n_pages"] for r in hot_ds.take_all() if r["n_pages"] >= 0
    }
    return mapping, hot_ds


def _empty_outputs(cfg: "ERConfig | None" = None) -> dict:
    """Typed empty result set for a zero-row input (empty datasets that
    have passed through a shuffle lose their schema, breaking joins)."""
    import ray.data as rd

    def t(fields):
        return rd.from_arrow(pa.schema(fields).empty_table())

    from ..stages.scoring import scored_schema

    s = pa.string()
    sentinel_hot = rd.from_arrow(
        pa.table(
            {"host": pa.array([""], s), "n_pages": pa.array([-1], pa.int64())}
        )
    )
    return {
        "hot_hosts": sentinel_hot,
        "deduped": t([("url", s), ("warc_ts", pa.timestamp("us")), ("text", s), ("lang", s)]),
        "features": t([("url", s), ("uid", pa.int64()), ("title", s),
                       ("n_tokens", pa.int64()), ("sketch", pa.binary()),
                       ("sig", pa.binary())]
                      + ([("emb", pa.binary())] if cfg and cfg.emb_dim else [])),
        "blocks": t([("block_key", pa.int64()), ("uid", pa.int64())]),
        "block_stats": t([("block_key", pa.int64()), ("n_members", pa.int64())]),
        "pairs": t([("uid_a", pa.int64()), ("uid_b", pa.int64())]),
        "scored": rd.from_arrow(
            scored_schema(with_cos=bool(cfg and cfg.emb_weight)).empty_table()
        ),
        "edges": t([("url_a", s), ("url_b", s)]),
        "clusters": t([("url", s), ("cluster_id", s)]),
        "golden": t([("cluster_id", s), ("canonical_url", s), ("n_members", pa.int64()),
                     ("langs", s), ("max_warc_ts", pa.timestamp("us")), ("text_len", pa.int64())]),
    }


def pairwise_metrics(clusters_ds, labels_ds, *, num_partitions: int | None = None) -> dict:
    """Pairwise precision/recall/F1 of predicted clusters against labeled
    pairs (BASELINE.json metric; SURVEY.md §2.5 A10). Prediction for a
    labeled pair (a, b) is cluster_id[a] == cluster_id[b]. Distributed:
    two hash joins + a global aggregate; only the 4 counters reach the
    driver."""
    from ..stages.util import default_partitions

    num_partitions = num_partitions or default_partitions()
    ca = clusters_ds.map_batches(
        lambda t: pa.table({"url": t["url"], "cid_a": t["cluster_id"]}),
        batch_format="pyarrow",
    )
    cb = clusters_ds.map_batches(
        lambda t: pa.table({"url": t["url"], "cid_b": t["cluster_id"]}),
        batch_format="pyarrow",
    )
    from ..stages.util import bucketed_join

    ca = ca.map_batches(
        lambda t: t.rename_columns(["url_ca", "cid_a"]), batch_format="pyarrow"
    )
    cb = cb.map_batches(
        lambda t: t.rename_columns(["url_cb", "cid_b"]), batch_format="pyarrow"
    )
    j = bucketed_join(labels_ds, ca, "url_a", "url_ca", n_buckets=num_partitions)
    j = bucketed_join(j, cb, "url_b", "url_cb", n_buckets=num_partitions)

    def counters(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pred = pc.equal(t["cid_a"], t["cid_b"])
        actual = t["is_match"]
        tp = pc.sum(pc.and_(pred, actual)).as_py() or 0
        fp = pc.sum(pc.and_(pred, pc.invert(actual))).as_py() or 0
        fn = pc.sum(pc.and_(pc.invert(pred), actual)).as_py() or 0
        tn = pc.sum(pc.and_(pc.invert(pred), pc.invert(actual))).as_py() or 0
        return pa.table(
            {"tp": [tp], "fp": [fp], "fn": [fn], "tn": [tn]}
        )

    from ray.data.aggregate import Sum

    agg = j.map_batches(counters, batch_format="pyarrow").aggregate(
        Sum("tp"), Sum("fp"), Sum("fn"), Sum("tn")
    )
    tp, fp, fn, tn = (
        agg["sum(tp)"] or 0,
        agg["sum(fp)"] or 0,
        agg["sum(fn)"] or 0,
        agg["sum(tn)"] or 0,
    )
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {
        "tp": int(tp), "fp": int(fp), "fn": int(fn), "tn": int(tn),
        "precision": prec, "recall": rec, "f1": f1,
    }


def blocking_metrics(
    pairs_ds,
    truth_ds,
    *,
    n_docs: int | None = None,
    num_partitions: int | None = None,
) -> dict:
    """Blocking-quality diagnostics: how good are the candidate pairs
    BEFORE scoring (the standard record-linkage triple):

    - ``reduction_ratio``   = 1 − |C| / (n·(n−1)/2) — how much of the
      all-pairs space blocking pruned;
    - ``pair_completeness`` = |C ∩ T| / |T| — recall of true pairs (an
      upper bound on end-to-end recall: a true pair blocking misses can
      never be matched downstream);
    - ``pair_quality``      = |C ∩ T| / |C| — precision of the candidate
      set (how much scoring work is spent on non-matches).

    ``pairs_ds``: (uid_a, uid_b); ``truth_ds``: (url, cluster_id) planted
    truth. uids are ``doc_uid(url)`` (deterministic), so truth maps to
    uid-space with a pure per-batch hash — no corpus-sized join. The only
    shuffles are the two candidate⋈truth hash joins and one groupby over
    the truth table; only scalar counters reach the driver.
    """
    from ..stages.blocking import doc_uid
    from ..stages.util import bucketed_join, default_partitions

    num_partitions = num_partitions or default_partitions()

    def to_uid(side: str):
        def f(t: pa.Table) -> pa.Table:
            uids = pa.array([doc_uid(u) for u in t["url"].to_pylist()], pa.int64())
            return pa.table({f"tuid_{side}": uids, f"tcid_{side}": t["cluster_id"]})

        return f

    n = n_docs if n_docs is not None else truth_ds.count()
    n_candidates = pairs_ds.count()

    # |T|: Σ m·(m−1)/2 over truth cluster sizes (one groupby + tiny map)
    sizes = truth_ds.groupby("cluster_id").count()
    from ray.data.aggregate import Sum

    def to_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = t["count()"]
        p = pc.divide(pc.multiply(m, pc.subtract(m, 1)), 2)
        return pa.table({"n_true": pc.cast(p, pa.int64())})

    agg = sizes.map_batches(to_pairs, batch_format="pyarrow").aggregate(Sum("n_true"))
    n_true = int(agg["sum(n_true)"] or 0)

    # |C ∩ T|: candidates whose endpoints share a truth cluster
    ta = truth_ds.map_batches(to_uid("a"), batch_format="pyarrow")
    tb = truth_ds.map_batches(to_uid("b"), batch_format="pyarrow")
    j = bucketed_join(pairs_ds, ta, "uid_a", "tuid_a", n_buckets=num_partitions)
    j = bucketed_join(j, tb, "uid_b", "tuid_b", n_buckets=num_partitions)

    def hits(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eq = pc.equal(t["tcid_a"], t["tcid_b"])
        return pa.table({"hit": [int(pc.sum(eq).as_py() or 0)]})

    got = j.map_batches(hits, batch_format="pyarrow").aggregate(Sum("hit"))
    n_hit = int(got["sum(hit)"] or 0)

    all_pairs = n * (n - 1) // 2
    return {
        "n_docs": int(n),
        "n_candidates": int(n_candidates),
        "n_true_pairs": n_true,
        "true_in_candidates": n_hit,
        "reduction_ratio": 1.0 - (n_candidates / all_pairs) if all_pairs else 1.0,
        "pair_completeness": (n_hit / n_true) if n_true else 1.0,
        "pair_quality": (n_hit / n_candidates) if n_candidates else 1.0,
    }


def threshold_sweep(scored_ds, labels_ds, thresholds, *, num_partitions=None):
    """Match-threshold tuning curve: pairwise tp/fp/fn/tn + P/R/F1 at
    each candidate threshold, against labeled pairs — the knob-setting
    workflow behind ``ERConfig.threshold`` (the reference tunes its
    matcher per tenant; SURVEY.md §2.5 A10 is the single-point version).

    Labeled pairs that were never scored (blocking misses) count as
    non-matches at EVERY threshold — the sweep reflects end-to-end
    recall, not just scorer recall. Distributed: both sides key on the
    order-normalized url pair, one left bucketed join, then every
    threshold's four counters are computed per batch and summed in one
    aggregate — |thresholds| × 4 numbers reach the driver, never pairs.

    Returns a pandas DataFrame (threshold, tp, fp, fn, tn, precision,
    recall, f1) sorted by threshold.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.util import bucketed_join, default_partitions

    num_partitions = num_partitions or default_partitions()
    thr = sorted(float(t) for t in thresholds)

    def key_pair(a, b):
        lo = pc.if_else(pc.less(a, b), a, b)
        hi = pc.if_else(pc.less(a, b), b, a)
        return pc.binary_join_element_wise(lo, hi, "\x1f")

    lab = labels_ds.map_batches(
        lambda t: pa.table(
            {"pk": key_pair(t["url_a"], t["url_b"]), "is_match": t["is_match"]}
        ),
        batch_format="pyarrow",
    )
    sc = scored_ds.map_batches(
        lambda t: pa.table(
            {"pk_s": key_pair(t["url_a"], t["url_b"]), "score": t["score"]}
        ),
        batch_format="pyarrow",
    )
    j = bucketed_join(lab, sc, "pk", "pk_s", how="left", n_buckets=num_partitions)

    def counters(t: pa.Table) -> pa.Table:
        score = t["score"].to_numpy(zero_copy_only=False).astype("float64")
        score = np.where(np.isnan(score), -np.inf, score)  # unscored pair
        actual = t["is_match"].to_numpy(zero_copy_only=False).astype(bool)
        rows = []
        for x in thr:
            pred = score >= x
            rows.append(
                (
                    x,
                    int((pred & actual).sum()),
                    int((pred & ~actual).sum()),
                    int((~pred & actual).sum()),
                    int((~pred & ~actual).sum()),
                )
            )
        return pa.table(
            {
                "threshold": pa.array([r[0] for r in rows], pa.float64()),
                "tp": pa.array([r[1] for r in rows], pa.int64()),
                "fp": pa.array([r[2] for r in rows], pa.int64()),
                "fn": pa.array([r[3] for r in rows], pa.int64()),
                "tn": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        j.map_batches(counters, batch_format="pyarrow")
        .groupby("threshold")
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
            Sum("tn", alias_name="tn"),
        )
        .to_pandas()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    p = agg["tp"] / (agg["tp"] + agg["fp"]).replace(0, np.nan)
    r = agg["tp"] / (agg["tp"] + agg["fn"]).replace(0, np.nan)
    agg["precision"] = p.fillna(1.0)
    agg["recall"] = r.fillna(1.0)
    f1 = 2 * agg["precision"] * agg["recall"] / (agg["precision"] + agg["recall"])
    agg["f1"] = f1.fillna(0.0)
    return agg


def bcubed_metrics(clusters_ds, truth_ds, *, num_partitions=None) -> dict:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) of predicted
    clusters against per-url true cluster ids — the item-weighted
    companion to :func:`pairwise_metrics` (pairwise over-weights big
    clusters quadratically; B³ weights every RECORD equally, so a
    shattered giant cluster and a shattered small one cost what they
    should).

        precision = (1/N) Σ_i |C(i) ∩ T(i)| / |C(i)|
        recall    = (1/N) Σ_i |C(i) ∩ T(i)| / |T(i)|

    Computed distributed via the standard contingency identity:
    Σ_i |C(i) ∩ T(i)|/|C(i)| = Σ_{c,t} n_ct² / n_c — one url join, three
    map-side-combined counts, two bucketed joins of count tables, one
    global sum; only the final scalars reach the driver.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.util import bucketed_join, default_partitions, partial_sum_groupby

    num_partitions = num_partitions or default_partitions()
    pred = clusters_ds.map_batches(
        lambda t: pa.table({"url_p": t["url"], "cid": t["cluster_id"]}),
        batch_format="pyarrow",
    )
    tru = truth_ds.map_batches(
        lambda t: pa.table({"url": t["url"], "tid": t["cluster_id"]}),
        batch_format="pyarrow",
    )
    both = bucketed_join(tru, pred, "url", "url_p", n_buckets=num_partitions)

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    both = both.map_batches(one, batch_format="pyarrow").materialize()
    ct = partial_sum_groupby(both, ["cid", "tid"], {"one": "n_ct"}, None)
    nc = partial_sum_groupby(both, ["cid"], {"one": "n_c"}, None)
    nt = partial_sum_groupby(both, ["tid"], {"one": "n_t"}, None)
    j = bucketed_join(ct, nc, "cid", "cid", n_buckets=num_partitions)
    j = bucketed_join(j, nt, "tid", "tid", n_buckets=num_partitions)

    def terms(t: pa.Table) -> pa.Table:
        n_ct = t["n_ct"].to_numpy(zero_copy_only=False).astype("float64")
        n_c = t["n_c"].to_numpy(zero_copy_only=False).astype("float64")
        n_t = t["n_t"].to_numpy(zero_copy_only=False).astype("float64")
        return pa.table(
            {
                "p_num": pa.array(n_ct * n_ct / n_c),
                "r_num": pa.array(n_ct * n_ct / n_t),
                "n": pa.array(n_ct.astype("int64")),
            }
        )

    from ray.data.aggregate import Sum

    agg = j.map_batches(terms, batch_format="pyarrow").aggregate(
        Sum("p_num", alias_name="p_num"),
        Sum("r_num", alias_name="r_num"),
        Sum("n", alias_name="n"),
    )
    n = agg["n"] or 0
    if n == 0:
        return {"n": 0, "precision": 1.0, "recall": 1.0, "f1": 1.0}
    p = agg["p_num"] / n
    r = agg["r_num"] / n
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"n": int(n), "precision": p, "recall": r, "f1": f1}


def uncertain_pairs(scored_ds, *, threshold: float, margin: float = 0.05, k: int = 100):
    """Active-learning labeling queue: the candidate pairs whose scores
    sit closest to the match threshold — exactly the pairs where a human
    label buys the most model improvement (the MDM adjudication loop;
    the reference's manual master-record review is the same workflow).
    Filter to |score − threshold| ≤ margin (map, streams at any scale),
    then a global top-k by closeness under a TOTAL order (distance,
    url_a, url_b) so the queue is deterministic. Returns at most ``k``
    rows: (url_a, url_b, score, dist)."""
    import pyarrow.compute as pc

    def pick(t: pa.Table) -> pa.Table:
        d = pc.abs(pc.subtract(t["score"], threshold))
        t = pa.table(
            {
                "url_a": t["url_a"],
                "url_b": t["url_b"],
                "score": t["score"],
                "dist": d,
            }
        )
        return t.filter(pc.less_equal(t["dist"], margin))

    return (
        scored_ds.map_batches(pick, batch_format="pyarrow")
        .sort(["dist", "url_a", "url_b"])
        .limit(k)
    )
