"""Distributed transitive clustering: iterative hash-partitioned min-label
propagation (SURVEY.md §7.1 M5; the union-find / star-contraction round
structure of BASELINE.json north_star).

Ray Data is a DAG engine with no native iteration, so the driver runs a
loop of shuffle rounds (SURVEY.md §4.2 "iterative computation"):

  labels⁰(u)   = u
  labelsʳ⁺¹(u) = min(labelsʳ(u), min over neighbors v of labelsʳ(v),
                 labelsʳ(labelsʳ(u)))            ← pointer jumping

**Active-set optimization**: only nodes incident to at least one match
edge participate in the rounds — in a near-dup corpus that is a small
fraction of all pages, so every per-round shuffle moves O(edges) rows,
not O(pages). Singletons get ``cluster_id = url`` through one final
left-outer join. Convergence is detected by a global checksum of the
label column (sum of crc32) — one tiny aggregate instead of an
old-vs-new join; rounds are bounded by ``max_rounds`` (pointer jumping
gives O(log n) on chains; near-dup components are near-stars → 2-3
rounds in practice).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from ..functions.hashing import crc32_array
from .util import bucketed_join, default_partitions, grouped_agg


# Below this many (undirected) match edges the component structure is
# finished locally on the driver: a union-find over ≤1M edges is <1 s and
# ZERO shuffle rounds, vs 3 shuffles × rounds for the distributed path.
# Size-aware physical planning, same principle as broadcast-vs-shuffle
# join selection — the distributed rounds remain the big-graph path.
# 128-GiB calibration point; the effective default scales linearly with
# the driver node's memory (util.memory_scaled_cap — a 4-GiB head node
# routes to the distributed rounds at ~31k edges, not 1M).
LOCAL_EDGE_THRESHOLD = 1_000_000
INT_CC_MAX_NODES = 8_000_000
INT_CC_MAX_EDGES = 100_000_000


def _default_cc_caps() -> tuple[int, int, int]:
    """(local_threshold, int_cc_max_nodes, int_cc_max_edges) scaled to
    the driver node's memory; 128 GiB reproduces the historical
    constants (round-3 review item #8).

    ``GRAFT_FORCE_DISTRIBUTED_CC=1`` zeroes all three — an ops/bench
    hook that routes clustering through the web-scale distributed
    min-label rounds regardless of graph size, so the 100-TB plan can
    be soaked on corpora the local/medium plans would otherwise take
    (results are asserted plan-invariant in tests/test_er_pipeline.py
    and digest-compared at soak scale in BASELINE.md)."""
    import os

    if os.environ.get("GRAFT_FORCE_DISTRIBUTED_CC"):
        return (0, 0, 0)
    from .util import memory_scaled_cap

    return (
        memory_scaled_cap(LOCAL_EDGE_THRESHOLD, lo=10_000),
        memory_scaled_cap(INT_CC_MAX_NODES, lo=100_000),
        memory_scaled_cap(INT_CC_MAX_EDGES, lo=1_000_000),
    )


def _pointer_jump(a, b, n: int):
    """Min-label propagation with pointer jumping over int edge arrays
    (``a[i] — b[i]`` must include both directions). O(E) numpy per round,
    O(log n) rounds; returns the component-min RANK per node rank."""
    import numpy as np

    lbl = np.arange(n, dtype=np.int64)
    for _ in range(64):  # bound is slack: fixpoint reached in log rounds
        old = lbl
        nxt = lbl.copy()
        np.minimum.at(nxt, a, lbl[b])  # edge relax
        nxt = nxt[nxt]  # pointer jump
        lbl = nxt
        if np.array_equal(old, lbl):
            break
    return lbl


def _local_components(edges_sym, nodes_ds):
    """Driver-side closure for small edge sets, fully vectorized: urls
    are factorized to their LEXICOGRAPHIC RANKS (so min-label = min-url,
    keeping cluster ids deterministic), then numpy min-label propagation
    with pointer jumping runs to fixpoint — no per-edge Python. Labels
    broadcast back as a pandas Series (C-speed hash map) and applied in
    one map pass."""
    import numpy as np
    import pandas as pd
    import ray

    # one parallel ray.get over the materialized blocks — the
    # iter_batches stream's driver-serial prefetch machinery measured
    # ~5x slower at the 242k-page scale (see dedup.py keys pass)
    batches = [b for b in ray.get(edges_sym.to_arrow_refs()) if b.num_rows]
    t = pa.concat_tables(batches).combine_chunks()
    # factorize with the arrow dictionary kernel (C, ~2x pandas
    # factorize on object strings at the 242k scale), then relabel
    # codes by lexicographic rank via arrow sort so min-label = min-url
    import pyarrow.compute as _pc

    both = pa.chunked_array(
        [t["src"].combine_chunks(), t["dst"].combine_chunks()]
    )
    denc = _pc.dictionary_encode(both).combine_chunks()
    uniq_arr = denc.dictionary
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = _pc.sort_indices(uniq_arr).to_numpy()  # rank → factor code
    rank_of_code = np.empty(len(uniq_arr), dtype=np.int64)
    rank_of_code[order] = np.arange(len(uniq_arr))
    e = len(t)
    a = rank_of_code[codes[:e]]
    b = rank_of_code[codes[e:]]
    url_of_rank = np.asarray(uniq_arr.take(pa.array(order)).to_pandas(), dtype=object)

    lbl = _pointer_jump(a, b, len(uniq_arr))
    labels = pd.Series(url_of_rank[lbl], index=url_of_rank)
    ref = ray.put(labels)

    # stateless TASKS, not an actor pool: an autoscaling pool ramps from
    # one actor and its spin-up was the clusters stage's entire
    # cpu-count-invariant wall (measured 4.2 s of 5.2 s at 32 CPUs on the
    # 60k-page corpus); tasks start at full width and the broadcast label
    # table is fetched once per worker via the module cache.
    import functools

    return nodes_ds.map_batches(
        functools.partial(_label_batch, labels_ref=ref), batch_format="pyarrow"
    )


def _int_edge_components(edges_sym, endpoints_ds, nodes_ds):
    """Medium-regime closure: the EDGE list is too big to pull as url
    strings (the local path's limit) but the distinct ENDPOINTS fit a
    broadcast and the edge list fits the driver as int64 pairs.

    One string exchange total — the distinct-endpoint aggregate the
    caller already computed — replaces the distributed rounds' two
    string joins + union-groupby PER ROUND (urls are ~60 B, the int
    rank 8 B; at the 1M-page soak the rounds moved ~3 GB of strings per
    round and cost 34.5 s of the 91 s wall). Endpoints pull to the
    driver, sort once (rank = lexicographic rank, so min-rank = min-url
    and cluster ids are bit-identical to the other two paths), the rank
    dictionary broadcasts, workers map edges to int pairs in parallel
    (per-worker cached pandas hash index), the driver closes the
    components over the int pairs, and labels broadcast back exactly
    like the local path.

    Admission is the caller's: endpoint count and edge count under the
    driver budgets (~0.5 GB strings / ~1.6 GB int pairs on a 128 GiB
    box). True web-scale graphs exceed them and take the distributed
    rounds."""
    import functools

    import numpy as np
    import pandas as pd
    import ray

    eps = pa.concat_tables(
        [b.select(["src"]) for b in ray.get(endpoints_ds.to_arrow_refs()) if b.num_rows]
    ).combine_chunks()
    urls = eps["src"].combine_chunks()
    sorted_urls = urls.take(pc.sort_indices(urls))
    ref = ray.put(sorted_urls)

    def to_int(t: pa.Table, urls_ref) -> pa.Table:
        key = ("intcc", urls_ref.hex())
        if key not in _LBL_CACHE:
            _LBL_CACHE.clear()
            arr = ray.get(urls_ref)
            _LBL_CACHE[key] = pd.Index(arr.to_pandas())
        idx = _LBL_CACHE[key]
        return pa.table(
            {
                "a": pa.array(idx.get_indexer(t["src"].to_pandas()), pa.int64()),
                "b": pa.array(idx.get_indexer(t["dst"].to_pandas()), pa.int64()),
            }
        )

    ie = edges_sym.map_batches(
        functools.partial(to_int, urls_ref=ref), batch_format="pyarrow"
    ).materialize()
    tb = pa.concat_tables(
        [b for b in ray.get(ie.to_arrow_refs()) if b.num_rows]
    ).combine_chunks()
    a = tb["a"].to_numpy(zero_copy_only=False)
    b = tb["b"].to_numpy(zero_copy_only=False)
    lbl = _pointer_jump(a, b, len(sorted_urls))
    url_of_rank = np.asarray(sorted_urls.to_pandas(), dtype=object)
    labels = pd.Series(url_of_rank[lbl], index=url_of_rank)
    lref = ray.put(labels)
    return nodes_ds.map_batches(
        functools.partial(_label_batch, labels_ref=lref), batch_format="pyarrow"
    )


# per-worker cache of the broadcast label Series (same pattern as
# scoring._FEAT_CACHE): ray.get once per worker process, not per batch
_LBL_CACHE: dict = {}


def _label_batch(tb: pa.Table, labels_ref) -> pa.Table:
    import ray

    key = labels_ref.hex()
    if key not in _LBL_CACHE:
        _LBL_CACHE.clear()
        _LBL_CACHE[key] = ray.get(labels_ref)
    labels = _LBL_CACHE[key]
    urls = tb["url"].to_pandas()
    cid = urls.map(labels).fillna(urls)
    return pa.table(
        {
            "url": tb["url"],
            "cluster_id": pa.array(cid.to_numpy(dtype=object), pa.string()),
        }
    )


def connected_components(
    edges_ds,
    nodes_ds,
    *,
    num_partitions: int | None = None,
    max_rounds: int = 15,
    checkpoint_fn=None,
    local_threshold: int | None = None,
    int_cc_max_nodes: int | None = None,
    int_cc_max_edges: int | None = None,
):
    """edges(url_a, url_b) + nodes(url) → clusters(url, cluster_id).

    cluster_id = lexicographic-min url of the component (deterministic,
    SURVEY.md §7.0). ``checkpoint_fn(round_idx, labels_ds)`` is called per
    round when given (per-round checkpointing, SURVEY.md §7.1 M5).
    ``local_threshold``: edge count under which the driver finishes the
    closure locally (0 forces the distributed rounds — used in tests).

    Three size-aware physical plans, result-invariant: (1) small — edge
    strings pull to the driver; (2) medium — distinct endpoints under
    ``int_cc_max_nodes`` (~0.5 GB of url strings broadcast) and
    symmetric edges under ``int_cc_max_edges`` (int64 pairs on a
    128 GiB driver): ONE endpoint string exchange then an int-rank
    driver closure; (3) web-scale — distributed min-label rounds.
    Set both int caps to 0 to force the distributed rounds.
    """
    P = num_partitions or default_partitions()
    _lt, _mn, _me = _default_cc_caps()
    local_threshold = _lt if local_threshold is None else local_threshold
    int_cc_max_nodes = _mn if int_cc_max_nodes is None else int_cc_max_nodes
    int_cc_max_edges = _me if int_cc_max_edges is None else int_cc_max_edges

    # symmetric edge list: (src, dst) both directions — materialized once,
    # consumed every round.
    def sym(batch: pa.Table) -> pa.Table:
        a = batch["url_a"].combine_chunks()
        b = batch["url_b"].combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges_sym = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()

    n_edges = edges_sym.count()
    from .util import adaptive_partitions

    P = adaptive_partitions(n_edges, P)

    if n_edges == 0:
        # no matches at all → every node is its own cluster (also guards
        # the schema-less-empty-dataset join pitfall)
        return nodes_ds.map_batches(
            lambda t: pa.table({"url": t["url"], "cluster_id": t["url"]}),
            batch_format="pyarrow",
        )

    if n_edges <= local_threshold * 2:  # edges_sym holds both directions
        result = _local_components(edges_sym, nodes_ds)
        if checkpoint_fn is not None:
            # the documented per-round contract: the local path has one
            # "round" — surface its final labels to the caller's hook
            checkpoint_fn(0, result)
        return result

    # active set = distinct edge endpoints; labels init to self
    # (grouped_agg, not groupby().aggregate — see util.py: the latter
    # spins aggregator actors per call, ~1 s fixed latency × 2 calls ×
    # rounds in this loop)
    endpoints = grouped_agg(
        edges_sym, ["src"], {"nbr_min": ("dst", "min")}, n_buckets=P
    ).materialize()
    n_nodes = endpoints.count()

    # medium regime: edges too big to pull as STRINGS (the local path's
    # limit) but the distinct endpoints fit a broadcast and the edges
    # fit the driver as int64 pairs — close over int ranks, one string
    # exchange total (the endpoint aggregate above, which the
    # distributed rounds need anyway as their init). Bit-identical
    # cluster ids: rank = lexicographic rank, min-rank = min-url.
    if n_nodes <= int_cc_max_nodes and n_edges <= int_cc_max_edges:
        result = _int_edge_components(edges_sym, endpoints, nodes_ds)
        if checkpoint_fn is not None:
            checkpoint_fn(0, result)
        return result

    labels = endpoints.map_batches(
        lambda t: pa.table(
            {
                "url": t["src"],
                # round 0 folded in: label = min(self, min neighbor)
                "label": pc.min_element_wise(t["src"], t["nbr_min"]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def checksum(lbl_ds) -> int:
        def h(batch: pa.Table) -> pa.Table:
            s = int(crc32_array(batch["label"].to_pylist()).astype("int64").sum())
            return pa.table({"h": pa.array([s], pa.int64())})

        out = lbl_ds.map_batches(h, batch_format="pyarrow").aggregate(Sum("h"))
        return int(out["sum(h)"])

    prev_sum = checksum(labels)
    for rnd in range(max_rounds):
        # 1) neighbor labels: edge (src,dst) picks up label(dst)
        nbr_min = (
            grouped_agg(
                bucketed_join(edges_sym, labels, "dst", "url", n_buckets=P),
                ["src"], {"label": ("label", "min")}, n_buckets=P,
            )
            .map_batches(
                lambda t: pa.table({"url": t["src"], "label": t["label"]}),
                batch_format="pyarrow",
            )
        )
        # 2) pointer jumping: label'(u) = label(label(u)); label(u) is a
        #    node in the active set, so the self-join loses no rows.
        lbl_as_nodes = labels.map_batches(
            lambda t: pa.table({"url2": t["url"], "label2": t["label"]}),
            batch_format="pyarrow",
        )
        jump = bucketed_join(labels, lbl_as_nodes, "label", "url2", n_buckets=P).map_batches(
            lambda t: pa.table({"url": t["url"], "label": t["label2"]}),
            batch_format="pyarrow",
        )
        # 3) min per url across {current, neighbor-min, jumped}
        labels_next = grouped_agg(
            labels.union(nbr_min).union(jump),
            ["url"], {"label": ("label", "min")}, n_buckets=P,
        ).materialize()
        new_sum = checksum(labels_next)
        labels = labels_next
        if checkpoint_fn is not None:
            checkpoint_fn(rnd, labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    # singletons (nodes with no edges) keep themselves as cluster_id
    clusters = bucketed_join(nodes_ds, labels, "url", "url", how="left", n_buckets=P).map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "cluster_id": pc.coalesce(t["label"], t["url"]),
            }
        ),
        batch_format="pyarrow",
    )
    return clusters
