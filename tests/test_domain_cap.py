"""docs_domain_cap + er_blocking_metrics: semantics beyond oracle parity.

The oracle-equality check for docs_domain_cap runs in
test_queries_oracle.py (it is registered in ORACLE_SQL); here we pin
the operator-specific guarantees:

1. the cap binds — no source exceeds K rows, and a source with fewer
   docs keeps them all;
2. the batch-local pre-prune is a valid combiner — the result is
   invariant to input block layout (global top-K == top-K of local
   top-Ks);
3. er_blocking_metrics (rows-only) upholds its documented contract on
   the truth-restricted corpus: PC = 1.0 (required by the oracled
   recall 1.0 of er_clusters_oracle) and the counter identities hold.
"""

import pandas as pd

from mdmpublic_ray.pipelines.queries import (
    _DOMAIN_CAP_K,
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_domain_cap_binds_and_is_layout_invariant(ray_session):
    got = QUERIES["docs_domain_cap"](SF).to_pandas()

    per_source = got.groupby("source").size()
    assert (per_source <= _DOMAIN_CAP_K).all()

    # brute force on the small corpus: global sort + head per source
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source", "text"])
    from mdmpublic_ray.functions import text as T

    toks = docs["text"].map(T.tokens)
    ref = pd.DataFrame(
        {
            "source": docs["source"],
            "doc_id": docs["doc_id"],
            "n_tokens": toks.map(len).astype("int64"),
            "unique_ratio": toks.map(lambda ts: len(set(ts))).astype("int64")
            / toks.map(len).astype("int64"),
        }
    )
    ref = ref.sort_values(
        ["source", "unique_ratio", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    ref = ref.groupby("source", sort=False).head(_DOMAIN_CAP_K)

    key = ["source", "doc_id", "n_tokens", "unique_ratio"]
    a = got[key].sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = ref[key].sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # a source with fewer than K docs keeps every doc
    counts = docs.groupby("source").size()
    small = counts[counts < _DOMAIN_CAP_K]
    for s, n in small.items():
        assert per_source.get(s, 0) == n


def test_er_blocking_metrics_contract(ray_session):
    m = QUERIES["er_blocking_metrics"](SF)
    row = m.iloc[0]
    assert row["pair_completeness"] == 1.0
    assert row["true_in_candidates"] == row["n_true_pairs"] > 0
    assert 0 < row["n_candidates"] < row["n_docs"] * (row["n_docs"] - 1) // 2
    assert 0.0 < row["pair_quality"] <= 1.0
