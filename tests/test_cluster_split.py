"""docs_cluster_split: the cluster-aware splitter's defining invariants.

The oracle-equality check runs in test_queries_oracle.py (the entry is
registered in ORACLE_SQL); here we pin the semantic guarantees that make
the operator worth having over the per-doc `docs_split_assign`:

1. zero leakage BY CONSTRUCTION — no near-dup pair straddles splits;
2. cluster coherence — every member of a component carries the same
   (cluster_id, split);
3. totality — exactly one row per document.
"""

import pandas as pd

from mdmpublic_ray.pipelines.queries import (
    q_docs_cluster_split,
    q_docs_split_leakage,
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_cluster_split_invariants(ray_session):
    assign = q_docs_cluster_split(SF).to_pandas()

    # totality: one row per doc, non-null split in {train,val,test}
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert len(assign) == len(docs)
    assert set(assign["doc_id"]) == set(docs["doc_id"])
    assert set(assign["split"]) <= {"train", "val", "test"}

    # cluster coherence: one split per cluster_id
    per_cluster = assign.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()

    # zero leakage: re-run the leakage audit's pair stream and check no
    # pair straddles the cluster-aware assignment (the per-doc split the
    # audit uses DOES leak on this corpus — that contrast is the point).
    pairs = QUERIES["similar_doc_pairs"](SF).to_pandas()
    lookup = assign.set_index("doc_id")["split"]
    straddle = (
        lookup.loc[pairs["doc_id_a"]].to_numpy()
        != lookup.loc[pairs["doc_id_b"]].to_numpy()
    )
    assert not straddle.any()

    # the naive per-doc split leaks on this corpus (otherwise the
    # invariant above would be vacuous)
    naive_leaks = q_docs_split_leakage(SF).to_pandas()
    assert len(naive_leaks) > 0
