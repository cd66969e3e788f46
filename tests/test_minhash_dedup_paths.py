"""MinHash near-dup clustering: the broadcast verify path and the
two-join shuffle path must produce identical clusters."""

import pandas as pd

from mdmpublic_ray.stages.minhash_dedup import near_dup_clusters

SF = "/root/testdata/sf0.001"


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_broadcast_and_join_paths_identical(ray_session):
    a = _df(near_dup_clusters(SF))                          # broadcast
    b = _df(near_dup_clusters(SF, broadcast_threshold=0))   # forced joins
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # every rep is a member of its own cluster
    reps = set(a["rep_id"])
    assert reps <= set(a["doc_id"])
