"""Distributed prefix-sum sequence packing must be bit-identical to a
single-process window scan, including across many range buckets."""

import numpy as np
import pandas as pd


def test_multi_bucket_prefix_matches_local(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from mdmpublic_ray.stages.packing import pack_token_stream

    rng = np.random.default_rng(11)
    n = 5_000
    # sparse, shuffled-order ids: exercises bucket stitching + in-bucket sort
    ids = rng.permutation(np.arange(0, n * 3, 3, dtype=np.int64))
    texts = [" ".join(["tok"] * int(k)) for k in rng.integers(1, 60, n)]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})).repartition(16)

    got = (
        pack_token_stream(ds, budget=256, group_size=128)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    df = pd.DataFrame({"doc_id": ids, "text": texts}).sort_values("doc_id")
    ntok = df["text"].str.count(r"[a-z0-9]+").astype("int64")
    excl = ntok.cumsum().shift(fill_value=0)
    want = pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": ntok.to_numpy(),
            "bin_id": (excl // 256).astype("int64").to_numpy(),
        }
    )
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # bins are contiguous from 0 and every bin (except maybe the last)
    # reaches the budget before the next opens
    assert got["bin_id"].min() == 0
    assert set(np.diff(np.unique(got["bin_id"]))) <= {1}
