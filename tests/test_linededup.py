"""Cross-document line dedup: globally-first occurrence wins, even when
pages land in different blocks; within-page duplicates collapse too."""

import pandas as pd
import pyarrow as pa


def test_first_occurrence_wins_across_blocks(ray_session):
    import ray.data as rd

    from mdmpublic_ray.stages.linededup import dedup_lines

    pages = {
        0: "alpha\nshared nav\nbeta",
        1: "shared nav\ngamma\nshared nav",   # both copies lose to page 0
        2: "delta\ndelta\nepsilon",           # within-page dup collapses
        3: "shared nav",                      # loses everything -> empty
    }
    t = pa.table(
        {
            "page_id": pa.array(list(pages), pa.int64()),
            "raw_text": pa.array(list(pages.values()), pa.string()),
        }
    )
    out = (
        dedup_lines(rd.from_arrow(t).repartition(4), n_buckets=8)
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "page_id": [0, 1, 2, 3],
            "n_kept": [3, 1, 2, 0],
            "clean_text": ["alpha\nshared nav\nbeta", "gamma", "delta\nepsilon", ""],
        }
    )
    pd.testing.assert_frame_equal(out, want)
