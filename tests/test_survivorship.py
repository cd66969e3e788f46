"""Unit tests for the declarative survivorship rule engine: each rule's
winner choice and its documented tie-breaks, on groups built to collide."""

import pandas as pd
import pytest

from mdmpublic_ray.stages.survivorship import Rule, resolve_bucket, survivorship


def frame() -> pd.DataFrame:
    # key 1: latest tie on ts (rows a/b share ts=30) -> min event_id wins;
    #        majority tie (x:2, y:2) -> lexicographically smaller 'x' wins
    # key 2: priority: 'gold' outranks 'web'; rank tie on two golds -> min id
    # key 3: singleton; source unlisted in ranking -> still wins (only row)
    return pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2, 2, 3],
            "id": [11, 10, 12, 13, 21, 20, 22, 30],
            "ts": [30, 30, 20, 10, 1, 2, 3, 9],
            "val": ["a", "b", "c", "d", "e", "f", "g", "h"],
            "cat": ["x", "y", "y", "x", "web", "gold", "gold", "zzz"],
            "amt": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
        }
    )


RULES = [
    Rule(out="n", kind="count"),
    Rule(out="amt_sum", kind="sum", col="amt"),
    Rule(out="amt_max", kind="max", col="amt"),
    Rule(out="ts_min", kind="min", col="ts"),
    Rule(out="last_val", kind="latest", col="val", by="ts", tiebreak="id"),
    Rule(out="first_val", kind="earliest", col="val", by="ts", tiebreak="id"),
    Rule(out="modal_cat", kind="majority", col="cat"),
    Rule(out="pri_id", kind="priority", col="cat",
         ranking=("gold", "web"), tiebreak="id", emit="id"),
]


def test_resolve_bucket_rules_and_ties():
    out = resolve_bucket(frame(), "k", RULES).set_index("k")
    # counts / aggregates
    assert out.loc[1, "n"] == 4 and out.loc[3, "n"] == 1
    assert out.loc[1, "amt_sum"] == pytest.approx(10.0)
    assert out.loc[2, "amt_max"] == pytest.approx(7.0)
    assert out.loc[1, "ts_min"] == 10
    # latest: ts=30 tie between id 11 ('a') and id 10 ('b') -> min id -> 'b'
    assert out.loc[1, "last_val"] == "b"
    # earliest: unique min ts=10 -> 'd'
    assert out.loc[1, "first_val"] == "d"
    # majority: x,y both count 2 -> lexicographic min 'x'
    assert out.loc[1, "modal_cat"] == "x"
    # priority: two 'gold' rows (ids 20,22) -> min id 20
    assert out.loc[2, "pri_id"] == 20
    # unlisted source ranks last but is the only member
    assert out.loc[3, "pri_id"] == 30 and out.loc[3, "modal_cat"] == "zzz"


def test_survivorship_distributed_matches_local(ray_session):
    import ray.data as rd

    df = frame()
    got = (
        survivorship(rd.from_pandas(df).repartition(3), "k", RULES, n_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = resolve_bucket(df, "k", RULES).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rule_validation():
    with pytest.raises(ValueError):
        Rule(out="x", kind="nope")
    with pytest.raises(ValueError):
        Rule(out="x", kind="sum")  # col required
    with pytest.raises(ValueError):
        Rule(out="x", kind="latest", col="v")  # by required
    with pytest.raises(ValueError):
        Rule(out="x", kind="priority", col="v")  # ranking required
    with pytest.raises(ValueError):
        # duplicate output name rejected at plan time
        survivorship(None, "k", [Rule(out="a", kind="count"),
                                 Rule(out="a", kind="count")])


def test_empty_bucket_schema():
    out = resolve_bucket(frame().iloc[0:0], "k", RULES)
    assert list(out.columns) == ["k"] + [r.out for r in RULES]
    assert out.empty


def test_golden_broadcast_coverage_guards(ray_session):
    """Round-4 advice: the broadcast attach fails LOUDLY (named urls /
    named invariant) on out-of-sync inputs instead of ArrowIndexError
    from take(-1) or pandas InvalidIndexError."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from mdmpublic_ray.stages.golden import golden_records

    pages = pa.table(
        {
            "url": ["u1", "u2"],
            "warc_ts": [1, 2],
            "lang": ["en", "en"],
            "text": ["aa", "bb"],
        }
    )
    clusters_bad = rd.from_arrow(
        pa.table({"url": ["u1", "u3"], "cluster_id": ["u1", "u1"]})
    )
    with pytest.raises(Exception, match="missing from the pages"):
        golden_records(clusters_bad, rd.from_arrow(pages)).materialize()

    dup_pages = pa.concat_tables([pages, pages.slice(0, 1)])
    clusters_ok = rd.from_arrow(
        pa.table({"url": ["u1"], "cluster_id": ["u1"]})
    )
    with pytest.raises(Exception, match="duplicate url"):
        golden_records(clusters_ok, rd.from_arrow(dup_pages)).materialize()
