"""ExactSubstr-style duplicated-span detection/removal (stages/substrdedup.py):
planted shared passages survive exactly once, unique text is untouched,
and a second pass over cleaned output removes nothing (idempotence)."""

import numpy as np
import pandas as pd
import pyarrow as pa


SHARED = "the quick brown fox jumps over the lazy dog near the riverbank today"  # 13 tokens
UNIQUE = {
    10: "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    20: "kilo lima mike november oscar papa quebec romeo sierra tango",
    30: "uniform victor whiskey xray yankee zulu one two three four",
}


def _docs_table(texts: dict[int, str]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )


def _run_strip(texts, k=8):
    import ray.data as rd

    from mdmpublic_ray.stages.substrdedup import strip_dup_spans

    ds = rd.from_arrow(_docs_table(texts)).repartition(3)
    return (
        strip_dup_spans(ds, k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .set_index("doc_id")
    )


def test_shared_passage_survives_exactly_once(ray_session):
    texts = {
        10: UNIQUE[10] + " " + SHARED,
        20: SHARED + " " + UNIQUE[20],
        30: UNIQUE[30] + " " + SHARED + " tail words here",
    }
    out = _run_strip(texts)

    # winner = smallest (doc_id, pos): doc 10 keeps the passage
    assert SHARED in out.loc[10, "text"]
    assert out.loc[10, "n_tokens_removed"] == 0
    assert out.loc[10, "text"] == texts[10]

    # losers lose the whole 13-token passage as ONE merged span
    for did in (20, 30):
        assert SHARED not in out.loc[did, "text"]
        assert out.loc[did, "n_tokens_removed"] == 13
    # unique text is untouched
    assert out.loc[20, "text"] == UNIQUE[20]
    assert out.loc[30, "text"] == UNIQUE[30] + " tail words here"


def test_within_doc_repeat_deduped_and_idempotent(ray_session):
    texts = {
        1: SHARED + " middle filler words go here now " + SHARED,
        2: UNIQUE[10],
    }
    out = _run_strip(texts)
    # the second in-doc occurrence is the loser
    assert out.loc[1, "text"].count("quick brown fox") == 1
    assert out.loc[1, "n_tokens_removed"] == 13
    assert out.loc[2, "text"] == UNIQUE[10]

    # idempotence: re-running on cleaned docs removes nothing
    again = _run_strip(dict(zip(out.index, out["text"])))
    assert int(again["n_tokens_removed"].sum()) == 0
    pd.testing.assert_series_equal(
        again["text"].sort_index(), out["text"].sort_index(), check_names=False
    )


def test_short_docs_below_k_untouched(ray_session):
    texts = {1: "too short", 2: "too short", 3: ""}
    out = _run_strip(texts)
    assert int(out["n_tokens_removed"].sum()) == 0
    assert list(out["text"]) == ["too short", "too short", ""]


def test_dup_ngram_stats_planted_counts(ray_session):
    import ray.data as rd

    from mdmpublic_ray.stages.substrdedup import dup_ngram_stats

    k = 8
    texts = {
        10: UNIQUE[10] + " " + SHARED,   # 10 + 13 = 23 tokens -> 16 windows
        20: SHARED + " " + UNIQUE[20],
        30: UNIQUE[30],                  # 10 tokens -> 3 windows, no dups
    }
    ds = rd.from_arrow(_docs_table(texts)).repartition(2)
    out = (
        dup_ngram_stats(ds, k=k)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    n_shared_windows = len(SHARED.split()) - k + 1  # 6 windows inside SHARED
    assert out.loc[10, "n_windows"] == 23 - k + 1
    assert out.loc[20, "n_windows"] == 23 - k + 1
    assert out.loc[30, "n_windows"] == 10 - k + 1
    assert out.loc[10, "n_dup_windows"] == n_shared_windows
    assert out.loc[20, "n_dup_windows"] == n_shared_windows
    assert out.loc[30, "n_dup_windows"] == 0
    assert out["n_windows"].dtype == np.int64
    assert out["n_dup_windows"].dtype == np.int64
