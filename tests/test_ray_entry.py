"""Driver-contract smoke tests for __ray_entry__.py."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", Path(__file__).resolve().parent.parent / "__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(entry_mod):
    res = entry_mod.entry()
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    assert len(df) > 0
    assert set(df.columns) == {
        "cluster_id", "canonical_url", "n_members", "langs", "max_warc_ts", "text_len",
    }


def test_queries_and_oracles_consistent(entry_mod):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 25
    assert set(o) <= set(q), "oracle keys must be a subset of query keys"
    for name, fn in q.items():
        assert callable(fn), name


def test_er_clusters_query_runs(entry_mod):
    res = entry_mod.queries()["er_clusters"]("/root/testdata/sf0.001")
    df = res.to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"url", "cluster_id"}
    # pages_from_documents plants mirrors for every 5th doc: clustering
    # must merge at least some of them
    assert df["cluster_id"].nunique() < len(df)
