"""Every SQL-expressible query must match its DuckDB oracle exactly —
mimics the driver's compare: row count, column names, and
order-insensitive value equality (columns sorted by name, rows sorted)."""

import duckdb
import pandas as pd
import pytest

from mdmpublic_ray.pipelines.queries import ORACLE_SQL, QUERIES
from mdmpublic_ray.sources.tables import TABLES

SF = "/root/testdata/sf0.001"  # small sf for test speed; driver uses sf0.01


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "ts"
    return "obj"


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, ray_session):
    got = canon(to_pandas(QUERIES[name](SF)))
    want = canon(run_oracle(ORACLE_SQL[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    # the driver's value hash renders 1 and 1.0 differently: an int
    # column on one side and float on the other hash-mismatches even
    # when every value is equal (the r1 user_sessions red cell). Widths
    # may differ (int32 vs int64 render identically) — kinds may not.
    for c in got.columns:
        kg, kw = _dtype_kind(got[c].dtype), _dtype_kind(want[c].dtype)
        assert kg == kw, (
            f"{name}.{c}: dtype kind {got[c].dtype} vs oracle {want[c].dtype}"
        )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True,
                                  obj=name)


@pytest.mark.parametrize(
    "name",
    [
        "docs_simhash_clusters_full",
        "docs_minhash_clusters_full",
        "pages_media_features",
        "knn_cosine_lsh_full",
        "knn_cosine_ivf_full",
        "er_incremental",
        "docs_distinct_tokens_hll",
        "docs_top_tokens_mg",
        "docs_len_quantiles_mrl",
        "docs_strip_dup_spans",
    ],
)
def test_rows_only_queries_run(name, ray_session):
    res = to_pandas(QUERIES[name](SF))
    assert len(res) > 0
