"""Local stand-in for the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() through
Spark and DuckDB on the same sf dir, compares row count, sorted column
names, and exact values (columns sorted by name, rows sorted by all
columns). Floats are compared bit-exactly first, then with 1e-9 relative
tolerance reported separately so near-misses are visible.

Usage: python tools/check_correctness.py [sf_dir] [only_csv] [--json PATH]

``--json PATH`` additionally writes a machine-readable per-query log
({queries: {name: {status, rows, seconds, problems}}, summary}) — the
committed CORRECTNESS_LOCAL_r*.json artifacts that give the driver-
unsampled queries standing evidence.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = canon(spark_pdf), canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv):
            sa, oa = sv.to_numpy(), ov.to_numpy(float)
            exact = np.array_equal(sa, oa, equal_nan=True)
            if not exact:
                close = np.allclose(sa, oa, rtol=1e-9, atol=1e-12, equal_nan=True)
                diff = np.nanmax(np.abs(sa - oa)) if len(sa) else 0
                problems.append(
                    f"col {c}: float mismatch (close={close}, maxdiff={diff:.3e})"
                )
        else:
            if not sv.astype(str).equals(ov.astype(str)):
                bad = (sv.astype(str) != ov.astype(str)).to_numpy().nonzero()[0][:3]
                examples = [(c, int(i), sv.iloc[i], ov.iloc[i]) for i in bad]
                problems.append(f"col {c}: value mismatch, e.g. {examples}")
    return problems


def main():
    args = list(sys.argv[1:])
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1].split(",")) if len(args) > 1 else None

    import __spark_entry__ as entry_mod
    from synch_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    log: dict = {}

    def record(name, status, rows, t0, problems=None):
        log[name] = {"status": status, "rows": rows,
                     "seconds": round(time.time() - t0, 2),
                     "problems": problems or []}

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            record(name, "fail", None, t0, [f"spark error: {e}"])
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            record(name, "rows_only", len(sdf), t0)
            n_weak += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            record(name, "fail", len(sdf), t0, [f"oracle error: {e}"])
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            record(name, "fail", len(sdf), t0, problems)
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            record(name, "pass", len(sdf), t0)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    if json_path:
        import json as _json

        with open(json_path, "w") as f:
            _json.dump({
                "sf_dir": sf_dir,
                "summary": {"pass": n_pass, "fail": n_fail,
                            "rows_only": n_weak,
                            "total": n_pass + n_fail + n_weak},
                "queries": log,
            }, f, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
