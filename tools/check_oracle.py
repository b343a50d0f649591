#!/usr/bin/env python3
"""Local harness-loop check: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with every
testdata table registered as a view. Sorts columns by name, sorts rows,
and compares values exactly; reports per-query PASS/FAIL with diffs.
"""
import glob
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd

# A single slow oracle once zeroed an entire round's correctness
# artifact (r10: qc2's CTE-inlined DuckDB plan ran 1,629 s and the
# driver's compare died inside it, recording {} for all 87 queries).
# Any oracle slower than this budget is a FAIL in its own right, even
# if the values match — a slow oracle is a latent artifact-killer.
# The default guards the DRIVER gate (sf0.01, where every oracle runs
# sub-second); scale-rung runs, where the exact embedding oracles
# legitimately take minutes, raise it: ORACLE_BUDGET_SEC=600.
ORACLE_BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "30"))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify lists so sorting works
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     type(v).__name__ == 'ndarray').any():
            df[c] = df[c].map(lambda v: json.dumps([float(x) for x in v])
                              if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df


def cmp(a: pd.DataFrame, b: pd.DataFrame, name: str) -> bool:
    ok = True
    if list(a.columns) != list(b.columns):
        print(f"  [{name}] COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            eq = (av.isna() & bv.isna()) | (av == bv)
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        bad = ~eq
        if bad.any():
            i = bad.idxmax()
            # float tolerance probe: is it an exactness problem?
            try:
                d = (pd.to_numeric(av[bad]) - pd.to_numeric(bv[bad])).abs().max()
            except Exception:
                d = None
            print(f"  [{name}] col '{c}': {bad.sum()}/{len(a)} rows differ; "
                  f"first at {i}: spark={av[i]!r} oracle={bv[i]!r} maxdiff={d}")
            ok = False
    return ok


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-len('.parquet')]
        # driver fixtures are single files; ScaleGen rungs are
        # Spark-written directories of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            a = norm(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            t0 = time.monotonic()
            b = norm(con.execute(sql).df())
            oracle_sec = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = cmp(a, b, name)
        if oracle_sec > ORACLE_BUDGET_SEC:
            print(f"FAIL {name}: oracle took {oracle_sec:.1f}s "
                  f"(budget {ORACLE_BUDGET_SEC:.0f}s) — a slow oracle can "
                  f"zero the driver's whole correctness artifact "
                  f"(values {'matched' if ok else 'DIFFER'}, {len(a)} rows)")
            n_fail += 1
        elif ok:
            print(f"PASS {name} ({len(a)} rows, oracle {oracle_sec:.2f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}")
            n_fail += 1
    # rows-only queries (no oracle SQL) can still fail to dump: surface
    # Verify's own error ledger so nothing disappears silently
    err_path = f"{out_dir}/verify_errors.json"
    if os.path.isfile(err_path):
        for name, msg in sorted(json.load(open(err_path)).items()):
            # oracle-checked failures were already reported as "no
            # spark output" above; this catches rows-only queries
            if name not in sqls and (not only or name in only):
                print(f"FAIL {name}: verify dump errored: {msg[:200]}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == '__main__':
    main()
