#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with every
<sfDir>/*.parquet registered as a view named by basename, then compares
(sorted rows × sorted columns) for exact equality. Purely a dev-loop tool —
the real gate is driver-side.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no result dir"); failures += 1; continue
        try:
            mine = pd.concat([pd.read_parquet(f) for f in
                              glob.glob(f"{res_dir}/*.parquet")], ignore_index=True)
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        m, w = canon(mine), canon(want)
        if list(m.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(m.columns)} vs {list(w.columns)}")
            failures += 1; continue
        if len(m) != len(w):
            print(f"FAIL {name}: rows {len(m)} vs {len(w)}"); failures += 1; continue
        diff_cols = []
        for c in m.columns:
            a, b = m[c].to_numpy(), w[c].to_numpy()
            eq = pd.Series(a).equals(pd.Series(b)) or \
                (a.dtype.kind == 'f' and b.dtype.kind == 'f' and
                 np.array_equal(a, b, equal_nan=True))
            if not eq:
                # dtype-insensitive value compare
                try:
                    eq = all(pd.Series(a).astype(object).fillna("∅") ==
                             pd.Series(b).astype(object).fillna("∅"))
                except Exception:
                    eq = False
            if not eq:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = m[c].astype(object) != w[c].astype(object)
                idx = list(np.where(neq)[0][:3])
                for i in idx:
                    print(f"   row {i} col {c}: mine={m[c][i]!r} want={w[c][i]!r}")
            failures += 1
        else:
            # dtype check (schema parity signal)
            dt_m = [str(m[c].dtype) for c in m.columns]
            dt_w = [str(w[c].dtype) for c in w.columns]
            note = "" if dt_m == dt_w else f"  [dtype drift: {list(zip(m.columns, dt_m, dt_w))}]"
            print(f"PASS {name} ({len(m)} rows){note}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
