#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify.scala's parquet
outputs, run each oracle SQL in DuckDB over the same sf tables, compare
(sorted columns, sorted rows, exact values). Usage:
    python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_df)})"); continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1; continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        try:
            ok = True
            for c in s.columns:
                sc, oc = s[c], o[c]
                if sc.dtype != oc.dtype:
                    # tolerate representational dtype gaps, compare as string
                    sc, oc = sc.astype(str), oc.astype(str)
                if not sc.equals(oc):
                    diff = (sc != oc) & ~(sc.isna() & oc.isna())
                    i = diff.idxmax()
                    print(f"FAIL {name}: col {c} differs at row {i}: {sc[i]!r} vs {oc[i]!r} "
                          f"(dtypes {s[c].dtype}/{o[c].dtype}, {int(diff.sum())} diffs)")
                    ok = False
                    break
            if ok:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: compare error: {e}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
