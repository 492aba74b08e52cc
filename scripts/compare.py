#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the parquet dumped by
graft.Verify. Usage: compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    # driver compare: sort columns by name, then hash values; we sort rows too
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            continue
        try:
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:120]}")
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
            continue
        e_c, g_c = canon(exp), canon(got)
        if len(e_c) != len(g_c):
            print(f"FAIL {name}: rows exp={len(e_c)} got={len(g_c)}")
            continue
        # dtype check (schema match matters to the driver)
        dt_mismatch = [
            (c, str(e_c[c].dtype), str(g_c[c].dtype))
            for c in e_c.columns if str(e_c[c].dtype) != str(g_c[c].dtype)
        ]
        if dt_mismatch:
            print(f"WARN {name}: dtype mismatch {dt_mismatch}")
        eq = e_c.equals(g_c)
        if not eq:
            diff = (e_c != g_c) & ~(e_c.isna() & g_c.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows; first:")
            print("  exp:", e_c[bad].head(2).to_dict("records"))
            print("  got:", g_c[bad].head(2).to_dict("records"))
            continue
        n_ok += 1
        print(f"OK   {name} ({len(e_c)} rows)")
    print(f"== {n_ok}/{len(oracle)} matched")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
