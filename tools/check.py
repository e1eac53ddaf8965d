#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT shipped library code).

Runs DuckDB over oracle_sql.json emitted by graft.Verify and compares each
query's parquet dump: column names (sorted), row count, and cell-exact values
after sorting rows. Usage:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sort/compare across dtypes
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}");  n_fail += 1;  continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs oracle {sorted(exp.columns)}")
            n_fail += 1;  continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            n_fail += 1;  continue
        g, e = normalize(got), normalize(exp)
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first:")
            idx = diff.idxmax()
            print("  spark :", g.loc[idx].to_dict())
            print("  oracle:", e.loc[idx].to_dict())
            n_fail += 1;  continue
        print(f"PASS {name} ({len(got)} rows)")
    print(f"{len(oracle) - n_fail}/{len(oracle)} queries match")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
