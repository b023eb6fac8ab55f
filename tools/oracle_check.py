#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query dir in verify_out with an oracle_sql.json entry:
read the Spark parquet result, run the oracle SQL in DuckDB over views
named after the test tables, sort columns by name, compare shape,
dtypes (loosely) and values (exact for ints/strings, bitwise for
floats since our oracles are engineered for bit-parity).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        bad = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                bad.append(f"{c}[row{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r} ({(~eq).sum()} diffs)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
