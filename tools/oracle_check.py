#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
       python3 tools/oracle_check.py --lint <oracle_sql.json> <sf_dir>

For each query dir in verify_out with an oracle_sql.json entry:
read the Spark parquet result, run the oracle SQL in DuckDB over views
named after the test tables, sort columns by name, compare shape,
dtypes (loosely) and values (exact for ints/strings, bitwise for
floats since our oracles are engineered for bit-parity).

`--lint` runs ONLY the oracle-output type lint over every oracle SQL
(no Spark outputs needed): every result column's DuckDB type must be
in the parquet-comparable set {BIGINT, DOUBLE, VARCHAR, BOOLEAN} —
SURVEY §4's rule. DuckDB promotes sum(BIGINT) to HUGEINT, which
materializes differently from Spark's BIGINT under the driver's
type-sensitive hash even when values are equal (the cur14_pagerank
round-14 failure class); this lint catches it one round early.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# SURVEY §4: the parquet-comparable oracle output types (INTEGER =
# Spark INT, both int32 in parquet). Anything else (HUGEINT from
# integer-sum promotion, DECIMAL, DATE, TIMESTAMP, ...) must be
# CAST/converted in the oracle SQL itself.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN"}


def connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def lint_types(con, oracle) -> int:
    """Zero-result-row type check of every oracle's output schema."""
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            offending = [
                f"{c}:{t}" for c, t in zip(rel.columns, [str(x) for x in rel.types])
                if str(t).upper() not in ALLOWED_TYPES
            ]
        except Exception as e:
            print(f"LINT FAIL {name}: exec error: {str(e)[:200]}")
            bad += 1
            continue
        if offending:
            print(f"LINT FAIL {name}: non-parquet-comparable output types: "
                  + ", ".join(offending))
            bad += 1
    print(f"type lint: {len(oracle) - bad}/{len(oracle)} oracles clean "
          f"(allowed: {sorted(ALLOWED_TYPES)})")
    return bad


def main(out_dir: str, sf_dir: str) -> int:
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    lint_failures = lint_types(con, oracle)
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
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match"
          + (f"; {lint_failures} type-lint failures" if lint_failures else ""))
    return 1 if (failures or lint_failures) else 0


if __name__ == "__main__":
    usage = ("usage: oracle_check.py <verify_out_dir> <sf_dir>\n"
             "       oracle_check.py --lint <oracle_sql.json> <sf_dir>")
    if len(sys.argv) < 3 or (sys.argv[1] == "--lint" and len(sys.argv) < 4):
        sys.exit(usage)
    if sys.argv[1] == "--lint":
        sys.exit(1 if lint_types(connect(sys.argv[3]),
                                 json.load(open(sys.argv[2]))) else 0)
    sys.exit(main(sys.argv[1], sys.argv[2]))
