#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads <verify_out_dir>/oracle_sql.json, runs each oracle SQL in DuckDB with
views named after the parquet tables in sf_dir, loads the Spark result parquet
from <verify_out_dir>/<name>/, and compares the two sides the way the DRIVER
does: through pandas DataFrames (duckdb .df()), so dtype divergence is part of
the comparison. Round 1 proved why this matters: DuckDB SUM(integer) returns
HUGEINT which pandas renders as float64, while Spark writes int64 — a
fetchall()/repr comparison sees equal Python ints and masks the driver's
hash failure. Exit 1 on any mismatch.
"""
import json, math, sys, glob

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    """Dtype-sensitive canonical rendering: float64 integers render as
    '1234.000000', int64 as '1234' — so a HUGEINT-vs-BIGINT divergence FAILS
    here exactly as it fails the driver's pandas hash."""
    if isinstance(v, (np.floating, float)):
        if math.isnan(v):
            return "nan"
        return f"{round(float(v), 6):.6f}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if v is None:
        return "None"
    return repr(v)


def canon(df):
    """Sort columns by name, normalize values, sort rows -> canonical list."""
    df = df[sorted(df.columns)]
    return sorted(
        tuple(norm(v) for v in tup)
        for tup in df.itertuples(index=False, name=None)
    )


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # No ASCII guard (round 6): the Scala PolyHash/Winnow expressions iterate
    # Unicode code points, matching DuckDB's ord()/length()/substring(), so
    # the sketch oracles replay bit-exactly for any corpus.

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # Verify writes <name>.err when the query threw — surface the
            # exception instead of a bare absence
            try:
                err = open(f"{out_dir}/{name}.err").read().strip()
                print(f"FAIL {name}: spark error: {err[:300]}")
            except OSError:
                print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} != oracle {sorted(odf.columns)}")
            n_fail += 1
            continue
        try:
            a, b = canon(sdf), canon(odf)
        except Exception as e:
            # the driver's checker also dies on unsortable/unhashable cells
            # (e.g. raw ndarray columns) — surface that as a failure here
            print(f"FAIL {name}: canonicalize error: {e}")
            n_fail += 1
            continue
        if a == b:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(sdf)} spark rows vs {len(odf)} oracle rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at row {i}:\n    spark:  {x}\n    oracle: {y}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
