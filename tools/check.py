#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads <verify_out_dir>/oracle_sql.json, runs each oracle SQL in DuckDB with
views named after the parquet tables in sf_dir, loads the Spark result parquet
from <verify_out_dir>/<name>/, sorts columns by name + rows, rounds floats to
6 dp, and hash-compares. Exit 1 on any mismatch.
"""
import json, math, sys, glob

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    """Sort columns by name, normalize floats, sort rows -> canonical list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{round(v, 6):.6f}"
        if isinstance(v, list):
            return "[" + ",".join(str(norm(x)) for x in v) + "]"
        return repr(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ocur = con.execute(sql)
            ocols = [c[0] for c in ocur.description]
            orows = ocur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scur = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = [c[0] for c in scur.description]
        srows = scur.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns {sorted(scols)} != oracle {sorted(ocols)}")
            n_fail += 1
            continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if a == b:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(srows)} spark rows vs {len(orows)} oracle rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at row {i}:\n    spark:  {x}\n    oracle: {y}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
