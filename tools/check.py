#!/usr/bin/env python3
"""Local differential checker (dev tool only — the library itself is pure
Scala/Spark). Replicates the driver's t2 gate: reads each query's parquet dump
produced by graft.Verify, runs the corresponding oracle SQL in DuckDB over the
same testdata parquet, and compares values column-name-sorted.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    import decimal
    import numpy as np
    if isinstance(v, (float, np.floating)):
        v = float(v)
        return "nan" if math.isnan(v) else v
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return int(v) if v == v.to_integral_value() else float(v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
            got = got.reindex(sorted(got.columns), axis=1)
            exp = exp.reindex(sorted(exp.columns), axis=1)
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
                n_fail += 1
                continue
            if len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                n_fail += 1
                continue
            grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
            erows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
            # exact compare both as-ordered and sorted (driver may do either)
            ordered_ok = grows == erows
            sorted_ok = sorted(map(repr, grows)) == sorted(map(repr, erows))
            if ordered_ok and sorted_ok:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: ordered_ok={ordered_ok} sorted_ok={sorted_ok}")
                for g, e in list(zip(grows, erows))[:200]:
                    if g != e:
                        print(f"  got={g}\n  exp={e}")
                        break
        except Exception as ex:
            n_fail += 1
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
