#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads the parquet dumped by graft.Verify from <outDir>/<query>/, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares rows / columns / values (columns
sorted by name, rows sorted, floats compared with tolerance).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    import datetime
    import decimal
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            # a DECIMAL on one side vs DOUBLE on the other must not
            # false-FAIL on exact ==: coerce Decimal to float so both the
            # comparison AND the row-sort key match the float twin
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                vals.append(round(v, 6))
            elif isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                # mirror the driver's pandas comparator: DATE and midnight
                # TIMESTAMP are the same value (Spark's date_trunc returns
                # timestamp; DuckDB's returns date)
                vals.append(datetime.datetime(v.year, v.month, v.day))
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    wanted = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    names = wanted or sorted(oracle)
    failed = []
    for name in names:
        if name not in oracle:
            # no value comparison possible — report the dump's row count so
            # the line is an actual (weak) check, not a silent skip
            try:
                n = con.execute(
                    f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
                ).fetchone()[0]
                print(f"{name}: SKIPPED (no oracle; dump has {n} rows)")
            except Exception as e:
                print(f"{name}: ERROR reading dump: {e}")
                failed.append(name)
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark.description]
            s_rows = spark.fetchall()
            orc = con.execute(oracle[name])
            o_cols = [d[0] for d in orc.description]
            o_rows = orc.fetchall()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            failed.append(name)
            continue
        ok_cols = sorted(s_cols) == sorted(o_cols)
        ok_rows = len(s_rows) == len(o_rows)
        ok_vals = False
        if ok_cols and ok_rows:
            a, b = canon(s_rows, s_cols), canon(o_rows, o_cols)
            ok_vals = all(
                len(x) == len(y) and all(approx_eq(u, v) for u, v in zip(x, y))
                for x, y in zip(a, b))
            if not ok_vals:
                for x, y in zip(a, b):
                    if len(x) != len(y) or not all(
                            approx_eq(u, v) for u, v in zip(x, y)):
                        print(f"  first diff:\n    spark:  {x}\n    oracle: {y}")
                        break
        status = "PASS" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failed.append(name)
            print(f"{name}: {status} rows {len(s_rows)}/{len(o_rows)} "
                  f"cols_match={ok_cols} spark_cols={sorted(s_cols)} "
                  f"oracle_cols={sorted(o_cols)}")
        else:
            print(f"{name}: PASS ({len(s_rows)} rows)")
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
