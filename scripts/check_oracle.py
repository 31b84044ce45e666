#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <verifyOutDir> <sfDir>

Loads each <name>/ parquet dir written by `graft.Verify`, runs the matching
oracle_sql.json entry in DuckDB against the sfDir parquet tables, and
compares: column names (sorted), row counts, and values (rows sorted by all
columns; floats compared to 1e-9 relative tolerance, with the max observed
divergence reported so exact-hash risk is visible).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def sort_key(row):
    return tuple((str(type(v)), str(v)) for v in row)


def compare(name, spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT spark={len(spark_rows)} duck={len(duck_rows)}", 0.0
    a = sorted(spark_rows, key=sort_key)
    b = sorted(duck_rows, key=sort_key)
    max_rel = 0.0
    for i, (ra, rb) in enumerate(zip(a, b)):
        for j, (x, y) in enumerate(zip(ra, rb)):
            x, y = norm_cell(x), norm_cell(y)
            if isinstance(x, float) and isinstance(y, float):
                if x == y:
                    continue
                denom = max(abs(x), abs(y), 1e-30)
                rel = abs(x - y) / denom
                max_rel = max(max_rel, rel)
                if rel > 1e-9:
                    return (f"VALUE row~{i} col={cols[j]} "
                            f"spark={x!r} duck={y!r}"), max_rel
            elif x != y:
                return (f"VALUE row~{i} col={cols[j]} "
                        f"spark={x!r} duck={y!r}"), max_rel
    return None, max_rel


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            bad += 1
            continue
        try:
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            bad += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: COLS spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            bad += 1
            continue
        # align duck columns to spark order
        idx = [duck_cols.index(c) for c in spark_cols]
        duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]
        err, max_rel = compare(name, spark_df, duck_rows, spark_cols)
        if err:
            print(f"FAIL {name}: {err}")
            bad += 1
        else:
            fuzz = f" (max_rel_float_diff={max_rel:.2e})" if max_rel else ""
            print(f"ok   {name}: {len(spark_df)} rows{fuzz}")
            ok += 1
    print(f"== {ok} ok, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
