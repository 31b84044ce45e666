#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <verifyOutDir> <sfDir> [--exact]

Loads each <name>/ parquet dir written by `graft.Verify`, runs the matching
oracle_sql.json entry in DuckDB against the sfDir parquet tables, and
compares: column names (sorted), row counts, and values (rows sorted by all
columns).

Default mode compares floats to 1e-9 relative tolerance (reporting max
observed divergence). --exact is the pre-commit gate for any QueryCatalog
change and replicates the driver's hash sensitivity:
  * ARROW-LEVEL type classes must match per column: the driver consumes
    arrow/pandas values, where e.g. DuckDB's sum(INTEGER) is HUGEINT ->
    decimal128(38,0) even though fetchall() shows a plain int — a
    decimal-vs-int column WILL hash red (the round-3 `sessionize` failure)
    even when every cell value is equal. Timestamp unit (ns vs us) is
    exempt: driver evidence (8 green queries with ns-vs-us ts columns)
    shows it canonicalizes units away.
  * floats must be BIT-identical (struct.pack) — catches -0.0 vs 0.0 and
    NaN payload differences that `==` hides,
  * any cross-type cell (e.g. Decimal vs float) is a FAIL — the driver
    canonicalizes Decimal and float differently, so a type mismatch WILL
    fail the hash even when values are numerically equal,
  * Decimals compare by str() — Decimal('133.60') != Decimal('133.6') —
    because the driver's canonicalization is scale-sensitive (the round-2
    regression: 6 green-valued queries hashed red on trailing zeros),
  * every Decimal-typed output column is reported as a risk warning.
"""
import argparse
import decimal
import json
import math
import struct
import sys

import duckdb
import pyarrow as pa

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


def type_class(t):
    """Arrow type -> the equivalence class the driver hash distinguishes."""
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit (ns/us) proven benign to the driver hash
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    return str(t)


def arrow_type_mismatches(spark_tbl, oracle_tbl):
    """Column-level type-class differences between the two arrow schemas."""
    out = []
    for f in oracle_tbl.schema:
        if f.name not in spark_tbl.column_names:
            continue
        sc = type_class(spark_tbl.schema.field(f.name).type)
        oc = type_class(f.type)
        if sc != oc:
            out.append(f"{f.name}: spark={sc} oracle={oc}")
    return out


def floats_bit_equal(x, y):
    return struct.pack("<d", x) == struct.pack("<d", y)


def compare(name, spark_rows, duck_rows, cols, exact):
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT spark={len(spark_rows)} duck={len(duck_rows)}", 0.0
    a = sorted(spark_rows, key=sort_key)
    b = sorted(duck_rows, key=sort_key)
    max_rel = 0.0
    for i, (ra, rb) in enumerate(zip(a, b)):
        for j, (x, y) in enumerate(zip(ra, rb)):
            x, y = norm_cell(x), norm_cell(y)
            if exact and type(x) is not type(y):
                return (f"TYPE row~{i} col={cols[j]} "
                        f"spark={type(x).__name__}({x!r}) "
                        f"duck={type(y).__name__}({y!r})"), max_rel
            if exact and isinstance(x, decimal.Decimal) \
                    and isinstance(y, decimal.Decimal):
                if str(x) != str(y):
                    return (f"DECIMAL-REPR row~{i} col={cols[j]} "
                            f"spark={x!r} duck={y!r}"), max_rel
                continue
            if isinstance(x, float) and isinstance(y, float):
                if exact:
                    if floats_bit_equal(x, y):
                        continue
                    return (f"FLOAT-BITS row~{i} col={cols[j]} "
                            f"spark={x!r} duck={y!r}"), max_rel
                if x == y:
                    continue
                # one-sided NaN: rel would be NaN and NaN > tol is False,
                # silently passing the divergence (both-NaN was already
                # normalized equal by norm_cell)
                if math.isnan(x) or math.isnan(y):
                    return (f"NAN row~{i} col={cols[j]} "
                            f"spark={x!r} duck={y!r}"), max_rel
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


def decimal_cols(rows, cols):
    """Columns holding any Decimal cell — a driver-hash risk in any mode."""
    hit = set()
    for r in rows:
        for j, v in enumerate(r):
            if isinstance(v, decimal.Decimal):
                hit.add(cols[j])
        if len(hit) == len(cols):
            break
    return sorted(hit)


def main(out_dir, sf_dir, exact=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_res = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [d[0] for d in spark_res.description]
            spark_df = spark_res.fetchall()
            # arrow-level schema of the raw Spark parquet (NOT via duckdb,
            # which coerces types): what the driver's reader actually sees.
            # Only needed for the --exact arrow-type check.
            spark_tbl = None
            if exact:
                import pyarrow.parquet as pq
                spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            bad += 1
            continue
        try:
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
            # second oracle execution only when --exact needs arrow types
            oracle_tbl = con.execute(sql).arrow() if exact else None
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            bad += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: COLS spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            bad += 1
            continue
        if exact:
            tmis = arrow_type_mismatches(spark_tbl, oracle_tbl)
            if tmis:
                print(f"FAIL {name}: ARROW-TYPE {'; '.join(tmis)}")
                bad += 1
                continue
        # align duck columns to spark order
        idx = [duck_cols.index(c) for c in spark_cols]
        duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]
        err, max_rel = compare(name, spark_df, duck_rows, spark_cols, exact)
        if err:
            print(f"FAIL {name}: {err}")
            bad += 1
        else:
            notes = []
            if max_rel:
                notes.append(f"max_rel_float_diff={max_rel:.2e}")
            dcols = decimal_cols(spark_df, spark_cols) + \
                decimal_cols(duck_rows, spark_cols)
            if dcols:
                notes.append(f"WARN decimal output cols={sorted(set(dcols))}")
            tail = f" ({'; '.join(notes)})" if notes else ""
            print(f"ok   {name}: {len(spark_df)} rows{tail}")
            ok += 1
    mode = "exact" if exact else "tolerant"
    print(f"== {ok} ok, {bad} fail ({mode} mode) ==")
    return 1 if bad else 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="DuckDB-oracle correctness gate (driver replica)")
    p.add_argument("verify_out_dir", help="output dir written by graft.Verify")
    p.add_argument("sf_dir", help="testdata scale-factor dir with *.parquet")
    p.add_argument("--exact", action="store_true",
                   help="driver-hash-faithful mode (pre-commit gate)")
    args = p.parse_args()
    sys.exit(main(args.verify_out_dir, args.sf_dir, exact=args.exact))
