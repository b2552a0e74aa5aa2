#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> [sfDir]

Reads <outDir>/<name>/ parquet dumps written by graft.Verify, runs each
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sf tables,
and compares (columns sorted by name, rows sorted, values stringified).
Exits non-zero if any query mismatches.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

out_dir = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

import pyarrow as pa

def type_cat(t):
    """Coarse category matching the driver's hash fidelity: all ints hash
    alike, but int vs float/decimal diverges (HUGEINT→float64 '99111.0'
    vs int64 '99111' was CORRECTNESS_r01's only red row)."""
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t): return "float"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_timestamp(t): return "timestamp"
    if pa.types.is_date(t): return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_cat(t.value_type)}>"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    return str(t)

def type_mismatches(s_schema, d_schema):
    s_types = {f.name: type_cat(f.type) for f in s_schema}
    d_types = {f.name: type_cat(f.type) for f in d_schema}
    return [(c, s_types[c], d_types[c])
            for c in sorted(set(s_types) & set(d_types))
            if s_types[c] != d_types[c]]

def canon(cols, rows):
    """columns sorted by name; rows as sorted tuples of repr strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(cols), sorted(out)

fail = 0
names = sorted(oracle.keys())
for name in names:
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output at {spark_path}")
        fail += 1
        continue
    files = glob.glob(os.path.join(spark_path, "*.parquet"))
    tb = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(spark_path)
    # The driver's pandas harness dies sorting/hashing array cells
    # (CORRECTNESS_r05 qp_hash_embed: "unhashable type: numpy.ndarray").
    # Reject list-typed output here so the local gate matches the driver.
    arr_cols = [f.name for f in tb.schema
                if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                or pa.types.is_fixed_size_list(f.type)]
    if arr_cols:
        print(f"FAIL {name}: array-typed output cols {arr_cols} — the "
              f"driver gate cannot hash arrays; scalarize (explode or "
              f"array_join) on both sides")
        fail += 1
        continue
    s_cols = list(tb.column_names)
    s_rows = [tuple(d[c] for c in s_cols) for d in tb.to_pylist()]
    try:
        res = con.sql(oracle[name])
        d_tb = res.arrow()
        d_cols = list(d_tb.column_names)
        d_rows = [tuple(d[c] for c in d_cols) for d in d_tb.to_pylist()]
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    tmm = type_mismatches(tb.schema, d_tb.schema)
    if tmm:
        for c, st, dt in tmm:
            print(f"FAIL {name}: type mismatch col {c}: spark={st} duck={dt}"
                  f" — driver hash will diverge (cast the oracle)")
        fail += 1
        continue
    sc, sr = canon(s_cols, s_rows)
    dc, dr = canon(d_cols, d_rows)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}")
        fail += 1
    elif sr != dr:
        print(f"FAIL {name}: {len(sr)} spark rows vs {len(dr)} duck rows")
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        for a, b in diffs:
            print(f"   spark={a}\n   duck ={b}")
        if len(sr) != len(dr):
            only_s = set(sr) - set(dr)
            only_d = set(dr) - set(sr)
            for x in list(only_s)[:2]: print(f"   only-spark={x}")
            for x in list(only_d)[:2]: print(f"   only-duck ={x}")
        fail += 1
    else:
        print(f"PASS {name} ({len(sr)} rows)")

# queries without an oracle: rows-only check
import re
all_dirs = [d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))]
for name in sorted(set(all_dirs) - set(names)):
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    n = sum(pq.read_metadata(f).num_rows for f in files)
    print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
    if n == 0: fail += 1

print(f"\n{len(names)} oracle-checked, {fail} failures")
sys.exit(1 if fail else 0)
