#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads every <verifyOutDir>/<name>/ parquet result, runs the matching SQL
from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet registered by
stem), sorts columns by name + rows by all columns, and diffs values.

Dtype fidelity (r13 lesson): the driver's hash normalizes integer WIDTH
(int32 vs int64) and timestamp PRECISION (ns vs us) but does NOT coerce
across dtype classes — an int Spark column vs a float oracle column hash-
mismatches even when every value compares equal under pandas `==` (q255:
DuckDB sum(INT) is HUGEINT, pandas materializes HUGEINT as float64, so
862 hashed != 862.0). So after the value diff we compare dtype CLASSES:
class mismatch (int vs float, numeric vs string, ...) is a FAIL even when
values match; same-class width/precision drift is a WARN (driver-
normalized, see ARCHITECTURE "Oracle dtype fidelity").
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def dtype_class(dt) -> str:
    """Collapse a pandas dtype to the class the driver's hash distinguishes."""
    k = getattr(dt, "kind", "O")
    if k in "iu": return "int"
    if k == "f":  return "float"
    if k == "b":  return "bool"
    if k == "M":  return "datetime"
    if k == "m":  return "timedelta"
    return "object"  # strings, arrays, structs, decimals-as-object

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            # targeted Verify runs dump a query subset; CHECK_PRESENT_ONLY=1
            # compares just the dumped ones instead of failing the rest
            if os.environ.get("CHECK_PRESENT_ONLY") == "1":
                continue
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in
                                   glob.glob(res_dir + "/*.parquet")] or
                                  [pd.DataFrame()]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                diffs.append(f"col {c} row {i}: {a[i]!r} != {b[i]!r} ({(~eq).sum()} diffs)")
        warns = []
        for c in got.columns:
            ga, wa = got[c].dtype, want[c].dtype
            if ga == wa:
                continue
            gc, wc = dtype_class(ga), dtype_class(wa)
            if gc != wc:
                diffs.append(f"col {c} dtype-class {gc}({ga}) != {wc}({wa})"
                             " [driver hash does NOT coerce across classes]")
            else:
                warns.append(f"col {c} {ga} vs {wa} (width/precision only,"
                             " driver-normalized)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs)); n_fail += 1
        else:
            w = ("; WARN " + "; ".join(warns)) if warns else ""
            print(f"PASS {name} ({len(got)} rows){w}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
