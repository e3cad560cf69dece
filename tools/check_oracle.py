#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name and rows by value, and hash-compares.
NOT part of the shipped library — a dev harness only.

DRIVER FIDELITY: both sides are pulled through pandas (duckdb
`.df()`), NOT `.fetchall()`. This matters: DuckDB's `sum(<integer>)`
returns HUGEINT, and duckdb's pandas conversion renders HUGEINT as
float64 — so an oracle `sum(n)` that is value-identical to Spark's
BIGINT hashes as "5.0" vs "5" under a pandas-based compare. Round 4-5's
six persistent driver-reds (q90 q96 q114 q115 q119 q121) were exactly
the six oracles with uncast integer sums; `.fetchall()` (Python ints)
masked it locally. The permanent fix is `CAST(sum(..) AS BIGINT)` in
every oracle, but the mirror must use the pandas path so such drift is
red HERE first.
"""
import sys, os, json, hashlib
import duckdb
import numpy as np

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if np.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.bool_,)):
        return str(bool(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    return str(v)

def df_rows(df):
    # mimic a pandas-side compare: values as the pandas dtypes deliver
    # them (float64 for DuckDB HUGEINT, numpy scalars, NaN for null)
    cols = list(df.columns)
    rows = [tuple(None if (isinstance(x, float) and np.isnan(x)) or x is None
                  else x for x in rec)
            for rec in df.itertuples(index=False, name=None)]
    return rows, cols

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in data:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    for name in dirs:
        gdf = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        got, gcols = df_rows(gdf)
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        edf = con.execute(oracles[name]).df()
        exp, ecols = df_rows(edf)
        schema_ok = sorted(gcols) == sorted(ecols)
        gh, eh = table_hash(got, gcols), table_hash(exp, ecols)
        ok = schema_ok and gh == eh
        n_ok += ok; n_bad += (not ok)
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} rows={len(got)}/{len(exp)} "
              f"schema={'ok' if schema_ok else f'{sorted(gcols)} vs {sorted(ecols)}'}"
              + ("" if ok or not schema_ok else " hash-mismatch"))
        if not ok and schema_ok and len(got) == len(exp):
            order = sorted(range(len(gcols)), key=lambda i: gcols[i])
            gs = sorted(tuple(norm(r[i]) for i in order) for r in got)
            eo = sorted(range(len(ecols)), key=lambda i: ecols[i])
            es = sorted(tuple(norm(r[i]) for i in eo) for r in exp)
            diffs = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            for a, b in diffs:
                print(f"    got {a}\n    exp {b}")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
