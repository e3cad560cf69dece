#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name and rows by value, and hash-compares.
NOT part of the shipped library — a dev harness only.
"""
import sys, os, json, hashlib
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

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
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        gcols = [c[0] for c in con.description]
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        exp = con.execute(oracles[name]).fetchall()
        ecols = [c[0] for c in con.description]
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
