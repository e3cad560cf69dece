#!/usr/bin/env python3
"""Round-start environment probe: detect driver-side testdata drift.

Usage: python3 tools/probe_env.py [testdata_root]   (default /root/testdata)

Fingerprints every table's parquet footer (column names + physical/
logical types) and row count at each scale factor, compares to the
committed snapshot tools/testdata_fingerprint.json, and exits non-zero
on ANY drift — run this BEFORE building each round. Regenerated data
with a changed physical type (e.g. events.ts TIMESTAMP(NANOS) →
timestamp[us], which silently corrupted 20 queries in round 6) is
caught here in seconds instead of at gate time.

With --update, rewrites the snapshot to match the current files
(do this after confirming loaders handle the new shapes).
NOT part of the shipped library — a dev harness only.
"""
import sys, os, json

import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SFS = ["sf0.001", "sf0.01", "sf0.1"]
SNAPSHOT = os.path.join(os.path.dirname(__file__), "testdata_fingerprint.json")


def fingerprint(root):
    out = {}
    for sf in SFS:
        d = os.path.join(root, sf)
        if not os.path.isdir(d):
            continue
        for t in TABLES:
            path = os.path.join(d, f"{t}.parquet")
            f = pq.ParquetFile(path)
            arrow = f.schema_arrow
            out[f"{sf}/{t}"] = {
                "columns": [f"{name}:{arrow.field(name).type}"
                            for name in arrow.names],
                "rows": f.metadata.num_rows,
            }
    return out


def main(argv):
    update = "--update" in argv
    args = [a for a in argv if not a.startswith("--")]
    root = args[0] if args else "/root/testdata"
    cur = fingerprint(root)
    if update or not os.path.exists(SNAPSHOT):
        json.dump(cur, open(SNAPSHOT, "w"), indent=1, sort_keys=True)
        print(f"snapshot written: {SNAPSHOT} ({len(cur)} tables)")
        return 0
    prev = json.load(open(SNAPSHOT))
    drift = []
    for k in sorted(set(prev) | set(cur)):
        if k not in cur:
            drift.append(f"MISSING  {k}")
        elif k not in prev:
            drift.append(f"NEW      {k}: {cur[k]['columns']}")
        elif prev[k] != cur[k]:
            if prev[k]["columns"] != cur[k]["columns"]:
                drift.append(f"SCHEMA   {k}:\n  was {prev[k]['columns']}"
                             f"\n  now {cur[k]['columns']}")
            else:
                drift.append(f"ROWCOUNT {k}: {prev[k]['rows']} -> "
                             f"{cur[k]['rows']}")
    if drift:
        print("TESTDATA DRIFT DETECTED — verify loaders, then --update:")
        for d in drift:
            print(" ", d)
        return 1
    print(f"testdata matches snapshot ({len(cur)} tables, no drift)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
