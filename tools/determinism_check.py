#!/usr/bin/env python3
"""Compare two graft.Verify output dirs cell-by-cell IN FILE ORDER.

Catches partition-count-dependent or run-to-run nondeterminism that the
oracle compare (which sorts rows) would hide. Usage:
    python3 tools/determinism_check.py /tmp/vd1 /tmp/vd2
"""
import sys, os, glob
import duckdb

def main(d1, d2):
    con = duckdb.connect()
    names = sorted(x for x in os.listdir(d1)
                   if os.path.isdir(os.path.join(d1, x)))
    n_fail = 0
    for name in names:
        try:
            r1 = con.sql(f"SELECT * FROM '{d1}/{name}/*.parquet'").fetchall()
            r2 = con.sql(f"SELECT * FROM '{d2}/{name}/*.parquet'").fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:120]}")
            n_fail += 1
            continue
        if r1 == r2:
            print(f"PASS {name} ({len(r1)} rows, identical order+values)")
        else:
            n_fail += 1
            diffs = [i for i, (a, b) in enumerate(zip(r1, r2)) if a != b][:3]
            print(f"FAIL {name}: rows {len(r1)} vs {len(r2)}, first diff idx {diffs}")
    print(f"== determinism: {len(names)-n_fail} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
