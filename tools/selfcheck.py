#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the paired oracle SQL in DuckDB over the same fixture tables, sort
columns by name, sort rows, and compare cell-by-cell (exact, after
normalizing timestamps to microseconds and decimals to strings).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    import datetime, decimal, math
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        s = format(v.normalize(), "f")
        return s.rstrip("0").rstrip(".") if "." in s else s
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def main(sf_dir, out_dir, only=None):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = sorted(tuple(norm(v) for v in r) for r in
                              got.select(", ".join(f'"{c}"' for c in got_cols)).fetchall())
            exp = con.sql(oracle[name])
            exp_cols = sorted(exp.columns)
            exp_rows = sorted(tuple(norm(v) for v in r) for r in
                              exp.select(", ".join(f'"{c}"' for c in exp_cols)).fetchall())
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        got_types = dict(zip(got.columns, [str(t) for t in got.types]))
        exp_types = dict(zip(exp.columns, [str(t) for t in exp.types]))
        type_diff = {c: (got_types[c], exp_types[c]) for c in got_types
                     if c in exp_types and got_types[c] != exp_types[c]}
        if type_diff:
            print(f"WARN {name}: type mismatch {type_diff}")
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            n_fail += 1
            diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows, "
                  f"first diffs: {diff[:2]}"
                  + (f" extra_got={got_rows[len(exp_rows):][:1]}" if len(got_rows) > len(exp_rows) else "")
                  + (f" extra_exp={exp_rows[len(got_rows):][:1]}" if len(exp_rows) > len(got_rows) else ""))
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
