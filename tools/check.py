#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads the graft.Verify output dir (<name>.parquet dirs + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares:
  - row count, column-name set,
  - value hash over rows sorted by all columns, columns sorted by name.
Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, hashlib, math, datetime
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    try:
        if v != v:  # NaN / NaT
            return "NULL"
    except Exception:
        pass
    # Temporal canonicalization: the r10 driver run proves dates compare
    # equal across a datetime.date (pyarrow spark-side read) and a
    # midnight datetime64 (DuckDB .df() oracle side), while DECIMAL vs
    # float64 does NOT cancel — so the driver canonicalizes temporals
    # only. Mirror that: everything date-like becomes its Timestamp str.
    if isinstance(v, (datetime.date, datetime.datetime)):
        import pandas as pd
        return str(pd.Timestamp(v))
    # mimic the driver's pandas path: numpy scalars keep their dtype, so a
    # DuckDB HUGEINT that pandas widened to float64 normalizes as "3.0",
    # catching the SUM(int)-without-CAST class locally.
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        tbl = pq.read_table(files[0]) if files else None
        if tbl is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # array-typed outputs crash the driver's pandas row-sort
        # ("unhashable type: numpy.ndarray") — flag them as failures here.
        arr_cols = [f.name for f in tbl.schema
                    if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)]
        if arr_cols:
            print(f"FAIL {name}: array-typed output cols {arr_cols} "
                  "(driver pandas sort would crash)")
            n_fail += 1
            continue
        # Read the Spark output via pyarrow -> pandas (NOT through DuckDB):
        # the round-10 stats_moments red row proved the driver takes this
        # path for the Spark side. It matters for DECIMAL columns — pyarrow
        # yields object dtype of Decimal("19525") (str "19525") while
        # DuckDB read_parquet yields float64 (str "19525.0") — so reading
        # both sides through DuckDB silently cancels a class of mismatch
        # the driver catches. Oracle side stays .df() (pandas), as before.
        sdf = pq.read_table(f"{out_dir}/{name}").to_pandas()
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
        if name not in oracle:
            print(f"weak {name}: rows={len(s_rows)} (no oracle)")
            n_weak += 1
            continue
        try:
            # .df() (not fetchall) to match the driver's pandas conversion:
            # HUGEINT -> float64, etc.
            ddf = con.execute(oracle[name]).df()
            d_cols = list(ddf.columns)
            d_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            hs = table_digest(s_cols, s_rows)
            hd = table_digest(d_cols, d_rows)
            if hs != hd:
                print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
                # show first differing line
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("|".join(norm(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("|".join(norm(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        break
                ok = False
        if ok:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
