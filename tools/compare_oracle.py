#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>

For each query dir in <verify_out_dir>: load Spark's parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in
<sf_dir>), sort columns by name + rows by all values, and compare.
Reports both exact equality and a float-tolerant comparison so we can see
whether a mismatch is real or representation noise.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify lists so sorting works — but WARN: the driver's harness does
    # NOT do this; an array-typed output column crashes its pandas
    # sort_values (the round-6 l5 red row). RegistrySpec.scala pins the "no
    # top-level array outputs" invariant; this warning is the local tripwire.
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     (hasattr(v, "__len__") and not isinstance(v, str) and not isinstance(v, bytes)),
                     na_action="ignore").any():
            print(f"  WARN: column {c!r} holds arrays — the DRIVER harness "
                  "would crash on this (see RegistrySpec)", file=sys.stderr)
            # default=: numpy scalars (e.g. int64 list elements) are not
            # JSON serializable natively — unwrap via .item()
            df[c] = df[c].map(lambda v: json.dumps(list(v), default=lambda o: o.item() if hasattr(o, "item") else str(o)) if v is not None and not isinstance(v, (str, bytes, float, int)) else v)
    # sort by non-float columns first: if a float column led the sort key, a
    # sub-tolerance rounding difference between engines could reorder rows
    # and misalign the positional comparison
    keys = sorted(df.columns, key=lambda c: (df[c].dtype.kind == "f", c))
    return df.sort_values(by=keys, kind="mergesort").reset_index(drop=True)

def cells_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main(outdir, sfdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            got = canon(pq.read_table(f"{outdir}/{name}").to_pandas())
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        exact = got.equals(exp)
        mism = []
        if not exact:
            for c in got.columns:
                for i, (a, b) in enumerate(zip(got[c], exp[c])):
                    a = None if (isinstance(a, float) and pd.isna(a)) else a
                    b = None if (isinstance(b, float) and pd.isna(b)) else b
                    if not cells_equal(a, b):
                        mism.append((c, i, a, b))
                        if len(mism) >= 3: break
                if len(mism) >= 3: break
        if mism:
            print(f"FAIL {name}: {len(got)} rows, sample mismatches {mism}")
            n_fail += 1
        else:
            tag = "exact" if exact else "tolerant"
            print(f"PASS {name} ({len(got)} rows, {tag})")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))
