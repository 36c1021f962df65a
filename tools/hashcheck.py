#!/usr/bin/env python3
"""Dtype-strict twin of compare.py (dev tool): catches representation-level
mismatches the cell compare tolerates (float64 vs int64 from DuckDB
HUGEINT/DOUBLE outputs), which break the driver's hash even when every cell
compares equal.

Usage: python3 tools/hashcheck.py <sfdir> <outdir> [query,query,...]
"""
import hashlib
import json
import sys
import glob

import duckdb


def norm(df):
    df = df[sorted(df.columns)]
    # integer WIDTH differences are tolerated by the driver's hash
    # (e.g. Spark size() INT vs DuckDB len() BIGINT) — only float-vs-int
    # representation breaks it, so widen all ints before comparing
    for c in df.columns:
        if str(df[c].dtype) in ("int8", "int16", "int32", "uint32"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def h(df):
    return hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest()


def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = norm(con.sql(sql).df())
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = norm(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
            dt_w = {c: str(want[c].dtype) for c in want.columns}
            dt_g = {c: str(got[c].dtype) for c in got.columns}
            if dt_w != dt_g:
                bad = {c: (dt_g.get(c), dt_w.get(c))
                       for c in set(dt_w) | set(dt_g) if dt_w.get(c) != dt_g.get(c)}
                print(f"FAIL {name}: dtypes spark!=oracle {bad}")
                n_fail += 1
            elif h(want) != h(got):
                print(f"FAIL {name}: str-hash mismatch (dtypes equal)")
                n_fail += 1
            else:
                print(f"PASS {name} (hash {h(want)[:8]}, {len(want)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
