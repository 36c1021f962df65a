#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
parquet tables in <sfdir>, loads the Spark result parquet from
<outdir>/<name>/, sorts both by all columns (columns ordered by name), and
compares cell-by-cell.

Usage: python3 tools/compare.py <sfdir> <outdir>
"""
import json
import sys
import glob

import duckdb


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).df()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            w, g = norm(want), norm(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            diff = None
            for c in w.columns:
                wc, gc = w[c], g[c]
                neq = ~((wc == gc) | (wc.isna() & gc.isna()))
                if neq.any():
                    i = neq.idxmax()
                    diff = (c, i, wc[i], gc[i])
                    break
            if diff:
                c, i, wv, gv = diff
                print(f"FAIL {name}: col {c} row {i}: spark={gv!r} oracle={wv!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(w)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
