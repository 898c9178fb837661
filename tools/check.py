#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queries] [--dump-canon]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sfDir parquet tables registered as views, loads the matching Spark
parquet result, and compares: row count, column names, and a hash of
the values with columns sorted by name and rows sorted.

--dump-canon additionally writes <verifyOutDir>/canon/<name>.spark.csv
and <name>.oracle.csv — the EXACT canonical text the hash is computed
over (columns sorted by name, rows sorted, floats at %.10g) — so any
external gate that disagrees with this one can be diffed line-by-line
instead of reverse-engineered from a bare hash_match flag.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        try:
            return str([norm_cell(x) for x in v.tolist()])
        except AttributeError:
            return str([norm_cell(x) for x in v])
    return str(v)


def table_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main():
    # optional 3rd arg: comma-separated query names a FILTERED local
    # Verify run dumped — only those are checked. Without it, every
    # oracle key must have a result dir (a query that crashed during a
    # full Verify shows up as ERROR, never as a silent skip).
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_canon = "--dump-canon" in sys.argv
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2].split(",")) if len(args) > 2 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        # a typo'd/stale filter name must not read as green: error out
        # instead of silently checking nothing
        unknown = sorted(only - set(oracle))
        if unknown:
            print(f"ERROR: filter names not in oracle_sql.json: {unknown}")
            sys.exit(2)
        if not only:
            print("ERROR: empty query filter — nothing would be checked")
            sys.exit(2)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue  # filtered local run — only check the named queries
        try:
            want = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            if dump_canon:
                import os
                os.makedirs(f"{out_dir}/canon", exist_ok=True)
                for tag, df in (("oracle", want), ("spark", got)):
                    with open(f"{out_dir}/canon/{name}.{tag}.csv", "w") as f:
                        f.write(",".join(df.columns) + "\n")
                        for row in df.itertuples(index=False):
                            f.write("|".join(norm_cell(v) for v in row) + "\n")
            problems = []
            if list(want.columns) != list(got.columns):
                problems.append(f"cols want={list(want.columns)} got={list(got.columns)}")
            if len(want) != len(got):
                problems.append(f"rows want={len(want)} got={len(got)}")
            if not problems and table_hash(want) != table_hash(got):
                diff_cols = []
                for c in want.columns:
                    if not (want[c].map(norm_cell) == got[c].map(norm_cell)).all():
                        diff_cols.append(c)
                problems.append(f"hash mismatch in cols {diff_cols}")
                for c in diff_cols[:2]:
                    mask = want[c].map(norm_cell) != got[c].map(norm_cell)
                    print(f"    {name}.{c} first diffs:")
                    print("      want:", want[c][mask].head(3).tolist())
                    print("      got: ", got[c][mask].head(3).tolist())
            if problems:
                n_fail += 1
                print(f"FAIL {name}: {'; '.join(problems)}")
            else:
                n_pass += 1
                print(f"PASS {name} ({len(want)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if n_pass + n_fail == 0:
        print("ERROR: zero queries checked — refusing to report green")
        sys.exit(2)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
