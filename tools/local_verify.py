#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only —
the engine itself is pure Scala/Spark; this mirrors how the driver
compares graft.Verify output against DuckDB on the same parquet).

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [name ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, only=None) -> int:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        # fresh connection per query: one shared connection accumulates
        # temp/materialized-CTE memory across 100+ oracles at sf0.1 and
        # late queries die with allocator OOM (observed 2026-08-13).
        # A temp_directory lets the heavy oracles SPILL — an in-memory
        # connection otherwise hard-fails at memory_limit. try/finally
        # so close() runs on EVERY path — the fix was motivated by
        # allocator pressure, so the lifetime must be explicit, not
        # left to refcounting.
        con = duckdb.connect()
        try:
            con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
            con.execute("PRAGMA memory_limit='90GB'")
            # cap threads: at 32 threads the hard_negatives/triplet-class
            # oracles (duckCos over 350k candidate pairs) buffer wide
            # list intermediates PER THREAD and blow past memory_limit
            # before spilling (observed 2026-08-16: OOM at 32 threads,
            # 59 s clean at 8). 16 keeps the light oracles fast — and is
            # itself measured clean on the heavy class since the
            # duckCosPre rewrite: hard_negatives + triplet_mining at
            # sf0.1, threads=16, ran green in 41.7 s wall / 123 GB free
            # host (2026-08-16, round 14).
            con.execute("PRAGMA threads=16")
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
            try:
                got = con.execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
                want = con.execute(sql).df()
            except Exception as e:
                print(f"FAIL {name}: {type(e).__name__}: {e}")
                failures += 1
                continue
        finally:
            con.close()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        # exact value compare after string normalization (the driver
        # hashes values, so this must be exact, not approximate)
        gs = g.astype(str).reset_index(drop=True)
        ws = w.astype(str).reset_index(drop=True)
        if not gs.equals(ws):
            neq = (gs != ws).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  spark: {gs.loc[i].to_dict()}")
                print(f"  duck : {ws.loc[i].to_dict()}")
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
