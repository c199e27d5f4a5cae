#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB against the
sfDir parquet tables, loads the corresponding Spark parquet dump, sorts
columns by name, and compares values exactly (with a near-miss report for
float drift). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is a single file; DataGen output is a Spark
        # directory of part files — accept both
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Types whose pandas/arrow representation differs from any Spark output
    # type: the driver's hash is representation-sensitive, so an oracle
    # column of one of these fails hash_match even when every value agrees
    # (r14: corpus_pareto_sources / text_vocab_growth shipped HUGEINT
    # n_tokens and failed the gate on type alone).
    BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            bad = [(c, t) for c, t in zip(rel.columns, map(str, rel.types))
                   if any(b in t.upper() for b in BANNED_TYPES)]
            if bad:
                print(f"FAIL {name}: banned oracle output type(s) {bad} — "
                      f"CAST to BIGINT/DOUBLE (driver hash is "
                      f"representation-sensitive)")
                n_fail += 1
                continue
            want = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        wt = [str(t) for t in want.dtypes]
        gt = [str(t) for t in got.dtypes]
        if wt != gt:
            # FAIL, not WARN: the driver hashes representations, so a dtype
            # mismatch is a gate failure even when values agree (r14 lesson)
            print(f"FAIL {name}: dtypes want={wt} got={gt}")
            n_fail += 1
            continue
        mismatch = None
        for col in want.columns:
            wv, gv = want[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if a is None and b is None:
                    continue
                eq = a == b
                try:
                    if isinstance(a, float) and isinstance(b, float):
                        eq = (a == b) or (math.isnan(a) and math.isnan(b))
                        # the driver hashes canonical REPRESENTATIONS, not
                        # values: -0.0 == +0.0 here but hash-differs there
                        # (r10's emb_covariance shipped green locally and
                        # failed the driver gate on exactly this) — mirror
                        # the stricter semantics
                        if eq and a == 0.0 and b == 0.0 and \
                                math.copysign(1.0, a) != math.copysign(1.0, b):
                            eq = False
                except Exception:
                    pass
                try:
                    import pandas as pd
                    if pd.isna(a) and pd.isna(b):
                        eq = True
                except Exception:
                    pass
                if not eq:
                    mismatch = (col, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            col, i, a, b = mismatch
            print(f"FAIL {name}: first diff col={col} row={i} want={a!r} got={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
