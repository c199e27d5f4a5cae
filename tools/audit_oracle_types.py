#!/usr/bin/env python3
"""DuckDB type audit over every oracle SQL — the oracle-side mirror of the
Spark-side top-level DECIMAL ban (ContractSpec).

The driver's correctness hash is representation-sensitive: an oracle column
typed HUGEINT/UHUGEINT/DECIMAL hash-differs from Spark's BIGINT/DOUBLE even
when every value agrees (r14: corpus_pareto_sources / text_vocab_growth
failed the gate on exactly this — SUM(BIGINT) is HUGEINT in DuckDB).

This tool only PREPAREs each query (DESCRIBE) — it never fetches rows, so it
runs in seconds on the smallest sf dir. Usage:
    SPARK_GRAFT_SQL_ONLY=1 java -cp ... graft.Verify <sfDir> <tmpDir>
    tools/audit_oracle_types.py <sfDir> <tmpDir>/oracle_sql.json
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(oracle_json))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc
               if any(b in str(t).upper() for b in BANNED)]
        if bad:
            print(f"FAIL {name}: banned top-level type(s) {bad} — CAST to "
                  f"BIGINT/DOUBLE")
            n_bad += 1
    print(f"\n{len(oracle) - n_bad} clean, {n_bad} banned-type, "
          f"{len(oracle)} oracled")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
