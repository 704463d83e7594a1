#!/usr/bin/env python3
"""Oracle output-type gate.

Usage: python3 tools/type_gate.py <sfDir> <oracle_sql.json>

DESCRIBEs every oracle SQL in DuckDB over the parquet tables in <sfDir>
and fails if any OUTPUT column lands a type the driver's canonicalizer
and the local fetchall() replica are known to treat differently:
HUGEINT/UHUGEINT (DuckDB SUM(int)) and DECIMAL. Round 7 lost 4 board
rows to exactly this — queries that passed rows+schema+hash locally but
hash-failed on the driver. The convention (enforced here) is: landed
integer columns are BIGINT, landed fractional columns are DOUBLE; keep
HUGEINT/DECIMAL arithmetic internal and CAST at the final SELECT.
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append((name, "*", f"DESCRIBE failed: {e}"))
            continue
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BAD):
                bad.append((name, col, typ))
    if bad:
        for name, col, typ in bad:
            print(f"TYPE-DIRTY {name}.{col}: {typ}")
        sys.exit(1)
    print(f"type gate ok: {len(oracle)} oracles, no HUGEINT/DECIMAL output columns")


if __name__ == "__main__":
    main()
