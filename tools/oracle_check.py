#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Loads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over the
parquet tables in <sfDir>, and compares rows / schema (column names) /
value hash against the Spark result parquet the Verify main dumped.
Values are hashed column-name-sorted, rows sorted, floats canonicalized
to 10 significant digits (%.10g) to absorb printing noise the driver
also absorbs.
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.10g}"
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    h = hashlib.md5("\n".join(out).encode()).hexdigest()
    return h


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)} — "
                 f"a typo here would silently skip the check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"{name}: MISSING spark result")
            bad += 1
            continue
        srel = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})")
        scols = [d[0] for d in srel.description]
        srows = srel.fetchall()
        try:
            orel = con.execute(sql)
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and canon(srows, scols) == canon(orows, ocols)
        status = "ok" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
              f"schema={schema_ok} hash={hash_ok}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
