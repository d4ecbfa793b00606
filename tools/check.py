#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_outdir>

Runs each oracle_sql.json query in DuckDB against the sfdir parquet tables,
reads the corresponding Spark parquet output, sorts columns by name, and
compares exact values (floats bit-exact, which is what a hash compare sees).
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return v  # keep exact; nan handled below
    return v


def compare(name, ours, oracle):
    if ours.num_rows != oracle.num_rows:
        return f"rows: ours={ours.num_rows} oracle={oracle.num_rows}"
    ocols = sorted(ours.column_names)
    rcols = sorted(oracle.column_names)
    if ocols != rcols:
        return f"cols: ours={ocols} oracle={rcols}"
    ours = ours.select(ocols)
    oracle = oracle.select(ocols)
    for c in ocols:
        a = ours.column(c).to_pylist()
        b = oracle.column(c).to_pylist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y and not (x is None and y is None):
                if isinstance(x, float) and isinstance(y, float):
                    if x != x and y != y:
                        continue
                    return (f"col {c} row {i}: ours={x!r} oracle={y!r} "
                            f"(diff={abs(x - y) if x is not None and y is not None else 'NA'})")
                return f"col {c} row {i}: ours={x!r} oracle={y!r}"
    return None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle_sql = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        try:
            oracle = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            nfail += 1
            continue
        try:
            ours = pq.read_table(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output: {e}")
            nfail += 1
            continue
        # cast oracle to ours' schema where types differ only in width
        err = compare(name, ours, oracle)
        if err:
            print(f"FAIL {name}: {err}")
            # show schemas to debug type mismatches
            print(f"  ours schema:   {[(f.name, str(f.type)) for f in ours.schema]}")
            print(f"  oracle schema: {[(f.name, str(f.type)) for f in oracle.schema]}")
            nfail += 1
        else:
            print(f"PASS {name} ({ours.num_rows} rows)")
            npass += 1
    print(f"\n{npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
