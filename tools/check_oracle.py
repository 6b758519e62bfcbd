#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
Reads each <name>.parquet under outDir (Spark results) and runs the
matching oracle_sql.json entry in DuckDB over the sf tables; compares
row counts, sorted column names, and value multisets (floats rounded).
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return str(v)

fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "no spark output"))
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
    gcols = [d[0] for d in con.description]
    try:
        exp = con.execute(sql).fetchall()
        ecols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    if sorted(gcols) != sorted(ecols):
        fails.append((name, f"cols {sorted(gcols)} != {sorted(ecols)}"))
        continue
    gidx = [gcols.index(c) for c in sorted(gcols)]
    eidx = [ecols.index(c) for c in sorted(ecols)]
    gset = sorted(tuple(norm(r[i]) for i in gidx) for r in got)
    eset = sorted(tuple(norm(r[i]) for i in eidx) for r in exp)
    if len(gset) != len(eset):
        fails.append((name, f"rowcount {len(gset)} != {len(eset)}"))
    elif gset != eset:
        diff = next(i for i, (a, b) in enumerate(zip(gset, eset)) if a != b)
        fails.append((name, f"value mismatch at sorted row {diff}: "
                            f"{gset[diff]} != {eset[diff]}"))
    else:
        print(f"OK   {name} ({len(gset)} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
