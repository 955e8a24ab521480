#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (engine result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
sfDir parquet tables, sorts columns by name, and compares row-by-row.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    import datetime, decimal
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, float):
        import math
        return None if math.isnan(v) else round(v, 9)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no engine output"); n_fail += 1; continue
        try:
            eng = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            ora = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ecols, ocols = sorted(eng.columns), sorted(ora.columns)
        if ecols != ocols:
            print(f"FAIL {name}: columns engine={ecols} oracle={ocols}")
            n_fail += 1; continue
        erows = [tuple(norm_cell(v) for v in r) for r in eng[ecols].itertuples(index=False)]
        orows = [tuple(norm_cell(v) for v in r) for r in ora[ocols].itertuples(index=False)]
        if len(erows) != len(orows):
            print(f"FAIL {name}: rows engine={len(erows)} oracle={len(orows)}")
            n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(erows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; first at {i}:")
            print(f"  cols:   {ecols}")
            print(f"  engine: {a}")
            print(f"  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
