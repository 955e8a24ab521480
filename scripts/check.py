#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate — STRICT.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (engine result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
sfDir parquet tables, and compares:
  1. DuckDB-level column TYPES (DESCRIBE) — catches BIGINT vs HUGEINT,
     DECIMAL scale drift, etc. that a value compare can miss but the
     driver's hash canonicalization does not.
  2. Exact positional values, column-name-sorted — NO float rounding, no
     decimal-to-string leniency beyond exact textual equality.
Round-1 lesson: a lenient local gate said 49/49 while the driver said
36/49; this gate must be at least as strict as the driver.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime, decimal, math
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, float):
        # exact: NaN normalized (NaN != NaN would poison the compare),
        # everything else compared bit-for-bit
        return "NaN" if math.isnan(v) else v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def described_types(con, query):
    """{column_name: duckdb_type} for a query."""
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: r[1] for r in rows}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        # sorted: the row compare is positional, and part-file names sort in
        # global sort order — an unsorted glob would concatenate multi-part
        # outputs in readdir order and spuriously fail correct results
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no engine output"); n_fail += 1; continue
        eng_q = f"SELECT * FROM read_parquet({files!r})"
        try:
            etypes = described_types(con, eng_q)
            otypes = described_types(con, f"({sql})")
            eng = con.execute(eng_q).fetchdf()
            ora = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ecols, ocols = sorted(eng.columns), sorted(ora.columns)
        if ecols != ocols:
            print(f"FAIL {name}: columns engine={ecols} oracle={ocols}")
            n_fail += 1; continue
        tbad = [(c, etypes.get(c), otypes.get(c)) for c in ecols
                if etypes.get(c) != otypes.get(c)]
        if tbad:
            print(f"FAIL {name}: type mismatch {tbad}")
            n_fail += 1; continue
        erows = [tuple(norm_cell(v) for v in r)
                 for r in eng[ecols].itertuples(index=False)]
        orows = [tuple(norm_cell(v) for v in r)
                 for r in ora[ocols].itertuples(index=False)]
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
