#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir> [query ...]

Loads each <verify_out_dir>/<name>/ (spark parquet result), runs the
matching oracle SQL from oracle_sql.json against the sf parquet tables,
sorts columns by name and rows by value, and compares cell-by-cell.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v

def fetch_sorted(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x if not isinstance(x, tuple) else str(x)) for x in r))
    return [cols[i] for i in order], out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    for name in names:
        if only and name not in only: continue
        spark_glob = f"{outdir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            results[name] = "EMPTY-OUTPUT-DIR"; continue
        try:
            scols, srows = fetch_sorted(con, f"SELECT * FROM read_parquet('{spark_glob}')")
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"; continue
        if name not in oracle:
            results[name] = f"no-oracle ({len(srows)} rows)"; continue
        try:
            ocols, orows = fetch_sorted(con, oracle[name])
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:200]}"; continue
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            results[name] = f"COLS-MISMATCH spark={scols} oracle={ocols}"; continue
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(srows)} oracle={len(orows)}"; continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b); break
        if bad:
            results[name] = f"VALUE-MISMATCH row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}"
        else:
            results[name] = f"OK ({len(srows)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name in sorted(results):
        v = results[name]
        flag = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("no-oracle") else "FAIL")
        print(f"[{flag}] {name}: {v}")
    print(f"\n{npass}/{len([v for v in results.values() if not v.startswith('no-oracle')])} oracle-checked queries pass")

if __name__ == "__main__":
    main()
