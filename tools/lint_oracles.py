#!/usr/bin/env python3
"""Oracle type-convention lint — the static half of the driver's
type-sensitive hash compare.

tools/compare.py checks VALUES through Python, where DuckDB's HUGEINT
and Spark's int64 both surface as `int` and compare equal — so a
convention miss like an uncast integer `sum()` (DuckDB widens to
HUGEINT -> Arrow decimal128) passes locally and only trips the
driver's type-sensitive hash. This lint catches that class without
executing anything: DESCRIBE each oracle's result schema in DuckDB,
read each Spark result parquet's schema the same way, normalize both
to type families, and fail on any mismatch.

Usage: python3 tools/lint_oracles.py <sfdir> <verify_out_dir> [query ...]
Exit 1 on any mismatch.
"""
import sys, glob, json, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]


def norm(t: str) -> str:
    """DuckDB type -> comparison family. Integer WIDTH is not hashed
    (int32 vs int64 compare equal through Arrow ints), but int vs
    decimal/float/string/bool is — so plain ints collapse to one family
    while HUGEINT/DECIMAL stay distinct (the r14 miss)."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return "list<" + norm(t[:-2]) + ">"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return t.lower()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UBIGINT", "UHUGEINT") or t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "VARCHAR":
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t.lower()


def described(con, sql):
    rows = con.sql(f"DESCRIBE {sql}").fetchall()
    return {r[0].lower(): norm(r[1]) for r in rows}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bad = []
    checked = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_glob = f"{outdir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            continue
        checked += 1
        try:
            o = described(con, f"({oracle[name]})")
        except Exception as e:
            bad.append((name, f"oracle DESCRIBE failed: {str(e)[:200]}"))
            continue
        s = described(con, f"(SELECT * FROM read_parquet('{spark_glob}'))")
        if sorted(o) != sorted(s):
            bad.append((name, f"column sets differ: oracle={sorted(o)} spark={sorted(s)}"))
            continue
        for c in sorted(o):
            if o[c] != s[c]:
                hint = (" — wrap the oracle column in CAST(... AS BIGINT); "
                        "DuckDB widens integer sum() to HUGEINT"
                        if o[c] == "decimal" and s[c] == "int" else "")
                bad.append((name, f"column '{c}': oracle={o[c]} spark={s[c]}{hint}"))
    for name, msg in bad:
        print(f"[TYPE-LINT-FAIL] {name}: {msg}")
    print(f"\n{checked - len(set(n for n, _ in bad))}/{checked} oracle schemas type-clean")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
