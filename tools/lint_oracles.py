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

Two snapshot modes make the lint runnable WITHOUT a fresh Verify dump,
so `sbt test` (OracleTypeLintSpec) can gate oracle edits automatically:

  --emit-snapshot:   python3 tools/lint_oracles.py <sfdir> <verify_out_dir> --emit-snapshot
      After a green lint run, write tools/oracle_schema_snapshot.json —
      the Spark result type families per query, straight from the
      Verify parquet dump. Commit it.
  --check-snapshot:  python3 tools/lint_oracles.py <sfdir> --check-snapshot <oracle_sql.json>
      DESCRIBE every oracle in DuckDB (no execution, no Spark) and
      compare its type families against the snapshot. A new/edited
      oracle whose families drift from the snapshot — the classic
      uncast integer sum() widening to HUGEINT — fails; a query absent
      from the snapshot fails with a regenerate hint.
"""
import sys, glob, json, os
import duckdb

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "oracle_schema_snapshot.json")

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


def connect(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    return con


def check_snapshot(sfdir, oracle_json):
    """Compare every oracle's DESCRIBE families against the committed
    snapshot of Spark result families. Pure schema work: nothing runs,
    so this is fast enough to sit inside `sbt test`."""
    con = connect(sfdir)
    oracle = json.load(open(oracle_json))
    if not os.path.exists(SNAPSHOT):
        print(f"[TYPE-LINT-FAIL] snapshot missing: {SNAPSHOT} — run the full lint "
              "against a Verify dump with --emit-snapshot and commit the file")
        sys.exit(1)
    snap = json.load(open(SNAPSHOT))
    bad = []
    for name in sorted(oracle):
        if name not in snap:
            bad.append((name, "not in oracle_schema_snapshot.json — run Verify, then "
                        "lint_oracles.py <sfdir> <voutdir> --emit-snapshot and commit"))
            continue
        try:
            o = described(con, f"({oracle[name]})")
        except Exception as e:
            bad.append((name, f"oracle DESCRIBE failed: {str(e)[:200]}"))
            continue
        s = snap[name]
        if sorted(o) != sorted(s):
            bad.append((name, f"column sets differ: oracle={sorted(o)} snapshot={sorted(s)}"))
            continue
        for c in sorted(o):
            if o[c] != s[c]:
                hint = (" — wrap the oracle column in CAST(... AS BIGINT); "
                        "DuckDB widens integer sum() to HUGEINT"
                        if o[c] == "decimal" and s[c] == "int" else "")
                bad.append((name, f"column '{c}': oracle={o[c]} snapshot-spark={s[c]}{hint}"))
    stale = sorted(set(snap) - set(oracle))
    for name, msg in bad:
        print(f"[TYPE-LINT-FAIL] {name}: {msg}")
    if stale:
        print(f"[TYPE-LINT-NOTE] snapshot has {len(stale)} entries no longer in "
              f"oracleSql (harmless): {stale[:5]}...")
    print(f"\n{len(oracle) - len(set(n for n, _ in bad))}/{len(oracle)} "
          "oracle schemas match the snapshot")
    if bad:
        sys.exit(1)


def main():
    if len(sys.argv) >= 4 and sys.argv[2] == "--check-snapshot":
        check_snapshot(sys.argv[1], sys.argv[3])
        return
    emit = "--emit-snapshot" in sys.argv
    argv = [a for a in sys.argv if a != "--emit-snapshot"]
    sfdir, outdir = argv[1], argv[2]
    only = set(argv[3:])
    if emit and only:
        # a filtered emit would replace the committed full snapshot
        # with a partial one and fail every other query's sbt-test lint
        print("--emit-snapshot writes the FULL snapshot; drop the query filter")
        sys.exit(2)
    con = connect(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bad = []
    checked = 0
    snap = {}
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
        snap[name] = s
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
    if emit:
        json.dump(snap, open(SNAPSHOT, "w"), indent=1, sort_keys=True)
        print(f"snapshot written: {SNAPSHOT} ({len(snap)} queries)")


if __name__ == "__main__":
    main()
