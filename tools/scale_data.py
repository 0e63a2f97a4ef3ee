#!/usr/bin/env python3
"""Scale the driver-generated sf0.1 corpus Kx (default 10x -> "sf1") for
the one-scale-up bench datapoint: every SF-scaled table is replicated K
times with per-copy key remapping that PRESERVES referential integrity
(copy i's lineitem references copy i's orders/part/supplier, etc.), and
content columns are deterministically mutated per copy so duplication
DENSITY stays at sf0.1's level instead of multiplying:

 - documents.text: copy i>0 suffixes EVERY token with a copy tag — a
   bijective vocabulary rename, so intra-copy word-2-gram (shingle)
   structure is exactly isomorphic to the source corpus and cross-copy
   shingle sets are disjoint (no manufactured near-dup pairs). NOT an
   interleaved separator token: inserting a token between words turns
   every 2-shingle into (word, tag), which degrades bigram similarity
   to unigram similarity and inflates near-dup density quadratically
   (measured: 84M LSH candidate pairs at 10x vs the ~600k a linear
   scale-up implies). n_chars recomputed to match the mutated text.
 - embeddings.embedding: copy i>0 adds a deterministic per-element,
   per-copy jitter large enough to break cosine near-duplicate
   collisions across copies (the value-level analogue of the text rule).
 - nation/region stay fixed (TPC-H semantics).

Usage: python3 tools/scale_data.py [src_sf_dir] [dst_dir] [K]
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def rp(t):
    return f"read_parquet('{src}/{t}.parquet')"


def off(t, key):
    return con.execute(f"SELECT max({key}) + 1 FROM {rp(t)}").fetchone()[0]


OFF = {
    "cust": off("customer", "c_custkey"),
    "supp": off("supplier", "s_suppkey"),
    "part": off("part", "p_partkey"),
    "ord": off("orders", "o_orderkey"),
    "evt": off("events", "event_id"),
    "usr": off("events", "user_id"),
    "doc": off("documents", "doc_id"),
    "vec": off("embeddings", "vec_id"),
}


def emit(table, select):
    con.execute(
        f"COPY ({select}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


for t in ("region", "nation"):
    emit(t, f"SELECT * FROM {rp(t)}")

emit("customer", f"""
  SELECT c_custkey + i * {OFF['cust']} AS c_custkey, c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM {rp('customer')} CROSS JOIN range({K}) r(i)""")

emit("supplier", f"""
  SELECT s_suppkey + i * {OFF['supp']} AS s_suppkey, s_name,
         s_nationkey, s_acctbal
  FROM {rp('supplier')} CROSS JOIN range({K}) r(i)""")

emit("part", f"""
  SELECT p_partkey + i * {OFF['part']} AS p_partkey, p_name, p_brand,
         p_type, p_size, p_retailprice
  FROM {rp('part')} CROSS JOIN range({K}) r(i)""")

emit("orders", f"""
  SELECT o_orderkey + i * {OFF['ord']} AS o_orderkey,
         o_custkey + i * {OFF['cust']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {rp('orders')} CROSS JOIN range({K}) r(i)""")

emit("lineitem", f"""
  SELECT l_orderkey + i * {OFF['ord']} AS l_orderkey,
         l_partkey + i * {OFF['part']} AS l_partkey,
         l_suppkey + i * {OFF['supp']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {rp('lineitem')} CROSS JOIN range({K}) r(i)""")

emit("events", f"""
  SELECT event_id + i * {OFF['evt']} AS event_id, ts,
         user_id + i * {OFF['usr']} AS user_id,
         event_type, value, props
  FROM {rp('events')} CROSS JOIN range({K}) r(i)""")

emit("documents", f"""
  WITH scaled AS (
    SELECT doc_id + i * {OFF['doc']} AS doc_id,
           CASE WHEN i = 0 THEN text
                ELSE array_to_string(list_transform(string_split(text, ' '),
                       t -> t || 'x' || i), ' ') END AS text,
           lang, source, n_chars AS n_chars0, i
    FROM {rp('documents')} CROSS JOIN range({K}) r(i))
  SELECT doc_id, text, lang, source,
         CASE WHEN i = 0 THEN n_chars0
              ELSE CAST(length(text) AS BIGINT) END AS n_chars
  FROM scaled""")

emit("embeddings", f"""
  SELECT vec_id + i * {OFF['vec']} AS vec_id,
         CASE WHEN i = 0 THEN embedding
              ELSE CAST(list_transform(embedding, x ->
                CAST(x + 0.36 * ((abs(x * 971.0 * (i + 1)) % 1.0) - 0.5)
                     AS REAL)) AS REAL[]) END AS embedding,
         label
  FROM {rp('embeddings')} CROSS JOIN range({K}) r(i)""")

print(f"scaled {src} x{K} -> {dst}")
