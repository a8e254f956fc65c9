#!/usr/bin/env python3
"""Synthesize an sf1-shaped dataset by 10x replication of sf0.1 with
re-keyed replicas (VERDICT r4 ask #1: the correctness stressor one scale
up from the bench SF).

Replication rules (replica r in 0..9; r=0 is the ORIGINAL rows, so every
literal key / search term a registered query depends on still exists):
  - region/nation: fixed-size dimensions, copied as-is (as in TPC-H).
  - customer/supplier/part/orders/lineitem: keys offset by r*(max+1) with
    referential integrity preserved (o_custkey follows customer's offset,
    lineitem's l_orderkey/l_partkey/l_suppkey follow their parents).
  - events: event_id/user_id offset; ts/value/props unchanged (replicas
    overlay in time -> 10x window density, the realistic scale-up shape).
  - documents: every whitespace token of replicas r>0 gets an "r<r>"
    suffix. This keeps each shingle's document frequency FLAT while T
    grows 10x (blowup stays ~10, realistic for a bigger crawl), instead
    of the 100x sum(df^2) explosion plain text replication would cause --
    near-dup structure is preserved WITHIN each replica (both docs of a
    pair get the same suffix), and the DuckDB oracle stays tractable.
    n_chars is recomputed to match the rewritten text.
  - embeddings: vector rotated left by r positions (deterministic, unit
    norm preserved, per-replica cosine structure distinct); vec_id offset.

Writes through DuckDB, so events.ts becomes timestamp[us] (the source is
timestamp[ns]); Tables.events already normalizes ns->us to match DuckDB's
read-side truncation, so both engines see identical values either way.

Usage: python3 scripts/gen_sf1.py [src_sf_dir] [dst_dir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
R = int(os.environ.get("GEN_REPLICAS", "10"))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def copy(sql: str, name: str) -> None:
    con.sql(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"[gen_sf1] {name}: {n} rows")


REP = f"(SELECT unnest(range({R})) AS r)"


def off(table: str, key: str) -> int:
    """Replica key stride = max(key)+1 DERIVED FROM THE SOURCE, not a
    hardcoded sf0.1 size — any src_sf_dir replicates without collisions."""
    return con.sql(f"SELECT max({key}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


O_CUST = off("customer", "c_custkey")
O_SUPP = off("supplier", "s_suppkey")
O_PART = off("part", "p_partkey")
O_ORD = off("orders", "o_orderkey")
O_EVT = off("events", "event_id")
O_USER = off("events", "user_id")
O_DOC = off("documents", "doc_id")
O_VEC = off("embeddings", "vec_id")

for t in ("region", "nation"):
    copy(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

copy(
    f"""SELECT c_custkey + r*{O_CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', {REP}""",
    "customer",
)
copy(
    f"""SELECT s_suppkey + r*{O_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', {REP}""",
    "supplier",
)
copy(
    f"""SELECT p_partkey + r*{O_PART} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{SRC}/part.parquet', {REP}""",
    "part",
)
copy(
    f"""SELECT o_orderkey + r*{O_ORD} AS o_orderkey,
               o_custkey + r*{O_CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', {REP}""",
    "orders",
)
copy(
    f"""SELECT l_orderkey + r*{O_ORD} AS l_orderkey,
               l_partkey + r*{O_PART} AS l_partkey,
               l_suppkey + r*{O_SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', {REP}""",
    "lineitem",
)
copy(
    f"""SELECT event_id + r*{O_EVT} AS event_id, ts,
               user_id + r*{O_USER} AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', {REP}""",
    "events",
)
copy(
    f"""SELECT doc_id + r*{O_DOC} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1r' || r, 'g')
               END AS text,
               lang, source,
               CASE WHEN r = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '(\\S+)', '\\1r' || r, 'g'))
               END AS n_chars
        FROM '{SRC}/documents.parquet', {REP}""",
    "documents",
)
copy(
    f"""SELECT vec_id + r*{O_VEC} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE list_concat(embedding[r+1:], embedding[1:r])
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', {REP}""",
    "embeddings",
)
print(f"[gen_sf1] done -> {DST}")
