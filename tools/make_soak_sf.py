#!/usr/bin/env python3
"""Generate a scaled soak dataset from /root/testdata/sf0.1 (dev tool only;
NOT part of the engine — the library has no Python dependency).

Replicates every fact/dim-scaled table N times with per-replica key offsets
so referential integrity holds (lineitem⋈orders⋈customer⋈nation⋈region and
lineitem⋈part/supplier all still join). nation/region stay fixed, as in
TPC-H scaling. Document text is perturbed on odd replicas (exact-dup +
near-dup mix for the dedup family); embeddings get a small deterministic
jitter so ANN doesn't see 10 identical copies of every vector.

Usage: python3 tools/make_soak_sf.py [N] [outdir]
Defaults: N=10 → ~sf1 under target/soak/sf1 (gitignored).
"""
import sys, os, duckdb

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
out = sys.argv[2] if len(sys.argv) > 2 else "target/soak/sf1"
src = "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

def maxof(table, col):
    return con.execute(f"SELECT max({col})+1 FROM '{src}/{table}.parquet'").fetchone()[0]

MC, MO, MP, MS = maxof("customer", "c_custkey"), maxof("orders", "o_orderkey"), \
                 maxof("part", "p_partkey"), maxof("supplier", "s_suppkey")
ME, MU = maxof("events", "event_id"), maxof("events", "user_id")
MD, MV = maxof("documents", "doc_id"), maxof("embeddings", "vec_id")

REPL = f"(SELECT unnest(range({n})) AS r) reps"

def gen(table, select):
    dst = f"{out}/{table}.parquet"
    con.execute(
        f"COPY (SELECT {select} FROM '{src}/{table}.parquet' CROSS JOIN {REPL}) "
        f"TO '{dst}' (FORMAT PARQUET)")
    rows = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"  {table}: {rows} rows")

def copy(table):
    con.execute(f"COPY (SELECT * FROM '{src}/{table}.parquet') TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    print(f"  {table}: copied as-is")

copy("nation"); copy("region")
gen("customer", f"c_custkey + r*{MC} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
gen("supplier", f"s_suppkey + r*{MS} AS s_suppkey, s_name, s_nationkey, s_acctbal")
gen("part",     f"p_partkey + r*{MP} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
gen("orders",   f"o_orderkey + r*{MO} AS o_orderkey, o_custkey + r*{MC} AS o_custkey, "
                f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
gen("lineitem", f"l_orderkey + r*{MO} AS l_orderkey, l_partkey + r*{MP} AS l_partkey, "
                f"l_suppkey + r*{MS} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
# events goes through pyarrow, not duckdb: ts must stay TIMESTAMP_NS in
# parquet (Tables.events reads nanos-as-long, matching the source tables)
# and duckdb 1.0 writes parquet timestamps as µs even from TIMESTAMP_NS,
# which silently breaks every events query.
def gen_events():
    import pyarrow as pa, pyarrow.parquet as pq, pyarrow.compute as pc
    t = pq.read_table(f"{src}/events.parquet")
    me = pc.max(t["event_id"]).as_py() + 1
    mu = pc.max(t["user_id"]).as_py() + 1
    parts = [pa.table({
        "event_id": pc.add(t["event_id"], r * me),
        "ts": t["ts"],
        "user_id": pc.add(t["user_id"], r * mu),
        "event_type": t["event_type"],
        "value": t["value"],
        "props": t["props"]}) for r in range(n)]
    out_t = pa.concat_tables(parts)
    pq.write_table(out_t, f"{out}/events.parquet")
    print(f"  events: {out_t.num_rows} rows (ns timestamps preserved)")
gen_events()
# odd replicas get a text perturbation → near-dups; even replicas are exact dups
gen("documents", f"doc_id + r*{MD} AS doc_id, "
                 f"CASE WHEN r % 2 = 1 THEN text || ' replica-' || r ELSE text END AS text, "
                 f"lang, source, length(CASE WHEN r % 2 = 1 THEN text || ' replica-' || r ELSE text END)::BIGINT AS n_chars")
gen("embeddings", f"vec_id + r*{MV} AS vec_id, "
                  f"list_transform(embedding, x -> (x + r * 0.0017)::FLOAT) AS embedding, label")
print("done:", out)
