"""Build the 10x scaling corpus used by SCALE.md's BENCH_sf1 rows.

Recipe (unchanged across rounds): 10 id-shifted copies of each
requested sf0.1 table into OUT_DIR. Documents get a per-copy token
suffix so cross-copy texts are near- but not exact-duplicates (the
within-copy dup/near-dup structure is preserved verbatim); embeddings
shift vector ids the same way so doc/vector joins stay consistent;
events shift event_id and user_id (key-shifted, timestamps untouched).
Dimension tables (region/nation/...) are copied 1x — the "facts 10x,
dims 1x" shape used for join-query rows.

Usage: python tools/make_10x.py [--copies=N] [out_dir] [table ...]
Defaults: 10 copies, /tmp/testdata_10x, documents embeddings events.
``--copies=100`` builds the 100x spot-check corpus (SCALE.md
"100x spot-check" rows) with the same key-shift recipe.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DIMS = {"region", "nation", "supplier", "part"}


def build(out_dir: str, tables: list[str], copies: int = 10) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        dst = out / f"{t}.parquet"
        if t in DIMS:
            shutil.copyfile(src, dst)
            print(f"{t}: copied 1x (dimension)")
            continue
        if t == "documents":
            off = con.sql(
                f"SELECT max(doc_id) + 1 FROM '{src}'"
            ).fetchone()[0]
            # ROW_GROUP_SIZE: DuckDB's default writes this table as ONE
            # row group, and a single row group is unsplittable — every
            # Spark scan (and the CPU-heavy explode stages fused above
            # it) collapses to 1 task no matter what maxPartitionBytes
            # says (r10 finding: tx29's 10x wall was 30/32 cores idle).
            # Production corpora are many-file; bounded row groups make
            # the fixture's layout honest about that.
            q = f"""
            COPY (
              SELECT doc_id + k * {off} AS doc_id,
                     text || ' c' || k AS text,
                     lang, source, n_chars + 3 AS n_chars
              FROM '{src}', range(0, {copies}) r(k)
            ) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
            """
        elif t == "embeddings":
            cols = [
                r[0]
                for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
            ]
            idc = "doc_id" if "doc_id" in cols else cols[0]
            off = con.sql(f"SELECT max({idc}) + 1 FROM '{src}'").fetchone()[0]
            rest = ", ".join(c for c in cols if c != idc)
            q = f"""
            COPY (
              SELECT {idc} + k * {off} AS {idc}, {rest}
              FROM '{src}', range(0, {copies}) r(k)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        elif t == "events":
            eoff, uoff = con.sql(
                f"SELECT max(event_id) + 1, max(user_id) + 1 FROM '{src}'"
            ).fetchone()
            q = f"""
            COPY (
              SELECT event_id + k * {eoff} AS event_id, ts,
                     user_id + k * {uoff} AS user_id,
                     event_type, value, props
              FROM '{src}', range(0, {copies}) r(k)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        elif t == "orders":
            # key-shifted facts: 10 disjoint copies of the order/customer
            # key spaces (the r9 recipe behind the x67/x68/i7 rows —
            # previously built ad-hoc, now reproducible from this tool)
            okoff, ckoff = con.sql(
                f"SELECT max(o_orderkey) + 1, max(o_custkey) + 1 "
                f"FROM '{src}'"
            ).fetchone()
            q = f"""
            COPY (
              SELECT o_orderkey + k * {okoff} AS o_orderkey,
                     o_custkey + k * {ckoff} AS o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate,
                     o_orderpriority
              FROM '{src}', range(0, {copies}) r(k)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        elif t == "lineitem":
            # shifts consistent with orders (orderkey) and with 10
            # disjoint part spaces; suppkey deliberately UNSHIFTED
            # (suppliers shared across copies, matching the fixture)
            okoff, pkoff = con.sql(
                f"SELECT max(l_orderkey) + 1, max(l_partkey) + 1 "
                f"FROM '{src}'"
            ).fetchone()
            q = f"""
            COPY (
              SELECT l_orderkey + k * {okoff} AS l_orderkey,
                     l_partkey + k * {pkoff} AS l_partkey,
                     l_suppkey, l_linenumber, l_quantity,
                     l_extendedprice, l_discount, l_tax, l_returnflag,
                     l_linestatus, l_shipdate
              FROM '{src}', range(0, {copies}) r(k)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        elif t == "customer":
            ckoff = con.sql(
                f"SELECT max(c_custkey) + 1 FROM '{src}'"
            ).fetchone()[0]
            q = f"""
            COPY (
              SELECT c_custkey + k * {ckoff} AS c_custkey,
                     c_name, c_nationkey, c_acctbal, c_mktsegment
              FROM '{src}', range(0, {copies}) r(k)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        else:
            raise SystemExit(f"no 10x recipe for table {t}")
        con.sql(q)
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    args = sys.argv[1:]
    copies = 10
    if args and args[0].startswith("--copies="):
        copies = int(args.pop(0).split("=", 1)[1])
    out_dir = args[0] if args else "/tmp/testdata_10x"
    tables = args[1:] or ["documents", "embeddings", "events"]
    build(out_dir, tables, copies=copies)
