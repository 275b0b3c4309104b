"""Build the 10x scaling corpus used by SCALE.md's BENCH_sf1 rows.

Recipe (unchanged across rounds): 10 id-shifted copies of each
requested sf0.1 table into OUT_DIR. Documents get a per-copy token
suffix so cross-copy texts are near- but not exact-duplicates (the
within-copy dup/near-dup structure is preserved verbatim); embeddings
shift vector ids the same way so doc/vector joins stay consistent;
events shift event_id and user_id (key-shifted, timestamps untouched).
Dimension tables (region/nation/...) are copied 1x — the "facts 10x,
dims 1x" shape used for join-query rows.

Usage: python tools/make_10x.py [out_dir] [table ...]
Defaults: /tmp/testdata_10x, documents embeddings events.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DIMS = {"region", "nation", "customer", "supplier", "part", "orders",
        "lineitem"}


def build(out_dir: str, tables: list[str]) -> None:
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
              FROM '{src}', range(0, 10) r(k)
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
              FROM '{src}', range(0, 10) r(k)
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
              FROM '{src}', range(0, 10) r(k)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        else:
            raise SystemExit(f"no 10x recipe for table {t}")
        con.sql(q)
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    args = sys.argv[1:]
    out_dir = args[0] if args else "/tmp/testdata_10x"
    tables = args[1:] or ["documents", "embeddings", "events"]
    build(out_dir, tables)
