"""Local oracle-parity harness — mimics the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, sorted column
names, and an order-insensitive value hash (floats rounded to 6 sig
places, timestamps ISO-formatted).

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            return f"{v:.12g}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def _canon_dtype(dt) -> str:
    s = str(dt)
    for k, v in {
        "int8": "int", "int16": "int", "int32": "int", "int64": "int",
        "uint64": "int", "float32": "float", "float64": "float",
        "datetime64[ns]": "ts", "datetime64[us]": "ts", "object": "obj",
        "bool": "bool",
    }.items():
        if s == k:
            return v
    return s


def compare(name: str, spark_df, oracle_df) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        return False, f"schema mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
    dt_sp = {c: _canon_dtype(sp[c].dtype) for c in sp.columns}
    dt_or = {c: _canon_dtype(oracle_df[c].dtype) for c in oracle_df.columns}
    if dt_sp != dt_or:
        diff = {c: (dt_sp[c], dt_or[c]) for c in dt_sp if dt_sp[c] != dt_or[c]}
        return False, f"dtype mismatch: {diff}"
    if len(sp) != len(oracle_df):
        return False, f"row count mismatch: spark={len(sp)} oracle={len(oracle_df)}"
    a, b = normalize(sp), normalize(oracle_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"OK ({len(sp)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from python_etl_pipeline_spark.session import get_spark
    from python_etl_pipeline_spark.queries import REGISTRY

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            if spec.sql is None:
                n = sdf.count()
                print(f"  {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                continue
            odf = con.execute(spec.sql).fetchdf()
            ok, msg = compare(name, sdf, odf)
            status = "PASS" if ok else "FAIL"
            print(f"  {name}: {status} {msg} [{time.time()-t0:.1f}s]")
            if not ok:
                failures.append(name)
        except Exception as e:
            print(f"  {name}: ERROR {type(e).__name__}: {e}")
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
