"""CLI — the reference's entry points (SURVEY.md §3) on the Spark engine.

The reference exposes ``python main.py --mode full|schedule`` plus
per-phase module mains (main.py:425-461, extract/transform/load
``main()``s). This CLI reproduces that surface:

    python -m python_etl_pipeline_spark --mode full --data-dir ./data --warehouse ./wh
    python -m python_etl_pipeline_spark --mode extract|transform|load ...
    python -m python_etl_pipeline_spark --mode schedule --interval-sec 3600
    python -m python_etl_pipeline_spark --mode health ...

``schedule`` is the reference's poll loop (main.py:411-419) with the
overlap lock made structural: one process, one pipeline, runs strictly
sequentially. For production cadence prefer the Structured Streaming
ingest (streaming/file_stream.py) under an external scheduler.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import time

from .pipeline import Pipeline
from .schemas import LOAD_ORDER


def discover_files(data_dir: str) -> dict[str, list[str]]:
    """Per-entity ``{entity}*.csv`` glob (src/extract.py:527-538)."""
    out: dict[str, list[str]] = {}
    for entity in LOAD_ORDER:
        paths = sorted(glob.glob(os.path.join(data_dir, f"{entity}*.csv")))
        if paths:
            out[entity] = paths
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python_etl_pipeline_spark")
    p.add_argument(
        "--mode",
        choices=["full", "extract", "transform", "load", "schedule", "health"],
        default="full",
    )
    p.add_argument("--data-dir", default="data")
    p.add_argument("--warehouse", default="warehouse")
    p.add_argument("--interval-sec", type=int, default=3600,
                   help="schedule mode: seconds between runs")
    p.add_argument("--max-runs", type=int, default=0,
                   help="schedule mode: stop after N runs (0 = forever)")
    return p


def run(args: argparse.Namespace, spark=None) -> dict:
    from .session import get_spark

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    spark = spark or get_spark("spark-etl-cli")
    pipe = Pipeline(spark, args.warehouse)
    if args.mode == "full":
        return pipe.run_full(discover_files(args.data_dir))
    if args.mode == "extract":
        pipe.run_extract(discover_files(args.data_dir))
        return {"extracted": pipe.metrics.extracted}
    if args.mode == "transform":
        pipe.run_transform()
        return {"transformed": pipe.metrics.transformed}
    if args.mode == "load":
        pipe.run_load()
        return {"loaded": pipe.metrics.loaded,
                "reconciliation": pipe.metrics.reconciliation}
    if args.mode == "health":
        report: dict[str, dict[str, int]] = {}
        for layer in ("staging", "transformed", "production"):
            counts = {}
            for entity in LOAD_ORDER:
                if pipe.wh.exists(layer, entity):
                    counts[entity] = pipe.wh.read(layer, entity).count()
            report[layer] = counts
        return report
    # schedule: the reference's poll loop, sequential by construction
    runs = 0
    results = []
    while True:
        results.append(pipe.run_full(discover_files(args.data_dir)))
        runs += 1
        if args.max_runs and runs >= args.max_runs:
            return {"runs": runs, "last": results[-1]}
        time.sleep(args.interval_sec)


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    print(run(args))


if __name__ == "__main__":
    main()
