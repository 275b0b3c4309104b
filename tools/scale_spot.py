"""Isolated per-query scale spot-check — the SCALE.md 10x/100x
protocol in one command: each query runs in its OWN process (fresh
JVM + session, no block-position or session-state effects), one
warmup execution then median-of-N timed runs to a noop sink.

Usage:
  SPARK_DRIVER_MEMORY=100g python tools/scale_spot.py SF_DIR q1 [q2 ...] [--runs=5]

Prints one JSON line per query: {"query", "sf_dir", "median", "runs"}.
The 100x corpus comes from `python tools/make_10x.py --copies=100 ...`
(facts key-shifted 100x, dims 1x). Cross-round comparisons MUST use
this runner, not in-bench block numbers (SCALE.md "isolated recipe":
sub-2 s block slots are +/-40% position-sensitive)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _one(sf_dir: str, name: str, runs: int) -> None:
    sys.path.insert(0, str(REPO))
    from python_etl_pipeline_spark.queries import REGISTRY
    from python_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale_spot")
    spark.range(1).count()
    spec = REGISTRY[name]
    times = []
    for i in range(runs + 1):  # first execution is the warmup
        t0 = time.time()
        spec.spark(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        if i:
            times.append(time.time() - t0)
    times.sort()
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "median": round(times[len(times) // 2], 3),
                "runs": [round(t, 3) for t in times],
            }
        ),
        flush=True,
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    if args and args[0] == "_one":
        _one(args[1], args[2], int(args[3]))
        return
    sf_dir, names = args[0], args[1:]
    for name in names:
        r = subprocess.run(
            [sys.executable, __file__, "_one", sf_dir, name, str(runs)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            print(line[-1], flush=True)
        else:
            print(
                json.dumps(
                    {"query": name, "error": r.stderr.strip()[-500:]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
