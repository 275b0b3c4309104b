"""Plan inspector: prints the physical-plan facts that matter at scale
for selected queries — PushedFilters (scan pushdown), ReadSchema (column
pruning), join strategies, and WholeStageCodegen coverage.

Usage: python tools/plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT = [
    "a0_pricing_summary",
    "flagship_customer_segments",
    "j3_fact_dim_join",
    "i3_watermark_append",
    "p4_prune_valid_columns",
    "o2_dedup_keep_last",
    "dd2_minhash_lsh",
    "dd10_chunk_dedup",
    "x24_salted_join",
    "x25_cdc_apply",
    "x27_corpus_mix",
    # round 6
    "o1_digit_sort",
    "dd15_line_dedup",
    "x37_corpus_datacard",
    "x38_token_sharding",
    # round 7
    "x40_shard_assignment",
    "x41_datacard_incremental",
    "x42_curriculum_order",
    "tx17_perplexity_buckets",
    "tx18_lang_consistency",
    "ann10_ivfpq_topk",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT

    from python_etl_pipeline_spark.session import get_spark
    from python_etl_pipeline_spark.queries import REGISTRY

    spark = get_spark("plans")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"\n=== {name} ===")
        for line in plan.splitlines():
            s = line.strip()
            if re.search(r"PushedFilters|ReadSchema|Join|Exchange|WholeStageCodegen|Scan parquet", s):
                print("  " + s[:160])


if __name__ == "__main__":
    main()
