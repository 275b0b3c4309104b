"""Relational core operators (SURVEY.md §2.2–2.7).

Pure ``DataFrame -> DataFrame`` functions over stock Spark primitives —
Catalyst handles pruning, pushdown and join-strategy selection; nothing
here hand-schedules what the optimizer already does.
"""

from .project import validate_and_project, pk_filter, normalize_nulls
from .dedup import dedup_keep_first, dedup_keep_last, distinct_keys, digit_sort_key
from .joins import split_new_vs_existing, fk_join, range_join
from .sampling import hash_bucket, train_val_test_split, stratified_hash_sample
from .aggregate import table_counts, multi_agg_summary

__all__ = [
    "validate_and_project",
    "pk_filter",
    "normalize_nulls",
    "dedup_keep_first",
    "dedup_keep_last",
    "distinct_keys",
    "digit_sort_key",
    "split_new_vs_existing",
    "fk_join",
    "range_join",
    "hash_bucket",
    "train_val_test_split",
    "stratified_hash_sample",
    "table_counts",
    "multi_agg_summary",
]
