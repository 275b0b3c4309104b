"""Incremental / merge plans (SURVEY.md §2.9)."""

from .merge import upsert_last_writer_wins, apply_cdc
from .incremental import (
    incremental_append_watermark,
    incremental_append_antijoin,
    reconcile_counts,
    merge_agg_state,
    cdc_signed_partials,
    point_in_time_join,
)

__all__ = [
    "upsert_last_writer_wins",
    "apply_cdc",
    "incremental_append_watermark",
    "incremental_append_antijoin",
    "merge_agg_state",
    "cdc_signed_partials",
    "point_in_time_join",
    "reconcile_counts",
]
