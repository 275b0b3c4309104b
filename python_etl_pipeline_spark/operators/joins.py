"""Join-shaped operators (SURVEY.md §2.3, §2.7).

* J1 — new-vs-existing key split. The reference materializes the target's
  key set into driver memory and does Python set algebra
  (src/extract.py:310-326, :397-402). That collapses at scale; here it is
  a pair of anti/semi joins that never leave the executors.
* J3 — the FK joins the reference schema declares but never runs:
  dimension joins broadcast, fact-fact joins shuffle on the key and are
  AQE-managed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_new_vs_existing(
    incoming: DataFrame, existing: DataFrame, pk: str
) -> tuple[DataFrame, DataFrame]:
    """J1: (new_rows, updated_rows) vs an existing key set.

    ``existing`` only needs its key column; Catalyst prunes the rest and
    broadcasts when small. Returns DataFrames, not counts — callers that
    need the reference's insert/update counters take ``.count()`` on each.
    """
    keys = existing.select(pk).distinct()
    new_rows = incoming.join(keys, pk, "left_anti")
    updated_rows = incoming.join(keys, pk, "left_semi")
    return new_rows, updated_rows


def fk_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    broadcast_dim: bool = False,
    how: str = "inner",
) -> DataFrame:
    """J3: FK equi-join; ``broadcast_dim=True`` hints the small side.

    Catalyst already auto-broadcasts under
    ``spark.sql.autoBroadcastJoinThreshold``; the explicit hint is for
    dimensions the caller *knows* are small regardless of stats.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on, how)
