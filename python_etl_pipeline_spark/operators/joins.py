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


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    *,
    bin_width: float | None = None,
    broadcast_bands: bool = False,
) -> DataFrame:
    """Range (band) join: fact rows matched to intervals ``[lo, hi)``.

    The naive plan for an interval predicate is a nested-loop join —
    O(n·m) predicate evaluations, which Spark can only broadcast, and
    which dies when the band table stops being tiny. With ``bin_width``
    set, the predicate is decomposed into an equi-join on a coarse bin:
    each band explodes into the bins it covers, each fact row hashes to
    ``floor(value / bin_width)``, the join is a plain hash/sort-merge
    equi-join on the bin, and the residual ``[lo, hi)`` filter refines.
    For non-overlapping bands each fact row matches at most one band, so
    no dedup is needed. Pick ``bin_width`` near the median band width:
    each band then explodes into O(1) bins and the equi-join fan-out
    stays ~1.

    Without ``bin_width`` the band table is broadcast and Catalyst runs
    the nested-loop — correct, and fine while bands stay dimension-sized.

    ``broadcast_bands`` applies only to the binned path: the whole point
    of the decomposition is that the bin join works as a plain
    hash/sort-merge exchange when the band table outgrows broadcast, so
    the hint is opt-in for callers that *know* the bands are
    dimension-sized — by default AQE/stats decide.
    """
    if bin_width is None:
        cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        return fact.join(F.broadcast(bands), cond, "inner")
    w = float(bin_width)
    binned_bands = bands.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    if broadcast_bands:
        binned_bands = F.broadcast(binned_bands)
    binned_fact = fact.withColumn("__bin", F.floor(F.col(value_col) / w).cast("long"))
    return (
        binned_fact.join(binned_bands, "__bin", "inner")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bin")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot fact key over ``salts``
    reducers (the join twin of ``aggregate.salted_agg``).

    A plain shuffle join hashes both sides on the key, so ONE pathological
    key (the null user, the default account, an empty-string id) lands its
    every fact row on one reducer — the straggler that dominates stage
    wall-time at 100 TB. Here the fact side gets a deterministic salt
    derived from its whole row (``xxhash64`` — same-key rows spread
    across salts), the dim side is replicated ``salts``× via explode, and
    the exchange keys on (key, salt): the hot key now occupies ``salts``
    reducers. Cost: dim shuffle volume × ``salts`` — use for fact-fact
    joins or dims too big to broadcast but small enough to replicate;
    AQE's skew-join split handles the moderate cases without any of this
    (enabled in session.py), while salting also covers the single-giant-
    key case AQE can't split (it cannot split one key's hash bucket on
    the *build* side requirement).

    Join-result equality with the plain join holds for inner/left joins
    keyed on ``on``; the salt never changes which (fact row, dim row)
    pairs match, only where they meet.
    """
    keys = [on] if isinstance(on, str) else list(on)
    fact_cols = [c for c in fact.columns]
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), salts)
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(salts)]))
    )
    return salted_fact.join(replicated_dim, keys + ["__salt"], how).drop("__salt")
