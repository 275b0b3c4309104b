"""Banding / categorical mapping expressions.

Reference semantics (SURVEY.md §2.8; src/transform.py):

* ``customer_segment`` — tenure >=730 'VIP', >=180 'Regular', >0 'New',
  else 'NA' (np.select order matters — :316-317)
* ``risk_category`` — loan_amount >500000 'High', >100000 'Medium',
  else 'Low' (:397-398)
* ``transaction_category`` — amount >10000 'Large', >1000 'Medium',
  else 'Small' (:462-463)
* ``gender_norm`` — lower(g) in {m,male}->'M', {f,female}->'F', else 'N'
  (:323-327)
* ``fraud_flag`` — lower(v) in {true,1,yes,y} -> True else False (:457-460)
* ``region_map`` — substring containment of upper(state) against hardcoded
  region word lists; first match wins; else 'NA' (:251-258 — note the
  deliberate substring quirk: 'UP' matches UTTAR PRADESH)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def band(c: Column | str, cuts: Sequence[tuple[float, str]], default: str) -> Column:
    """Ordered greater-than banding: first ``(threshold, label)`` whose
    threshold the value exceeds wins; else ``default``.

    Generalizes F6/F10/F11 — the reference's np.select chains.
    """
    col = _as_col(c)
    expr = F.lit(default)
    for threshold, label in reversed(list(cuts)):
        expr = F.when(col > F.lit(threshold), F.lit(label)).otherwise(expr)
    return expr


def customer_segment(tenure: Column | str) -> Column:
    """F6: tenure-days banding (src/transform.py:316-317)."""
    t = _as_col(tenure)
    return (
        F.when(t >= 730, "VIP")
        .when(t >= 180, "Regular")
        .when(t > 0, "New")
        .otherwise("NA")
    )


def risk_category(amount: Column | str) -> Column:
    """F10: loan amount banding (src/transform.py:397-398)."""
    return band(amount, [(500000, "High"), (100000, "Medium")], "Low")


def transaction_category(amount: Column | str) -> Column:
    """F11: transaction amount banding (src/transform.py:462-463)."""
    return band(amount, [(10000, "Large"), (1000, "Medium")], "Small")


def gender_norm(g: Column | str) -> Column:
    """F8: normalize gender strings to single-char code (src/transform.py:323-327)."""
    low = F.lower(F.trim(_as_col(g).cast("string")))
    return (
        F.when(low.isin("m", "male"), "M")
        .when(low.isin("f", "female"), "F")
        .otherwise("N")
    )


def fraud_flag(v: Column | str) -> Column:
    """F12: tolerant boolean parse (src/transform.py:457-460); null -> False."""
    low = F.lower(F.trim(_as_col(v).cast("string")))
    return F.coalesce(low.isin("true", "1", "yes", "y"), F.lit(False))


# src/transform.py:251-258 — region word lists, first-match-wins order
DEFAULT_REGION_WORDS: list[tuple[str, list[str]]] = [
    ("North", ["DELHI", "PUNJAB", "UP"]),
    ("West", ["MAHARASHTRA", "GUJARAT"]),
    ("South", ["KARNATAKA", "TAMIL"]),
    ("East", ["BENGAL", "BIHAR"]),
]


def region_map(
    state: Column | str,
    words: list[tuple[str, list[str]]] | None = None,
    default: str = "NA",
) -> Column:
    """F7: substring-containment region mapping (src/transform.py:251-258).

    Each region's word list is checked in order against ``upper(state)``
    with ``contains`` semantics — so 'UP' matches 'UTTAR PRADESH', exactly
    as the reference behaves. For very large dimension domains prefer a
    broadcast-joined lookup table; this expression form keeps the logic in
    whole-stage codegen for the common small-list case.
    """
    up = F.upper(F.trim(_as_col(state).cast("string")))
    expr: Column = F.lit(default)
    for region, wordlist in reversed(words or DEFAULT_REGION_WORDS):
        cond = F.lit(False)
        for w in wordlist:
            cond = cond | up.contains(w)
        expr = F.when(cond, F.lit(region)).otherwise(expr)
    return expr
