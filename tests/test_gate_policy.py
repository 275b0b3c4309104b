"""Standing gate-rotation policy (adopted round 6): no registered
query may go more than 3 rounds without a hard driver CORRECTNESS row.

The driver verifies the first 50 ``queries()`` entries each round and
records CORRECTNESS_r{N}.json in the repo root. This test recomputes
every query's last-verified round from those files and fails if any
query at staleness >= 4 rounds — including a brand-new query that has
never been verified — is missing from the current ``_GATE_PREFIX``.
That makes the policy self-enforcing: adding a query, or letting one
age past the horizon, breaks CI until it is rotated into the gate.
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STALENESS_HORIZON = 3  # max rounds a query may go without a driver row


def _last_verified() -> tuple[dict[str, int], int]:
    """(query -> last round with a driver row, current round number).

    A row counts if it hash-matched, or was a rows-only check by design
    (err == "no_oracle" with a row count) — the strongest check the
    driver could run for that query at the time.
    """
    last: dict[str, int] = {}
    rounds = [0]
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", Path(f).name).group(1))
        rounds.append(r)
        for q, res in json.load(open(f)).items():
            ok = res.get("hash_match") or (
                res.get("err") == "no_oracle"
                and res.get("spark_rows") is not None
            )
            if ok:
                last[q] = max(last.get(q, 0), r)
    return last, max(rounds) + 1


def test_no_query_exceeds_staleness_horizon():
    from python_etl_pipeline_spark.queries import _GATE_PREFIX, REGISTRY

    last, current = _last_verified()
    gate = set(_GATE_PREFIX)
    overdue = sorted(
        q
        for q in REGISTRY
        if current - last.get(q, 0) > STALENESS_HORIZON and q not in gate
    )
    assert not overdue, (
        f"round {current}: these queries have gone more than "
        f"{STALENESS_HORIZON} rounds without a driver CORRECTNESS row and "
        f"must be rotated into _GATE_PREFIX: {overdue}"
    )


def test_gate_is_exactly_the_drivers_50_slots():
    from python_etl_pipeline_spark.queries import _GATE_PREFIX, REGISTRY

    assert len(_GATE_PREFIX) == len(set(_GATE_PREFIX)) == 50
    assert all(q in REGISTRY for q in _GATE_PREFIX)
