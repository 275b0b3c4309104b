"""Standing gate-rotation policy (adopted round 6, amended round 7):
no registered query may go more than STALENESS_HORIZON rounds without
a hard driver CORRECTNESS row.

The driver verifies the first 50 ``queries()`` entries each round and
records CORRECTNESS_r{N}.json in the repo root. This test recomputes
every query's last-verified round from those files and fails if any
query past the horizon is missing from the current ``_GATE_PREFIX``.
That makes the policy self-enforcing: adding a query, or letting one
age past the horizon, breaks CI until it is rotated into the gate.

Round-7 amendments (both from the round-6 verdict/advice):

* Staleness is anchored to ``_GATE_ROUND`` — the round the current
  ``_GATE_PREFIX`` was built FOR, declared next to it — and computed
  only from CORRECTNESS files of EARLIER rounds. The round-6 formula
  (current = max(recorded) + 1) meant the moment the driver committed
  CORRECTNESS_r06.json, the still-valid round-6 gate turned CI red
  retroactively. Anchoring to the gate's own round makes the check a
  property of the gate definition, invariant to results files landing
  afterwards; the freshness test below separately forces the gate to
  actually BE current.

* STALENESS_HORIZON is 4, up from 3, because 3 became arithmetically
  infeasible: the registry holds 140+ queries, the gate has 50 slots,
  and ~12 of them are permanent sentinels re-verified every round —
  so a 3-round window can reach at most 3*(50-12) + 12 = 126 distinct
  queries < registry size. Some query MUST wait 4 rounds between
  driver rows no matter the schedule. At horizon 4 the bound is
  4*38 + 12 = 164, which holds until the registry passes ~160 (the
  round that crosses it must raise the horizon again or shrink the
  sentinel set, with this same arithmetic in the commit).

Round-15 amendment — the horizon STAYS 7 (bound 7*46 + 4 = 326 vs
registry 286 after the round's 7 additions); the r15 gate pays the 10
owed r8 rows in full (the 6 deferred twins + the 4 displaced
head-start slots) and pre-rotates 29 of the 42-query r9 cohort: the 6
cheap untouched business-analytics twins (x57-x62) defer, and 7 tail
members (x55/x56 as planned head-start, x49/x50/x52/x53/x54 as the
later additions landed) are displaced by the two-level lifecycle
(ann33-ann38) + dd26. Forward: r16 owes exactly 13 r9 rows + its
changes with ~33 slots of slack against the 43-query r10 cohort
(mandatory r17). Next decision point unchanged (registry ~326 or an
un-smoothed 46-query cohort).

Round-14 amendment — the horizon STAYS 7; the round's gate decision
is cohort SMOOTHING, not a crossing (bound 7*46 + 4 = 326 vs registry
275). The r8 cohort (46 queries, mandatory at r15 under horizon 7) is
pre-rotated: 36 take r14 slots now (CORRECTED per the r14 ADVICE —
this amendment originally mis-stated the split as 40/6/2), 6 cheap
untouched twins defer to r15, and 4 tail slots (x26/x27/x28/x29)
head-start the round's additions. That leaves r15 owing 10 r8 rows +
its own changes with ~26 slots of slack to pre-rotate the bunched
r9 cohort (mandatory r16) — the forward schedule in the r14 gate
commit shows no zero-slack round in the window, which is what the
r13 verdict asked the gate to guarantee. No arithmetic crossing is
near: next decision point when the registry passes ~326 or a cohort
again reaches 46 un-smoothed.

Round-13 amendment — the horizon rises 6 -> 7, decided in the r13
gate commit before any operator work (the crossing the r12 commit
forecast). The binding constraint this time is the SCHEDULE, not the
registry-size bound: last-driver-row cohorts stand at r7:42, r8:46,
r9:46, r10:43, r11:44, r12:50 against a per-round capacity of 46
non-sentinel slots. Under horizon 6, r13 takes the 42-query r7 cohort
+ 4 additions = 46 exactly, and r14 then owes the ENTIRE 46-query r8
cohort + 4 sentinels = 50 slots with zero room for round-14's own
changed/added queries — but rule (1) forces every changed query to
re-gate immediately, so a zero-slack round is a deadlock, and horizon
6 admits no steady state once any cohort reaches 46 (r12's is 50).
At horizon 7 the bound is 7*46 + 4 = 326 against a 275-query registry
and the steady-state retirement rate is 275/7 ~ 39.3 slots/round vs
capacity 46 — ~6.7 slots/round of standing slack. Freshness cost: a
query may now wait 7 rounds between driver rows; the judge's
full-registry parity sweeps (271/271 in r12) remain the between-rows
backstop. Next crossing when the registry passes ~326 or the largest
cohort reaches 46 again — decide there, same discipline.

Round-10 amendment — the round-10 build wave (23 additions: x79-x86,
tx28/tx29, dd19/dd20, ann25-ann28, hh7/hh8, i13-i16, mm6) crossed the
horizon-5 bound: registry 239 > 5*46 + 4 = 234. Per the standing
discipline (decide in the crossing round, arithmetic in the commit)
the horizon rises 5 -> 6: bound 6*46 + 4 = 280 against a 239-query
registry. The alternatives were rejected again for the same reasons as
r9: no sentinel is left to shed (the set is already the irreplaceable
4), and capping registry growth would cap exactly the coverage the
engine is graded on. Freshness cost: a query may now wait 6 rounds
between driver rows — the judge's own full-registry parity sweeps
(which ran green over all 239 this round) remain the between-rows
backstop. The round-10 gate needs no rebuild: it was built under
horizon 5 and is a strict superset of what horizon 6 requires. Next
crossing at ~280 — at the r9/r10 burst pace (~25/round) that is round
12; decide there.

Round-9 second amendment — the round-9 build wave itself crossed the
new bound: the registry reached 191, past 4*46 + 4 = 188, with no
sentinel left to shed. Per the standing discipline (decide in the
round that crosses, with the arithmetic in the commit), the horizon
rises from 4 to 5: bound 5*46 + 4 = 234 against a 191-query registry
(+15 rounds of slack at the round-9 growth rate of ~3/round
steady-state; the +36 this round was a one-time burst). Raising the
horizon was round 8's rejected option when 4 redundant sentinel slots
were the alternative; with zero redundant slots left it is now the
only lever that doesn't cap registry growth. Freshness cost: a query
may now wait 5 rounds between driver rows — still bounded, and the
judge's own per-round parity sweeps (which cover the whole registry)
have historically closed the gap in practice. The round-9 gate was
built under horizon 4 and is a strict superset of what horizon 5
requires, so it stays as-is. Next crossing at ~234: the options then
are horizon 6 or capping growth — decide in the crossing round.

Round-9 amendment — the round-8 pre-authorization EXECUTED: the
third-wave additions (hh4, tx23, x52, x53, hh5, x54) pushed the
registry to 177, past the 8-sentinel bound 4*42 + 8 = 176, so the
permanent-sentinel set shrank to the 4 irreplaceable ones (flagship,
f2_safe_date, i2_upsert_last_writer_wins, s4_file_identity), raising
the horizon-4 bound to 4*46 + 4 = 188. The four demoted sentinels
(o2_dedup_keep_last, i3_antijoin_append, j1_anti_new_keys,
w1_display_id) hold round-8 driver rows (due round 12) and rotate on
the normal horizon; their operator modules keep coverage via the
remaining sentinels and r8-verified twins (o3/j1_semi/i3_watermark/
o5 all share those modules). The horizon stays 4, per the round-8
reasoning. Next crossing at ~188: no further sentinel to shed — the
options then are raising the horizon to 5 (bound 5*46 + 4 = 234) or
capping registry growth; decide IN the round that crosses, with the
arithmetic in the commit.

Round-8 amendment — the standing DECISION for the approaching bound
(the r7 verdict's "decide the gate arithmetic before it decides for
you"): the permanent-sentinel set shrinks from 12 to 8, raising the
horizon-4 bound to 4*42 + 8 = 176 against a 155-query registry
(+12 this round: ann11-ann17, tx19, tx20, x43-x45 — at that rate the
bound is crossed around round 11). The four dropped
sentinels (o3_dedup_keep_first, j1_semi_existing_keys,
i3_watermark_append, o5_offset_slice) each have a still-sentineled
twin exercising the same operator module (o2/j1_anti/i3_antijoin/w1),
so no subtle module loses its permanent watch; the dropped twins
rotate on the normal horizon. The horizon itself stays 4 — raising it
was rejected because it would weaken EVERY query's verification
freshness to protect 4 redundant slots. Pre-authorized escalation for
the ~round-12 crossing: shrink to the 4 irreplaceable sentinels
(flagship, f2, i2, s4; bound 4*46 + 4 = 188) before touching the
horizon.
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STALENESS_HORIZON = 7  # max rounds a query may go without a driver row


def _last_verified(before_round: int) -> tuple[dict[str, int], int]:
    """(query -> last round < before_round with a driver row,
    newest recorded round overall).

    A row counts if it hash-matched, or was a rows-only check by design
    (err == "no_oracle" with a row count) — the strongest check the
    driver could run for that query at the time.
    """
    last: dict[str, int] = {}
    newest = 0
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", Path(f).name).group(1))
        newest = max(newest, r)
        if r >= before_round:
            continue
        for q, res in json.load(open(f)).items():
            ok = res.get("hash_match") or (
                res.get("err") == "no_oracle"
                and res.get("spark_rows") is not None
            )
            if ok:
                last[q] = max(last.get(q, 0), r)
    return last, newest


def test_no_query_exceeds_staleness_horizon():
    from python_etl_pipeline_spark.queries import (
        _GATE_PREFIX,
        _GATE_ROUND,
        REGISTRY,
    )

    from python_etl_pipeline_spark.queries import _FIRST_ROUND

    last, _ = _last_verified(before_round=_GATE_ROUND)
    gate = set(_GATE_PREFIX)
    # A query registered AFTER its round's 50-slot gate was frozen
    # cannot hold a driver row yet; its staleness clock starts at
    # registration (last-verified = first_round - 1), so it is due a
    # gate slot by first_round + HORIZON - 1 — the same bound every
    # other query lives under, just not retroactive to round 0.
    overdue = sorted(
        q
        for q in REGISTRY
        if _GATE_ROUND - last.get(q, _FIRST_ROUND.get(q, 1) - 1)
        > STALENESS_HORIZON
        and q not in gate
    )
    assert not overdue, (
        f"gate round {_GATE_ROUND}: these queries have gone more than "
        f"{STALENESS_HORIZON} rounds without a driver CORRECTNESS row and "
        f"must be rotated into _GATE_PREFIX: {overdue}"
    )


def test_gate_round_is_current():
    """The gate must be built for the round in flight (newest recorded
    + 1) or the round just recorded (its own results landing must not
    invalidate it). A builder who never rotates goes red the moment
    their round's CORRECTNESS file is recorded."""
    from python_etl_pipeline_spark.queries import _GATE_ROUND

    _, newest = _last_verified(before_round=10**9)
    assert newest <= _GATE_ROUND <= newest + 1, (
        f"_GATE_ROUND={_GATE_ROUND} but CORRECTNESS files run to round "
        f"{newest}: define the round-{newest + 1} gate (rotate "
        f"_GATE_PREFIX and bump _GATE_ROUND in queries.py)"
    )


def test_gate_is_exactly_the_drivers_50_slots():
    from python_etl_pipeline_spark.queries import _GATE_PREFIX, REGISTRY

    assert len(_GATE_PREFIX) == len(set(_GATE_PREFIX)) == 50
    assert all(q in REGISTRY for q in _GATE_PREFIX)
