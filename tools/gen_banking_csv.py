"""Deterministic messy banking-CSV generator (FIXTURES.md shapes).

Reproduces the reference dataset's scale and messiness — 25 branches,
~5k customers, ~2k loans, ~100k transactions (107k rows total, the
volume behind BASELINE.md's 50s end-to-end run) — with the documented
dirt: 2-digit-year dates, currency-decorated amounts, null sentinels,
mixed-case enums, duplicate PKs, quoted commas.

Usage: python tools/gen_banking_csv.py <out_dir> [scale=1.0]
"""

from __future__ import annotations

import csv
import random
import sys
from pathlib import Path

STATES = ["Maharashtra", "Delhi", "Punjab", "Karnataka", "Tamil Nadu",
          "West Bengal", "Bihar", "Gujarat", "Kerala", "Agra", "Bhopal"]
SENTINELS = ["NaN", "", "None", "N/A"]


def _date(rng: random.Random) -> str:
    d, m, y = rng.randint(1, 31), rng.randint(1, 12), rng.randint(1960, 2024)
    style = rng.random()
    if style < 0.4:
        return f"{d:02d}-{m:02d}-{y % 100:02d}"
    if style < 0.7:
        return f"{d:02d}-{m:02d}-{y}"
    if style < 0.9:
        return f"{y}-{m:02d}-{d:02d}"
    return f"{d:02d}/{m:02d}/{y}"


def _amount(rng: random.Random, lo: float, hi: float) -> str:
    v = rng.uniform(lo, hi)
    style = rng.random()
    if style < 0.3:
        return f"₹{v:,.2f}"
    if style < 0.4:
        return f"$ {v:,.2f}"
    return f"{v:.2f}"


def _maybe(rng: random.Random, value: str, p_dirty: float = 0.03) -> str:
    return rng.choice(SENTINELS) if rng.random() < p_dirty else value


def generate(out_dir: str, scale: float = 1.0) -> dict[str, int]:
    rng = random.Random(42)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_branches = 25
    n_customers = int(5022 * scale)
    n_loans = int(2006 * scale)
    n_txns = int(100_004 * scale)

    with open(out / "branches_1.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["branch_id", "branch_name", "city", "state", "manager_name"])
        for i in range(1, n_branches + 1):
            w.writerow([
                f"QT{i:04d}",
                rng.choice([f"Branch {i}", f"Viswanathan, Singh and B{i} Branch"]),
                f"city {i}",
                rng.choice(STATES),
                _maybe(rng, f"manager {i}", 0.05),
            ])

    with open(out / "customers_1.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["customer_id", "branch_id", "first_name", "last_name", "dob",
                    "gender", "email", "phone", "address", "account_open_date"])
        for i in range(1, n_customers + 1):
            cid = str(i if rng.random() > 0.01 else max(1, i - 1))  # dup PKs
            w.writerow([
                cid,
                _maybe(rng, f"QT{rng.randint(1, n_branches):04d}"),
                f"first{i}", f"last{i}",
                _maybe(rng, _date(rng)),
                rng.choice(["M", "F", "male", "Female", "f", "NaN", "x"]),
                f"USER{i}@Example.COM",
                f"{rng.randint(6_000_000_000, 9_999_999_999)}",
                f"{rng.randint(1,99)}/{rng.randint(100,999)}, Nagar-{rng.randint(100000,999999)}",
                _maybe(rng, _date(rng)),
            ])

    with open(out / "loans_1.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["loan_id", "customer_id", "loan_type", "loan_amount",
                    "interest_rate", "start_date", "end_date", "loan_status"])
        for i in range(1, n_loans + 1):
            w.writerow([
                str(i), str(rng.randint(1, n_customers)),
                rng.choice(["Car", "Education", "home", "Personal"]),
                _maybe(rng, _amount(rng, 10_000, 900_000)),
                f"{rng.uniform(5, 14):.2f}",
                _maybe(rng, _date(rng)),
                _maybe(rng, _date(rng)),
                _maybe(rng, rng.choice(["Active", "Closed", "Default"]), 0.05),
            ])

    with open(out / "transactions_1.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["transaction_id", "customer_id", "transaction_date",
                    "transaction_type", "amount", "balance_after", "fraud_flag"])
        for i in range(1, n_txns + 1):
            w.writerow([
                str(i), str(rng.randint(1, n_customers)),
                _date(rng),
                rng.choice(["deposit", "Withdrawal", "TRANSFER", "payment"]),
                _amount(rng, 10, 50_000),
                _amount(rng, 0, 200_000),
                rng.choice(["true", "1", "yes", "no", "0", "FALSE", ""]),
            ])

    return {
        "branches": n_branches, "customers": n_customers,
        "loans": n_loans, "transactions": n_txns,
    }


if __name__ == "__main__":
    out = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    counts = generate(out, scale)
    print(counts, "total:", sum(counts.values()))
