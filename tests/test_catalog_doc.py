"""QUERIES.md freshness gate: the registry index is auto-generated
(tools/catalog.py); a registry change without a regenerated catalog
fails here — an index that can go stale is worse than none."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_queries_md_is_current():
    import catalog

    want = catalog.generate()
    got = (REPO / "QUERIES.md").read_text()
    assert got == want, (
        "QUERIES.md is stale — regenerate with `python tools/catalog.py`"
    )
