"""Cross-engine result canonicalization — the ONE definition of how a
query result is normalized for order-insensitive exact comparison
against its DuckDB oracle (mirroring the driver's value-hash compare:
sort columns by name, normalize NaN, sort rows by repr).

Shared by ``tests/test_oracle_parity.py``,
``tests/test_adversarial_parity.py`` and
``scripts/verify_driver_surface.py`` — these used to carry three
hand-rolled copies, so a normalization change (nested-array NaN,
-0.0, Decimal coercion) landed in one and silently diverged the
others from the gate they claim to replicate (r16 review).
"""

from __future__ import annotations

import math


def norm_value(v):
    """NaN != NaN under tuple equality; both engines producing NaN
    must compare equal."""
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def rows_sorted(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Canonical form of a result set: values reordered by sorted
    column NAME, NaN-normalized, rows sorted by repr (repr keys the
    sort so mixed NULL/non-NULL columns stay orderable)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_value(r[i]) for i in idx) for r in rows), key=repr
    )
