"""Closed-form calendar arithmetic (business-day distances).

SLA / lead-time analytics over the reference's order-style data need
"weekdays between two dates" — the naive form explodes a per-row date
sequence (O(span) rows per pair, a scale hazard); here it is a pure
O(1) integer expression that inlines into codegen and pushes through
filters on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Monday anchor: 1970-01-05 is a Monday, so (days since it) mod 7
# indexes Mon=0 .. Sun=6 with no engine-specific dayofweek convention
# (Spark's dayofweek is 1=Sunday, DuckDB's is 0=Sunday — bypassing
# both avoids an off-by-one that type-checks fine and corrupts every
# row).
_EPOCH_MONDAY = "1970-01-05"


def weekdays_from_anchor(d: Column) -> Column:
    """Number of weekdays (Mon-Fri) in the half-open interval
    [1970-01-05, d): ``5·(k div 7) + least(k mod 7, 5)`` where
    ``k = datediff(d, anchor)``. Exact integer closed form — valid
    for any date on or after the anchor."""
    k = F.datediff(d, F.lit(_EPOCH_MONDAY).cast("date"))
    # (k − k%7) is divisible by 7, so the double division is exact
    # and the cast back to long is lossless
    full_weeks = ((k - k % 7) / F.lit(7)).cast("long")
    return F.lit(5) * full_weeks + F.least(k % 7, F.lit(5)).cast("long")


def business_days_between(start: Column, end: Column) -> Column:
    """Count of business days (Mon-Fri) in the half-open interval
    (start, end]: 0 when end == start, antisymmetric-consistent when
    end < start (negative). Weekend endpoints are handled by the
    closed form itself — e.g. Friday→Monday is exactly 1.

    ``weekdays_from_anchor`` counts the half-open [anchor, d), so the
    (start, end] convention shifts both endpoints one day forward."""
    return (
        weekdays_from_anchor(F.date_add(end, 1))
        - weekdays_from_anchor(F.date_add(start, 1))
    ).cast("long")
