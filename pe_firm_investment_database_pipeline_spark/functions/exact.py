"""Exact-arithmetic helpers for cross-engine determinism.

The driver's correctness gate hashes result values after running the
same logical query in Spark and in DuckDB. Double-precision SUMs are
order-dependent in the last ulp, and the two engines aggregate in
different orders — so any plan whose output includes a raw
``sum(double)`` can hash-mismatch nondeterministically.

All money columns in the test tables carry exactly 2 decimals
(verified against /root/testdata: max |x*100 - round(x*100)| < 1e-8),
so we lift them to integer cents at the scan, aggregate in int64
(associative ⇒ order-insensitive ⇒ bit-identical in any engine), and
divide back to double only at the very end — identical integers
divided by an identical literal give identical doubles.

This costs nothing at scale: integer sums are cheaper than double
sums, and Catalyst still pushes the underlying column scans down.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """money(2dp) double -> exact integer cents (int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def pct(col: Column | str) -> Column:
    """rate with 2 decimals (e.g. l_discount 0.00-0.10) -> integer percent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def qty_int(col: Column | str) -> Column:
    """integer-valued double (l_quantity) -> int64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c).cast("long")


def cents_sum_money(cents_sum: Column, scale: int = 100) -> Column:
    """exact cents sum -> display double. Same int / same literal on
    both engines -> identical double."""
    return cents_sum / float(scale)
