"""Cross-engine stable rounding.

Plain round(x, n) is NOT oracle-safe: an average of 2-decimal inputs often
lands exactly on a half-boundary (e.g. avg of 8 values = ...37875), and the
two engines' different summation orders leave the double 1 ULP on opposite
sides, flipping the rounded value and the driver's hash.

fround quantizes with a deterministic upward bias that is orders of magnitude
larger than any summation error (relative 1e-12 vs ~1e-14) yet orders of
magnitude smaller than the quantum, so BOTH engines land on the same side of
every boundary:

    fround(x, n) = floor(x * 10^n * (1 + 1e-12) + 0.5) / 10^n

Use it (and its SQL twin) for every float that is *derived* (avg, sum,
stddev, ratios, z-scores, cosines).  Raw column values and max/min need no
rounding — both engines see identical bits from the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BIAS = 1.0 + 1e-12


def fround(c: Column, n: int = 4) -> Column:
    s = float(10**n)
    return F.floor(c * F.lit(s) * F.lit(_BIAS) + F.lit(0.5)) / F.lit(s)


def fround_sql(expr: str, n: int = 4) -> str:
    s = f"1e{n}"
    return f"(floor(({expr}) * {s} * (1 + 1e-12) + 0.5) / {s})"
