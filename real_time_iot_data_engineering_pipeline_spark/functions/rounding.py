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


# Quantization is meaningful only while the quantum exceeds the double's
# ULP: past |x| ~ 1e(15-n) a 10^-n grain is below x * 2^-52 and the rounding
# is vacuous — and Spark's floor(double)->LONG implementation saturates at
# 9.2e18 (zeroing NaN) while DuckDB's floor stays DOUBLE, so applying fround
# there DIVERGES the engines instead of aligning them.  The guarded variants
# quantize inside the meaningful range and pass the raw double through
# outside it (NaN/±Inf included: the NaN comparison is false in Spark and
# NaN sorts above every limit in DuckDB, so both take the pass-through arm).
# Use them when an operator's input domain is not bounded to feature-scale
# values (see q_kmeans_step; tests/test_hostile_embeddings.py).


def _guard_lim(n: int) -> float:
    return float(10 ** (15 - n))


def fround_guarded(c: Column, n: int = 4) -> Column:
    return F.when(F.abs(c) < F.lit(_guard_lim(n)), fround(c, n)).otherwise(c)


def fround_guarded_sql(expr: str, n: int = 4) -> str:
    return (
        f"(CASE WHEN abs({expr}) < 1e{15 - n} THEN {fround_sql(expr, n)} "
        f"ELSE ({expr}) END)"
    )
