"""Cross-engine determinism helpers (SURVEY §2.0 — the binding rules).

Why this module exists: Spark's partial aggregation sums doubles in a
partition-dependent order, so a raw ``sum(double)`` is not reproducible across
runs, partition counts, or engines. Every money/metric aggregate in this engine
therefore flows through DECIMAL (exact, associative addition → identical under
any partitioning) and is only cast back to double *after* aggregation, when the
value is already exact. All fixture money columns are verified 2-decimal-place
doubles, so the DECIMAL(18,6) cast is exact (no rounding, no tie-break
divergence between engines).

Integer-typed outputs are widened to bigint because DuckDB's ``year()``,
``length()``, ``row_number()`` etc. return BIGINT where Spark returns INT —
schema comparison would otherwise fail even with identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Standard exact-money type. Precision 12 (not 38) on purpose: Spark backs
# decimals of precision ≤18 with an unscaled Long (primitive fast path inside
# whole-stage codegen); wider decimals fall back to Java BigDecimal and cost
# ~2-3× on aggregation-heavy scans. All fixture money columns are verified
# exact 2-dp values < 10^10, so (12,2) is lossless. The DuckDB oracles may use
# wider casts — both chains are exact, so the values (and the terminal double)
# are identical.
DEC = "decimal(12,2)"
# Rate factors like (1 - discount), (1 + tax): exact 2-dp values in [0.9, 1.1].
RATE = "decimal(4,2)"


def dec(col: Column | str) -> Column:
    """Exact decimal view of a (verified 2-dp) money double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def to_dbl(col: Column) -> Column:
    """Terminal cast of an exact decimal back to double for hash-stable output.

    An exact decimal maps to one well-defined nearest double; both engines
    perform the same correctly-rounded conversion, so the bits agree.
    """
    return col.cast("double")


def big(col: Column | str) -> Column:
    """Widen int-ish outputs to bigint to match DuckDB result types."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("bigint")


def charge(price: str = "l_extendedprice", discount: str = "l_discount", tax: str = "l_tax") -> Column:
    """TPC-H style charge = price * (1 - discount) * (1 + tax), computed exactly.

    Precision discipline — every intermediate stays ≤18 digits (Long-backed)
    with zero rounding: (12,2)*(4,2) -> (17,4), value < 1.1e6 so the (12,4)
    downcast is lossless; (12,4)*(4,2) -> (17,6) which is the exact 6-dp value.
    """
    one_minus = (F.lit(1) - dec(discount)).cast(RATE)
    one_plus = (F.lit(1) + dec(tax)).cast(RATE)
    return (dec(price) * one_minus).cast("decimal(12,4)") * one_plus


def cents(col: Column | str) -> Column:
    """Exact cents of a verified non-negative 2-dp double, in pure long/double
    codegen arithmetic (no per-row Decimal).

    The true value is an integer c with the stored double within ~1e-9·c of
    c/100, so x*100 lands within 1e-7 of the integer cents; adding 0.5 and
    truncating recovers it exactly. (A double→DECIMAL cast computes the same
    number ~5× slower.) Only valid for non-negative inputs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c * 100 + F.lit(0.5)).cast("bigint")


_SPLIT = 1_000_000


def sum_exact_long(c: Column) -> Column:
    """Exact, overflow-safe SUM of a non-negative bigint column, returned as an
    exact DECIMAL — at long-arithmetic speed.

    Spark's sum(DecimalType) pays per-row Decimal boxing + overflow checks
    (~5× a long sum). Instead we split each value at 10^6 and run two plain
    bigint sums (whole-stage-codegen longs), then reassemble hi*10^6+lo in
    decimal once per group. Overflow headroom at 100 TB: with per-row values
    ≤ 10^12, the hi/lo partial sums stay under int64 up to ~10^13 rows per
    group — two orders beyond a full 100 TB fact table in a single group.
    """
    lo = F.pmod(c, F.lit(_SPLIT))
    hi = ((c - lo) / F.lit(_SPLIT)).cast("bigint")  # exact: multiple of 10^6 < 2^53
    return (
        F.sum(hi).cast("decimal(18,0)") * F.lit(_SPLIT) + F.sum(lo).cast("decimal(18,0)")
    ).cast("decimal(28,0)")


# DuckDB-side SQL fragment mirroring charge()'s exact value (DuckDB's decimal
# kernels are fine with wider types; only the value must match, and both
# chains are exact).
CHARGE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(8,6))"
    " * CAST(1 + CAST(l_tax AS DECIMAL(18,6)) AS DECIMAL(8,6)) AS DECIMAL(18,6))"
)
