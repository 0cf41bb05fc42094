"""Order-independent exact aggregates — the cross-engine float contract.

The sf1-equivalent sweep (10x sf0.1, SURVEY §7.10) caught seven aggregate
queries whose ``round(sum(x), d)`` / ``round(avg(x), d)`` drifted 1 ulp
from the DuckDB oracle ONLY at that size: double sums of ~1e11 magnitude
need all 15-16 significant digits to survive a 4-decimal round, and
Spark's partial-aggregation order differs from DuckDB's sequential order.
Same three-failure-mode analysis as ``avg4_exact``
(operators/timeseries.py — the r5 sf0.1 fix this module generalizes):

1. float sums are not associative → quantize to a 1/q grid with
   ``floor(x*q + 0.5)`` (pure IEEE: multiply/add/floor are bit-identical
   in every engine; NOT round(), whose half-rule differs) and sum as
   exact int64 — integer addition IS associative, so the result cannot
   depend on partial order;
2. engine ``round(double, d)`` half-rules disagree exactly at
   representation boundaries → the final d-decimal round is the same
   floor form, never the engine's round();
3. quantized averages are rationals landing exactly on .5*10^-d
   boundaries far more often than generic floats — which is why mode 2
   must be fixed wherever mode 1 is.

Overflow budget: each QUANTIZED VALUE |x|*q must stay under 2^63 (the
int64 quantizer); the SUM of those values is carried as DECIMAL(38,0)
on the Spark side — the same ~1e38 headroom as the DuckDB twin's
HUGEINT promotion of sum(BIGINT) — so a group sum past 2^63 stays
exact on BOTH engines instead of Spark wrapping silently (ADVICE r5).
Decimal(38,0)->double and hugeint->double conversions are both
round-to-nearest of the same exact integer, so the downstream IEEE
ops still see bit-identical inputs. Callers pick q per column
(documented at each use).

Each helper has a ``*_SQL`` twin with IDENTICAL arithmetic so a DuckDB
oracle can mirror the Spark plan bit-for-bit; three-way fuzz (Spark ==
DuckDB == pure-IEEE replay) in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qlong(col: Column | str, q: int) -> Column:
    """``floor(x*q + 0.5)`` as int64 — the exact 1/q-grid quantizer.

    Null-propagating (a NULL input quantizes to NULL, so sum/count skip
    it exactly like the float aggregates they replace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(q)) + F.lit(0.5)).cast("long")


def _out_round(x: Column, out_dec: int) -> Column:
    p = 10.0**out_dec
    return F.floor(x * F.lit(p) + F.lit(0.5)) / F.lit(p)


def sum_exact(col: Column | str, q: int, out_dec: int = 4) -> Column:
    """Order-independent ``round(sum(col), out_dec)`` via an exact sum
    of 1/q-grid int64-quantized values, carried as DECIMAL(38,0) so the
    accumulator has the DuckDB twin's HUGEINT headroom (no silent int64
    wrap past 2^63)."""
    s = F.sum(qlong(col, q).cast("decimal(38,0)"))
    return _out_round(s / F.lit(float(q)), out_dec)


def avg_exact(col: Column | str, q: int, out_dec: int = 4) -> Column:
    """Order-independent ``round(avg(col), out_dec)``; NULL-safe
    (count(col), not count(*)) like the float avg it replaces. Sum is
    DECIMAL(38,0) — see sum_exact."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(qlong(c, q).cast("decimal(38,0)"))
    return _out_round(s / (F.count(c) * F.lit(float(q))), out_dec)


SUM_EXACT_SQL = (
    "floor(sum(CAST(floor(({c}) * {q} + 0.5) AS BIGINT))"
    " / {q} * 1e{d} + 0.5) / 1e{d}"
)

AVG_EXACT_SQL = (
    "floor(sum(CAST(floor(({c}) * {q} + 0.5) AS BIGINT))"
    " / (count({c}) * {q}) * 1e{d} + 0.5) / 1e{d}"
)


def sum_exact_sql(c: str, q: int, out_dec: int = 4) -> str:
    """DuckDB twin of sum_exact — same IEEE ops in the same order.
    ``{q}`` is emitted as a float literal so the division happens in
    double exactly like Spark's."""
    return SUM_EXACT_SQL.format(c=c, q=float(q), d=out_dec)


def avg_exact_sql(c: str, q: int, out_dec: int = 4) -> str:
    """DuckDB twin of avg_exact."""
    return AVG_EXACT_SQL.format(c=c, q=float(q), d=out_dec)
