"""Oracle-exact numeric aggregation helpers.

The driver compares Spark results against a DuckDB oracle with an
order-insensitive *value hash* — but a plain ``SUM(double)`` is
order-DEPENDENT (IEEE addition is non-associative), so the same query
can produce hash-mismatching last-bits in the two engines.

Fix: sum through exact decimals. Per-row values are cast to a decimal
wide enough to represent them exactly-as-rounded, summed exactly, and
the total is cast back to double. Both engines then produce the
identical IEEE double regardless of row order or partitioning. The
per-row double->decimal rounding is itself engine-agnostic here: at
the scales used (2-6 fractional digits) a representable double can
never sit exactly on a decimal rounding boundary, so HALF_UP (Spark)
vs round-half-even (DuckDB) cannot disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum_col(col: str | Column, alias: str, scale: int = 2, precision: int = 18) -> Column:
    """Exact sum of a column via decimal, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double").alias(alias)
    )


def dsum_expr(expr: Column, alias: str, scale: int = 6, precision: int = 27) -> Column:
    """Exact sum of a computed (double) expression via decimal->double."""
    return dsum_col(expr, alias, scale=scale, precision=precision)


def dsum_sql(inner_sql: str, alias: str, scale: int = 6, precision: int = 27) -> str:
    """The DuckDB-side twin of :func:`dsum_expr` as a SQL fragment."""
    return (
        f"CAST(SUM(CAST(({inner_sql}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" AS {alias}"
    )
