"""Regression gate for the oracle-type class of driver failures.

The driver's value hash is type-class-sensitive: DuckDB HUGEINT
(Arrow decimal128(38,0)) vs Spark BIGINT hash differently even when
values agree — the exact failure mode of ``events_props_stats`` in
round 2 — while plain integer-width differences (int32 vs int64) are
tolerated (five r2 queries passed hash_match with a Spark int32
``rank`` against a DuckDB int64). The local stringified compare in
``tests/oracle.py`` cannot see any of that, so this test checks type
classes directly: every registered oracle is executed in DuckDB at
sf0.001 and its Arrow result schema is compared, column by column,
against the Spark query's plan schema (obtained without executing
the plan). Integer widths are normalized to one class; any
decimal-vs-integer or float-vs-integer divergence fails.
"""

from __future__ import annotations

import pytest

from honors_p1_mapreduce_spark import registry
from tests.conftest import SF_DIR
from tests.oracle import duckdb_connect

from pyspark.sql import types as T


def _canon_spark(dt: T.DataType) -> str:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{_canon_spark(dt.elementType)}>"
    return str(dt)


def _canon_arrow(at) -> str:
    import pyarrow as pa

    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_float64(at):
        return "float64"
    if pa.types.is_float32(at):
        return "float32"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return "binary"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_decimal(at):
        return f"decimal({at.precision},{at.scale})"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return f"list<{_canon_arrow(at.value_type)}>"
    return str(at)


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_dtypes_match_spark_schema(spark, name):
    con = duckdb_connect(SF_DIR)
    try:
        tbl = con.execute(registry.ORACLES[name]).arrow()
    finally:
        con.close()
    duck = {f.name: _canon_arrow(f.type) for f in tbl.schema}
    sdf = registry.QUERIES[name](spark, SF_DIR)
    sp = {f.name: _canon_spark(f.dataType) for f in sdf.schema.fields}
    assert sorted(duck) == sorted(sp), f"{name}: columns {sorted(duck)} vs {sorted(sp)}"
    bad = {c: (duck[c], sp[c]) for c in duck if duck[c] != sp[c]}
    assert not bad, f"{name}: dtype mismatches (duckdb, spark): {bad}"
