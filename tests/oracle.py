"""Local replica of the driver's Spark-vs-DuckDB correctness check:
row count, schema (column names), and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified)."""

from __future__ import annotations

import math

import duckdb

from honors_p1_mapreduce_spark.sources.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, sf_dir: str, query_fn, oracle: str | None) -> None:
    sdf = query_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if oracle is None:
        assert len(srows) >= 0
        return
    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(oracle)
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    assert sorted(scols) == sorted(dcols), f"schema: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount: {len(srows)} vs {len(drows)}"
    sn, dn = _norm_rows(scols, srows), _norm_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
