"""honors_p1_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query surface of the reference
MapReduce framework (AmiBuch/honors-p1-mapreduce, surveyed in
/root/repo/SURVEY.md) as idiomatic Spark DataFrame / SQL plans, plus
the large-scale training-data-pipeline operators the reference lacks
(dedup, similarity search, multimodal columns, text analysis).

Design principles (SURVEY.md §7.1):
- DataFrame/SQL first; Catalyst/Tungsten/AQE do the physical planning.
- Deterministic everywhere (the reference's ``hash(key) % R`` shuffle
  bug — mr/worker/worker.py:108 — is deliberately NOT replicated).
- Every operator is a small composable ``(spark, sf_dir) -> DataFrame``
  registered in ``registry.QUERIES`` with a DuckDB oracle twin.
- 100 TB mindset: no collect()-shaped operators, broadcast hints for
  dimension tables, partial aggregation everywhere, AQE on.
"""

__version__ = "0.2.0"


def __getattr__(name):
    # lazy re-exports so `import honors_p1_mapreduce_spark` stays cheap
    if name in ("QUERIES", "ORACLES"):
        from . import registry

        return getattr(registry, name)
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    raise AttributeError(name)
