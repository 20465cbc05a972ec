"""Property-based tests (hypothesis) — a deliberate upgrade over the
reference's golden-only test strategy (SURVEY.md §5: "No
property-based testing").

Each property runs ONE Spark job over a hypothesis-generated batch of
rows (batching keeps JVM round trips off the per-example hot path).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.functions.text import (
    bigrams_from_tokens,
    tokens_col,
)
from honors_p1_mapreduce_spark.mapreduce import map_reduce

# printable-ish ASCII lines, including regex metacharacters and
# whitespace runs — the tokenizer contract is ASCII by design
# (functions/text.py module docstring)
LINES = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=60,
    ),
    min_size=1,
    max_size=25,
)

_PY_TOKEN = re.compile(r"[a-z0-9_]+")

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_tokens(line: str) -> list[str]:
    return _PY_TOKEN.findall(line.lower())


@SLOW
@given(LINES)
def test_tokenizer_matches_python_reference(spark, lines):
    """Spark token stream == the Python re-based reference semantics
    on arbitrary ASCII input (one job per example batch)."""
    df = spark.createDataFrame([(ln,) for ln in lines], "text string")
    got = [r.toks for r in df.select(tokens_col("text").alias("toks")).collect()]
    # row order of createDataFrame is preserved for local data
    assert got == [_py_tokens(ln) for ln in lines]


@SLOW
@given(LINES)
def test_bigrams_are_adjacent_token_pairs(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "text string")
    got = [
        r.bg
        for r in df.select(tokens_col("text").alias("toks"))
        .select(bigrams_from_tokens(F.col("toks")).alias("bg"))
        .collect()
    ]
    for ln, bg in zip(lines, got):
        toks = _py_tokens(ln)
        assert bg == [f"{a} {b}" for a, b in zip(toks, toks[1:])]


@SLOW
@given(LINES)
def test_map_reduce_wordcount_matches_python(spark, lines):
    """The generic escape hatch computes exactly what the equivalent
    pure-Python MapReduce computes, for arbitrary input."""
    from collections import Counter

    def mapper(line):
        for t in _py_tokens(line):
            yield t, 1

    def reducer(key, values):
        yield key, sum(int(v) for v in values)

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got = {
        (r.key, r.value)
        for r in map_reduce(df, mapper, reducer, num_partitions=2).collect()
    }
    want = Counter(t for ln in lines for t in _py_tokens(ln))
    assert got == {(k, str(v)) for k, v in want.items()}
