"""Literal reference-example differential (E12 fidelity closure).

These tests import the reference's shipped example mapper/reducer
SOURCES byte-for-byte from /root/reference (read-only) and run them —
unmodified — through this engine's ``map_reduce`` escape hatch on the
reference's own ``shakespeare.txt`` fixture, then assert equality
with (a) an in-process pure-Python execution of the same sources (the
ground truth for "what the reference's worker would compute":
mapreduce-reference/worker/worker.py applies mapper per line and
reducer per key-group exactly like this), and (b) where a native
Catalyst query exists, its output on the same lines.

Also replays the reference's own integration golden
(mapreduce-reference/tests/test_mapreduce.py:79-82: hello=2, world=2,
python=1, mapreduce=1 on its 3-line fixture) through the literal
example sources.

shakespeare.txt contains no non-ASCII word characters, so the
reference's ``\\b\\w+\\b`` tokenizer and the engine's documented
ASCII-split tokenizer (functions/text.py) produce identical token
streams here — which is what lets (b) assert strict equality.
"""

from __future__ import annotations

import importlib.util
import os
from collections import defaultdict
from pathlib import Path

import pytest

from honors_p1_mapreduce_spark.mapreduce import map_reduce

REF = Path("/root/reference/mapreduce-reference")
EXAMPLES = REF / "examples"
SHAKESPEARE = EXAMPLES / "data" / "shakespeare.txt"

pytestmark = pytest.mark.skipif(
    not EXAMPLES.exists(), reason="reference checkout not present"
)


def _load(path: Path, name: str):
    """Import a reference example module from its file, untouched."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_inprocess(mapper, reducer, lines: list[str]) -> dict[str, str]:
    """The reference worker's semantics, in-process: mapper per line,
    group by key, reducer per (key, value-multiset)."""
    groups: dict[str, list[str]] = defaultdict(list)
    for line in lines:
        for k, v in mapper(line):
            groups[str(k)].append(str(v))
    out: dict[str, str] = {}
    for k, vals in groups.items():
        for rk, rv in reducer(k, vals):
            out[str(rk)] = str(rv)
    return out


def _lines() -> list[str]:
    return SHAKESPEARE.read_text(encoding="utf-8").splitlines()


def _mr_dict(spark, lines: list[str], mapper, reducer) -> dict[str, str]:
    df = spark.createDataFrame([(ln,) for ln in lines], ["line"])
    got = map_reduce(df, mapper, reducer, num_partitions=4)
    return {r["key"]: r["value"] for r in got.collect()}


def test_literal_wordcount_on_shakespeare(spark):
    m = _load(EXAMPLES / "wordcount" / "mapper.py", "ref_wc_mapper")
    r = _load(EXAMPLES / "wordcount" / "reducer.py", "ref_wc_reducer")
    lines = _lines()
    got = _mr_dict(spark, lines, m.mapper, r.reducer)
    want = _run_inprocess(m.mapper, r.reducer, lines)
    assert got == want
    # native Catalyst wordcount over the same lines agrees token-for-token
    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.functions.text import tokens_col

    native = {
        row["word"]: str(row["cnt"])
        for row in spark.createDataFrame([(ln,) for ln in lines], ["line"])
        .select(F.explode(tokens_col("line")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == native


def test_literal_wordcount_reference_golden(spark):
    """The reference integration golden, byte-for-byte sources:
    tests/test_mapreduce.py:79-82."""
    m = _load(EXAMPLES / "wordcount" / "mapper.py", "ref_wc_mapper_g")
    r = _load(EXAMPLES / "wordcount" / "reducer.py", "ref_wc_reducer_g")
    lines = ["hello world", "hello python", "world of mapreduce"]
    got = _mr_dict(spark, lines, m.mapper, r.reducer)
    assert got["hello"] == "2"
    assert got["world"] == "2"
    assert got["python"] == "1"
    assert got["mapreduce"] == "1"


def test_literal_grep_on_shakespeare(spark):
    # the grep example reads GREP_PATTERN at import time; 'the' gives a
    # meaningful match set on this fixture (38 lines)
    os.environ["GREP_PATTERN"] = "the"
    try:
        m = _load(EXAMPLES / "grep" / "mapper.py", "ref_grep_mapper")
    finally:
        del os.environ["GREP_PATTERN"]
    r = _load(EXAMPLES / "grep" / "reducer.py", "ref_grep_reducer")
    lines = _lines()
    got = _mr_dict(spark, lines, m.mapper, r.reducer)
    want = _run_inprocess(m.mapper, r.reducer, lines)
    assert got == want
    assert len(got) > 0  # the pattern really matched
    # independent check of the match-set size (case-insensitive search)
    import re

    matched = {ln.strip() for ln in lines if re.search("the", ln, re.IGNORECASE)}
    assert set(got) == matched


def test_literal_inverted_index_on_shakespeare(spark):
    m = _load(EXAMPLES / "inverted_index" / "mapper.py", "ref_ii_mapper")
    r = _load(EXAMPLES / "inverted_index" / "reducer.py", "ref_ii_reducer")
    # the example expects "doc_id: content" lines; number the fixture
    lines = [f"doc_{i}: {ln}" for i, ln in enumerate(_lines())]
    got = _mr_dict(spark, lines, m.mapper, r.reducer)
    want = _run_inprocess(m.mapper, r.reducer, lines)
    assert got == want
    # the native reference-exact variant agrees on the same lines
    from honors_p1_mapreduce_spark.operators.inverted_index import (
        inverted_index_from_lines,
    )

    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    native = {
        row["word"]: row["doc_ids"]
        for row in inverted_index_from_lines(spark, df).collect()
    }
    assert got == native
