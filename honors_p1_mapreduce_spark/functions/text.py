"""Text scalar functions shared by the query library.

Tokenization parity: the reference tokenizes with ``\\b\\w+\\b`` on the
lowercased line (mr/examples/wordcount/mapper.py:8-11). We express the
same token stream as a split on runs of non-word characters — chosen
because it compiles to the *same* token sequence under both Java regex
(Spark) and RE2 (the DuckDB oracle), which ``\\b`` does not guarantee.

DELIBERATE DEVIATION (documented, not hidden): Python's ``\\w`` is
Unicode-aware while this ``[^a-z0-9_]+`` split treats non-ASCII
letters as separators (``'café'`` -> ``'caf'``). The deviation is
chosen on purpose: identical ASCII semantics in Spark and DuckDB is
what the oracle gate needs, Java/RE2 Unicode classes do NOT agree
with Python's, and the driver corpus is ASCII. A Unicode tokenizer
would swap ``[^a-z0-9_]+`` for ``[^\\p{L}\\p{N}_]+`` here and accept
engine-specific token streams on non-ASCII input.

All functions here are built-in column expressions (JVM-side,
whole-stage-codegen'd) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Runs of anything outside [a-z0-9_] after lower(); identical semantics
# in Java regex and RE2. Split can yield leading/trailing '' — filter it.
TOKEN_SPLIT_RE = "[^a-z0-9_]+"

# The same fragment for DuckDB oracle SQL strings.
TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9_]+'), t -> t <> '')"
)


def tokens_col(col: str | Column) -> Column:
    """lowercased word tokens of a text column, as array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def tokens_sql(col: str) -> str:
    return TOKENS_SQL.format(col=col)


def bigrams_from_tokens(toks: Column) -> Column:
    """array of 'w1 w2' adjacent-pair strings from a materialized token
    array (plain attribute — see ``shingles_col`` performance note)."""
    # slice BOTH sides to n-1: zip_with pads the shorter array with
    # nulls, which concat_ws silently drops -> phantom unigrams.
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )


def bigrams_col(col: str | Column) -> Column:
    """array of 'w1 w2' adjacent-pair strings (empty when < 2 tokens).
    Re-inlines the tokenizer ~5x; hot paths should project
    ``tokens_col`` first and use ``bigrams_from_tokens``."""
    return bigrams_from_tokens(tokens_col(col))


def bigrams_sql(col: str) -> str:
    """DuckDB twin of :func:`bigrams_col` (1-indexed lists)."""
    t = tokens_sql(col)
    return (
        f"CASE WHEN len({t}) < 2 THEN [] "
        f"ELSE list_transform(generate_series(1, len({t}) - 1), "
        f"i -> {t}[i] || ' ' || {t}[i + 1]) END"
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """array of n-gram word shingles from an ALREADY-MATERIALIZED token
    array column (ideally a plain attribute, see ``shingles_col``)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        )
    )


def shingles_col(col: str | Column, n: int = 3) -> Column:
    """array of n-gram word shingles ('w1 w2 w3'), distinct not applied.

    PERFORMANCE: this inlines the tokenizer into every ``element_at``
    of the shingle builder — O(n x shingles) tokenizations per row
    (measured 50s for 5k docs at n=5). Hot paths must instead project
    the token array once (``tokens_col(...).alias("toks")`` in its own
    select — CollapseProject keeps a non-cheap multiply-referenced
    alias in a separate projection) and call ``shingles_from_tokens``
    on the attribute; kept for small/one-off use and API compat.
    """
    return shingles_from_tokens(tokens_col(col), n)


def shingles_sql(col: str, n: int = 3) -> str:
    t = tokens_sql(col)
    parts = " || ' ' || ".join(f"{t}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({t}) < {n} THEN [] "
        f"ELSE list_transform(generate_series(1, len({t}) - {n - 1}), i -> {parts}) END"
    )
