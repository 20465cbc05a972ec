"""Skew-mitigation join helpers.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime by splitting oversized sort-merge partitions, but it cannot
help when a single join KEY is hot (one key's rows all hash to one
task no matter how partitions split) and the other side is too large
to broadcast outright. The classic fix is SALTING: fan the hot side's
key into ``n_salts`` sub-keys and replicate the matching rows of the
other side across all salts, turning one hot partition into
``n_salts`` even ones at the cost of replicating only the OTHER
side's matching rows.

``salted_inner_join`` implements the general form. Result equivalence
with the plain join is exact (tests/test_plan_shapes.py proves it on
a synthetically skewed frame): every (left, right) match still meets
on exactly one salt value — the one derived from the left row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_inner_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    join_hint: str | None = None,
) -> DataFrame:
    """Inner-join ``skewed`` with ``other`` on ``key``, salting the
    skewed side.

    - skewed side: salt = a deterministic hash of the ROW's other
      content is unnecessary — a uniform pseudo-random salt per row is
      enough; ``pmod(xxhash64(monotonically_increasing_id()), n)``
      would be nondeterministic across retries, so the salt derives
      from ``xxhash64`` of ALL columns (stable for a given row).
    - other side: each row replicates to every salt via a literal
      explode — its size grows ``n_salts``x, which is the explicit
      trade (use this when ``other`` matches few rows per key but is
      too big to broadcast whole).

    The join key becomes (key, salt): the hot key's rows now spread
    over ``n_salts`` partitions.

    ``join_hint`` (e.g. ``"shuffle_hash"``/``"merge"``) pins the
    physical strategy on the replicated side. At demo scale Spark
    would happily broadcast a small replicated side — correct, but
    then no key-partitioned shuffle exists and the salt proves
    nothing; the hint reproduces the production shape (other side too
    big to broadcast) so plan tests can assert the fan-out is real.
    """
    skewed_cols = [c for c in skewed.columns]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed_cols]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt.cast("int"))
    right = other.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    if join_hint:
        right = right.hint(join_hint)
    joined = left.join(right, [key, "_salt"])
    return joined.drop("_salt")
