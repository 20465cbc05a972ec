"""Vector math over array<float>/array<double> columns, JVM-side.

All folds run in array-index order with double arithmetic, so results
are bit-identical across partitionings and match a sequential oracle.
No Python UDFs — these compile to Catalyst higher-order functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Index-ordered double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine similarity with CALLER-SUPPLIED norms (0.0 for zero-norm
    inputs). The one zero-guarded expression every precomputed-norm
    scoring path shares — a single source of truth so no path can
    drift from the others or from the oracle-side ``_cos_sql``
    builder. Pass ``na``/``nb`` as plain attributes materialized once
    per vector; the per-pair work is then just the dot fold."""
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (deterministic)."""
    return cosine_from_norms(a, b, l2_norm(a), l2_norm(b))


def lsh_band_buckets(n_bands: int, n_bits: int, seed: int = 42):
    """Random-hyperplane LSH bucketizer: vec -> array<int> of per-band
    bucket ids (sign bits of ``n_bits`` projections, packed).

    Arrow-batched pandas UDF — the sanctioned Python path: one numpy
    ``(batch, dim) @ (dim, n_bands*n_bits)`` matmul per Arrow batch
    instead of per-row Python. The projection matrix is derived from a
    fixed ``RandomState(seed)`` (MT19937 standard_normal: identical on
    every executor/run/platform, so bucketing is deterministic), built
    lazily per executor on first batch, sized to the incoming dim.
    """
    planes_cache: dict[int, np.ndarray] = {}  # per-executor, keyed by dim

    @pandas_udf("array<int>")
    def _buckets(vecs: "pd.Series") -> "pd.Series":
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        dim = mat.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = np.random.RandomState(seed).standard_normal(
                (dim, n_bands * n_bits)
            )
        bits = (mat @ planes_cache[dim]) > 0  # (batch, n_bands*n_bits)
        weights = 1 << np.arange(n_bits)  # pack each band's bits to an int
        per_band = bits.reshape(len(mat), n_bands, n_bits) @ weights
        return pd.Series([row.astype("int32").tolist() for row in per_band])

    return _buckets
