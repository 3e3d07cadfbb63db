"""Vector math — native column expressions first, Arrow-batched UDFs second.

The reference computes cosine similarity with numpy inside per-document
Python loops (xlink.py:318-336). Here the default path is a pure column
expression (`F.zip_with` + `F.aggregate`) that stays JVM-side; a pandas UDF
variant exists for wide fan-out scoring where one Arrow batch amortizes
better. Both are deterministic (sequential element order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two array<numeric> columns (JVM-side)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm.

    Matches xlink.py:326/336 (`matmul/(norm*norm)`) with an explicit
    zero-norm guard the reference leaves to numpy warnings.
    """
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


@pandas_udf(DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine for wide scoring joins.

    Used when each batch carries many (entity_vec, ctx_vec) pairs of the same
    dimension — one vectorized numpy matmul per Arrow batch instead of one
    `aggregate` expression per row. Rows with nulls or zero norms score 0.
    """
    out = np.zeros(len(a), dtype=np.float64)
    mask = a.notna() & b.notna()
    if mask.any():
        av = np.stack(a[mask].to_numpy())
        bv = np.stack(b[mask].to_numpy())
        num = np.einsum("ij,ij->i", av, bv)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(den > 0, num / den, 0.0)
        out[mask.to_numpy()] = sims
    return pd.Series(out)


@pandas_udf(ArrayType(DoubleType()))
def mean_pool_udf(vecs: pd.Series) -> pd.Series:
    """GROUPED_AGG-free mean pool: input is array<array<float>> per row.

    Mean of a list of vectors; null/empty list → null (callers decide the
    empty-context convention — sim=0 for words xlink.py:319 vs sim=1 for
    entities on the has-prob path xlink.py:329).
    """

    def pool(v):
        if v is None or len(v) == 0:
            return None
        return np.mean(np.stack(v), axis=0).astype(np.float64).tolist()

    return vecs.map(pool)


def mean_pool_expr(vecs: Column | str) -> Column:
    """JVM-side mean pool of an array<array<float>> column.

    transpose-free: running elementwise sum via aggregate+zip_with, then
    divide by count. Null/empty → null.
    """
    c = _col(vecs)
    n = F.size(c)
    summed = F.aggregate(
        F.slice(c, 2, F.greatest(n - 1, F.lit(0))),
        F.transform(F.element_at(c, 1), lambda x: x.cast("double")),
        lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y.cast("double")),
    )
    return F.when(n > 0, F.transform(summed, lambda x: x / n)).otherwise(F.lit(None))
