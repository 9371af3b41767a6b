"""Vector math over `array<float>` columns — pure built-in expressions.

`F.zip_with` + `F.aggregate` keep the arithmetic JVM-side; everything is
cast to double before accumulation so Spark and the DuckDB oracle
(`list_cosine_similarity`, double math) agree to float64 precision.
A vectorized Pandas-UDF fallback exists in similarity/knn.py for the
brute-force path where NumPy BLAS beats per-element codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(_c(a)), _dbl(_c(b)), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(_c(a)), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
