"""Local stand-in for the driver's DuckDB differential check:
row count + column-name set + order-insensitive value comparison,
columns sorted by name (driver contract in __spark_entry__.py)."""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            out[c] = pd.to_datetime(col).dt.floor("ms").astype("datetime64[ms]")
        elif pd.api.types.is_float_dtype(col):
            out[c] = col.astype("float64")
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.astype("Int64")
    out = out.sort_values(by=list(out.columns), ignore_index=True, na_position="last")
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            for i, (x, y) in enumerate(zip(av, bv)):
                xnan = x is None or (isinstance(x, float) and math.isnan(x))
                ynan = y is None or (isinstance(y, float) and math.isnan(y))
                if xnan and ynan:
                    continue
                assert not (xnan or ynan), f"{name}.{c}[{i}]: {x!r} vs {y!r}"
                assert math.isclose(x, y, rel_tol=0, abs_tol=1e-9), (
                    f"{name}.{c}[{i}]: {x!r} vs {y!r}"
                )
        else:
            sa = av.astype(str).tolist()
            sb = bv.astype(str).tolist()
            assert sa == sb, (
                f"{name}.{c}: first diff at "
                f"{next((i for i, (x, y) in enumerate(zip(sa, sb)) if x != y), -1)}: "
                f"{[(x, y) for x, y in zip(sa, sb) if x != y][:5]}"
            )
