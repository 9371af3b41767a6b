"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
data skipping.

Why it matters at 100 TB: parquet scans skip row groups whose column
min/max stats exclude the predicate. A sort on ONE column gives perfect
skipping on that column and none on any other; interleaving the bits of
several columns (Z-order) gives good-not-perfect skipping on ALL of them
— the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, implemented here
with plain Spark primitives:

    zval = interleave(bits(norm(a)), bits(norm(b)))
    df.repartitionByRange(n_files, zval).sortWithinPartitions(zval).write

repartitionByRange samples zval to build balanced range boundaries (one
pass + one shuffle — the same cost as any global sort), and every output
file then covers a compact Z-curve segment, i.e. a small rectangle in
(a, b) space, so both columns' file-level stats become selective.

The bit-mapping is a codegen'd expression (shift/and/or terms, same
pattern as dedup/simhash.py's fingerprint assembly) — no UDF, no Python
in the hot path. Normalization uses caller-supplied (lo, hi) bounds:
layout jobs know their domains (or read them from table stats); sampling
them inside the operator would add a pass without changing the plan
shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # max per-dimension resolution; 2 dims × 16 bits = 32-bit zval


def _normalized_bits(col: str, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column to an integer in [0, 2^bits)."""
    scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(
        float(hi) - float(lo)
    )
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return (clamped * F.lit((1 << bits) - 1)).cast("bigint")


def zorder_value(cols: Sequence[tuple[str, float, float]]) -> Column:
    """Morton code over (col, lo, hi) dimensions — bits interleaved
    round-robin so the curve weights each dimension equally.

    Per-dim resolution is min(BITS, 63 // n_dims) so the interleaved code
    never reaches bit 63 (the bigint sign bit): at 16 bits/dim, 4+ dims
    would shift into the sign, flipping high-coordinate zvals negative and
    scrambling the curve order. 63 // 4 = 15 bits keeps the code positive
    at any dimensionality while losing at most 1 bit of resolution."""
    nd = len(cols)
    if nd == 0:
        raise ValueError("zorder_value needs at least one dimension")
    bits = min(BITS, 63 // nd)
    dims = [_normalized_bits(c, lo, hi, bits) for c, lo, hi in cols]
    terms = None
    for d_idx, dim in enumerate(dims):
        for bit in range(bits):
            t = F.shiftleft(
                F.shiftright(dim, bit).bitwiseAND(F.lit(1)),
                bit * nd + d_idx,
            )
            terms = t if terms is None else terms + t
    return terms.cast("bigint")


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle-v1",
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic global training-order shuffle, sharded.

    A training run needs the corpus in a reproducible pseudo-random order,
    written as shards it can stream. The scalable form is NOT a global
    `ORDER BY rand()` (one total-order sort, seed+layout dependent) but:

        key   = md5_64(salt || id)           -- stable pseudo-random rank
        shard = key % n_shards               -- which output shard
        pos   = row_number() over (partition by shard order by key, id)

    One hash-partition shuffle + a per-shard local sort: at 100 TB with
    n_shards sized so a shard ≈ one output file (e.g. 100k shards ⇒ ~1 GB
    each), the sort never leaves a task, no range-boundary sampling pass,
    and re-running on a re-partitioned or incrementally-grown corpus
    reproduces identical (shard, pos) for existing rows' ids under the
    same salt. The id tiebreak makes the order total even on the
    ~2^-60-probability hash collision.

    Returns df + (shard int, pos long). Reuses the engine-wide md5_64
    convention (functions/text.py) so the DuckDB oracle is bit-exact.
    """
    from pyspark.sql import Window

    from ..functions.text import md5_64

    key = md5_64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (
        df.withColumn("__key", key)
        .withColumn("shard", (F.col("__key") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__key")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, float, float]],
    n_files: int = 16,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of `cols`."""
    (
        df.withColumn("__z", zorder_value(cols))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_value(cols: Sequence[tuple[str, float, float]]) -> Column:
    """Hilbert-curve index over exactly TWO (col, lo, hi) dimensions —
    the higher-locality alternative to zorder_value: the Hilbert curve
    never makes the long diagonal jumps of the Z curve, so file-level
    min/max boxes are tighter for the same file count (what Delta's
    OPTIMIZE switched to with liquid clustering).

    Implemented as the classic xy2d bit-rotation walk (public-domain
    algorithm) expressed as an F.aggregate fold over the 16 bit levels —
    per-row integer arithmetic, no UDF, no shuffle; the layout write
    then range-partitions on the value exactly like write_zordered.
    Iterative rotation state isn't SQL-expressible in one pass, so this
    carries a pure-Python reference parity test instead of a DuckDB
    oracle (tests/test_scale_patterns.py)."""
    if len(cols) != 2:
        raise ValueError("hilbert_value supports exactly 2 dimensions")
    (cx, lox, hix), (cy, loy, hiy) = cols
    bits = BITS
    x0 = _normalized_bits(cx, lox, hix, bits)
    y0 = _normalized_bits(cy, loy, hiy, bits)
    levels = F.array([F.lit(1 << i).cast("bigint") for i in range(bits - 1, -1, -1)])
    init = F.struct(
        x0.alias("x"), y0.alias("y"), F.lit(0).cast("bigint").alias("d")
    )

    def step(acc: Column, s: Column) -> Column:
        rx = (
            F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        ry = (
            F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        d2 = acc["d"] + s * s * (F.lit(3) * rx).bitwiseXOR(ry)
        x_ref = F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        y_ref = F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, y_ref).otherwise(acc["x"])
        ny = F.when(ry == 0, x_ref).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(levels, init, step, lambda a: a["d"])


def hilbert_xy2d_py(bits: int, x: int, y: int) -> int:
    """Pure-Python reference for hilbert_value (same public algorithm);
    parity-tested against the expression fold."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, float, float]],
    n_files: int = 64,
) -> None:
    """Hilbert-clustered parquet layout (same write shape as
    write_zordered: one range shuffle, local sort, file-compact curves)."""
    keyed = df.withColumn("__hv", hilbert_value(cols))
    (
        keyed.repartitionByRange(n_files, "__hv")
        .sortWithinPartitions("__hv")
        .drop("__hv")
        .write.mode("overwrite")
        .parquet(path)
    )
