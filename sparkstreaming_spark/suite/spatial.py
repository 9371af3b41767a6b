"""Spatial proximity: grid-bucketed radius self-join.

The standard distributed spatial-join pattern (geohash / uber-H3
bucketing reduced to its essence): hash every point to a grid cell
whose side equals the search radius, replicate each LEFT point to its
3x3 cell neighborhood, equi-join on cell, then apply the exact distance
predicate. Replication factor is a constant 9 versus the O(n^2)
all-pairs join — the difference between feasible and not at 100 TB of
points. The oracle IS the all-pairs join (fine at sf0.01), so the test
proves the bucketed plan loses no pairs.

Points are derived deterministically from user ids (md5_64 — the
engine-wide cross-engine-stable hash, functions/text.py:81) because the
testdata has no native coordinates; both engines derive the identical
integer grid, and the distance predicate is EXACT integer arithmetic
(squared distance), so the oracle is bit-exact with no float tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_64
from ..sources.batch import read_table
from . import QuerySpec

GRID = 1000  # points live on a GRID x GRID integer lattice
RADIUS = 25  # search radius; also the cell side (|dx|<=r => cells differ <=1)


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    x = md5_64(F.concat(F.lit("geo-x:"), F.col("user_id").cast("string"))) % GRID
    y = md5_64(F.concat(F.lit("geo-y:"), F.col("user_id").cast("string"))) % GRID
    return users.select("user_id", x.alias("x"), y.alias("y"))


def q_geo_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All user pairs within RADIUS on the synthetic lattice.

    LEFT side replicates to its 3x3 neighbor cells (explode of a 9-entry
    in-row array — narrow, before any shuffle); RIGHT side keys by its
    own cell; the equi-join on (cx, cy) is an ordinary hash join Catalyst
    can shuffle OR broadcast. `a.user_id < b.user_id` emits each
    unordered pair exactly once (the mirrored match lands in the mirrored
    cell expansion and is killed by the inequality)."""
    pts = _points(spark, sf_dir)
    cell = [(F.col("x") / RADIUS).cast("bigint"), (F.col("y") / RADIUS).cast("bigint")]
    right = pts.select(
        F.col("user_id").alias("user_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cell[0].alias("cx"),
        cell[1].alias("cy"),
    )
    nbr = F.explode(
        F.expr(
            "flatten(transform(sequence(-1, 1), dx -> "
            "transform(sequence(-1, 1), dy -> struct(dx, dy))))"
        )
    ).alias("d")
    left = (
        pts.select(
            F.col("user_id").alias("user_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            cell[0].alias("ca"),
            cell[1].alias("cb"),
        )
        .select("*", nbr)
        .select(
            "user_a",
            "xa",
            "ya",
            (F.col("ca") + F.col("d.dx")).alias("cx"),
            (F.col("cb") + F.col("d.dy")).alias("cy"),
        )
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("user_a") < F.col("user_b"))
        .filter(d2 <= RADIUS * RADIUS)
        .select("user_a", "user_b", d2.cast("bigint").alias("dist2"))
    )


ORACLE_GEO_NEIGHBORS = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
p AS (
  SELECT user_id,
         cast(('0x' || substr(md5('geo-x:' || cast(user_id AS varchar)), 1, 15))
              AS bigint) % {GRID} AS x,
         cast(('0x' || substr(md5('geo-y:' || cast(user_id AS varchar)), 1, 15))
              AS bigint) % {GRID} AS y
  FROM u
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM p a JOIN p b ON a.user_id < b.user_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {RADIUS * RADIUS}
"""


QUERIES: dict[str, QuerySpec] = {
    "geo_radius_pairs": QuerySpec(
        q_geo_neighbors,
        ORACLE_GEO_NEIGHBORS,
        "grid-bucketed radius self-join (9x replication vs all-pairs oracle)",
    ),
}
