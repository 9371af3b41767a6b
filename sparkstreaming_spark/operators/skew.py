"""Skew-handling join: key salting.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; explicit salting remains necessary when one hot key
dwarfs everything (power-law web/user data) or when the skewed side
feeds a streaming stateful op where AQE doesn't apply.

`salted_join(left, right, key, salt)`: the LEFT (skewed) side gets a
uniform random-ish salt in [0, salt); the RIGHT side is replicated
`salt` times via explode. The join key becomes (key, salt), spreading a
hot key over `salt` reducers. Replication is the price — use only on a
dimension-sized right side.

Salt derivation is deterministic (hash of a unique left column mod
salt), so results are reproducible and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    left_unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the left side salted `salt` ways."""
    salt_col = (
        F.pmod(F.xxhash64(F.col(left_unique_col)), F.lit(salt))
        if left_unique_col
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    l_salted = left.withColumn("__salt", salt_col.cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_replicated, [key, "__salt"], how)
    return out.drop("__salt")
