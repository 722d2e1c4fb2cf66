"""Skew-mitigation primitives (SURVEY §4 / task brief: "skewed keys hurt —
salting for skew, AQE for runtime re-plan").

AQE's skew-join split handles most cases at runtime; explicit salting is
the deterministic fallback for *known* hot keys — e.g. a mega-city in the
witness graph or an empty-string join key — where you don't want to depend
on runtime stats being fresh.

``salted_join`` replicates the small side R times and scatters the big
side's hot rows across R salt buckets, so one hot key becomes R parallel
tasks instead of one straggler.  Works for inner and left joins on one key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_big_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Scatter rows across n_salts buckets (deterministic per row via a
    stable hash of the whole row's key — xxhash64 of monotonically varying
    columns is fine because the salt only has to *spread*, not be stable
    across runs)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def explode_small_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each row once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Join ``big`` (skewed on ``on``) against ``small`` with salt
    replication: big shuffles on (key, salt) — hot keys split into n_salts
    partitions — while small is replicated n_salts×.  Result is identical
    to ``big.join(small, on, how)``."""
    b = salt_big_side(big, n_salts)
    s = explode_small_side(small, n_salts)
    return b.join(s, [on, SALT_COL], how).drop(SALT_COL)
