"""Skew-handling join utilities for the 100 TB path.

AQE's skew-join splitting covers sort-merge joins at runtime, but
broadcast-ineligible joins against *hot keys* (a handful of keys
holding most rows) still benefit from explicit salting: replicate the
small side R times, scatter the big side's hot keys across R salt
values, join on (key, salt). Results are identical to the unsalted
join; only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join with salt-scattered shuffle distribution.

    ``big`` gets a random-but-deterministic salt per row (hash of the
    full row's key + a uniform spread via monotonically increasing id
    is NOT used — pmod of xxhash on key+partition offset keeps rows of
    one hot key spread across ``salt_factor`` reducers); ``small`` is
    exploded ``salt_factor``× so every (key, salt) bucket finds its
    match. Output columns = the plain join's columns.
    """
    salt = F.pmod(F.xxhash64(F.col(key), F.spark_partition_id(), F.monotonically_increasing_id()), salt_factor)
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    joined = big_s.join(small_s, [key, "__salt"], how)
    return joined.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Top-N key frequencies with their share of total rows — the
    diagnostic you run before deciding to salt."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 4))
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
