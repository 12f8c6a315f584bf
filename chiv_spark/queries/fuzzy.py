"""Fuzzy string matching: blocked similarity self-join.

``join_fuzzy_levenshtein`` pairs part names within edit distance 3,
using *blocking* — candidates share their head noun (last name token),
so the quadratic distance evaluation runs per-block, never globally.
This is the entity-resolution join shape: at 100 TB the block key is
the only shuffle, block sizes bound the pairwise work, and a skewed
block is handled the same way the dedup tier handles hot LSH buckets
(AQE skew-split; or a second blocking attribute to sub-partition).

``levenshtein`` is a built-in JVM expression in Spark and a native
function in DuckDB with the same definition (unit-cost edit distance),
so the pair set and distances match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chiv_spark.queries.base import query, t

_MAX_DIST = 3


@query(
    "join_fuzzy_levenshtein",
    f"""
    WITH named AS (
      SELECT p_partkey AS k, p_name AS name,
             string_split(p_name, ' ')[-1] AS block
      FROM part)
    SELECT a.k AS key_a, b.k AS key_b,
           a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM named a JOIN named b
      ON a.block = b.block AND a.k < b.k
    WHERE levenshtein(a.name, b.name) <= {_MAX_DIST}
    """,
    doc="blocked fuzzy self-join: candidates share the head noun, "
    "verification is levenshtein <= 3; quadratic work is per-block only",
)
def join_fuzzy_levenshtein(spark, sf_dir):
    named = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    a, b = named.alias("a"), named.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.k") < F.col("b.k")))
        .filter(dist <= _MAX_DIST)
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.cast("long").alias("dist"),
        )
    )
