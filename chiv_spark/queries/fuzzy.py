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
    # Dictionary optimization: edit distances are computed once per
    # DISTINCT name pair (the vocabulary is tiny next to the rows —
    # the classic entity-resolution move), then expanded back to key
    # pairs through two hash joins on name. The naive per-row pair
    # loop evaluates levenshtein rows²/blocks times (51s at sf0.1);
    # this shape does it vocab²/blocks times (~1s) with identical
    # output — the oracle stays the naive formulation as proof.
    named = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    names = named.select("name", "block").distinct()
    na, nb = names.alias("na"), names.alias("nb")
    d = F.levenshtein(F.col("na.name"), F.col("nb.name"))
    # ordered name pairs (both orientations + the diagonal): a key
    # pair (p, q) with p.k < q.k matches exactly the ordered pair
    # (p.name, q.name), whatever the name ordering
    cand = (
        na.join(nb, F.col("na.block") == F.col("nb.block"))
        .filter(d <= _MAX_DIST)
        .select(
            F.col("na.name").alias("n1"),
            F.col("nb.name").alias("n2"),
            d.cast("long").alias("dist"),
        )
    )
    a, b = named.alias("a"), named.alias("b")
    return (
        a.join(F.broadcast(cand), F.col("a.name") == F.col("n1"))
        .join(b, (F.col("b.name") == F.col("n2")) & (F.col("a.k") < F.col("b.k")))
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("dist"),
        )
    )
