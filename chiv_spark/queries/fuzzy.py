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


# --------------------------------------------------------------------------
# join_fuzzy_levenshtein_capped — the bounded-output twin (r13 verdict
# task 5): head-noun blocks grow LINEARLY with the corpus, so the
# per-block quadratic (and the 11M-row pair output at sf0.1) grows
# quadratically at 100x. The twin sub-blocks by length band
# (levenshtein <= 3 implies |len(a)-len(b)| <= 3, so a band of width 8
# keeps most true pairs co-located) and then caps each sub-block at a
# DETERMINISTIC member sample — rank by stable hash, keep the first
# _FZ_CAP (the dedup_lsh_quarantine_rescue representative precedent:
# keep a bounded deterministic subset rather than drop the whole
# saturated bucket, since a fuzzy-matched entity has no 'other band'
# to survive through). Work and output are bounded by
# n_sub_blocks * cap^2 / 2 regardless of corpus size; what the cap
# drops is quantified by join_fuzzy_capped_report, never hidden.

#: per-(head noun, length band) member cap — small enough to bite on
#: both test scale factors (sub-blocks hold ~60-80 rows at sf0.01 and
#: ~600-800 at sf0.1), so the oracle provably replicates the cap
_FZ_CAP = 64

#: length-band width (> MAX_DIST, so most dist<=3 pairs share a band)
_FZ_LEN_W = 8

_FZ_RANK_SQL = (
    "ROW_NUMBER() OVER (PARTITION BY block, lb ORDER BY "
    "(('0x' || substring(md5('fzcap:' || k::VARCHAR), 1, 15))::BIGINT), k)"
)

_FZ_NAMED_SQL = f"""
      SELECT p_partkey AS k, p_name AS name,
             string_split(p_name, ' ')[-1] AS block,
             length(p_name) // {_FZ_LEN_W} AS lb
      FROM part"""


@query(
    "join_fuzzy_levenshtein_capped",
    f"""
    WITH named AS ({_FZ_NAMED_SQL}),
    ranked AS (SELECT *, {_FZ_RANK_SQL} AS rk FROM named),
    kept AS (SELECT * FROM ranked WHERE rk <= {_FZ_CAP})
    SELECT a.k AS key_a, b.k AS key_b,
           a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM kept a JOIN kept b
      ON a.block = b.block AND a.lb = b.lb AND a.k < b.k
    WHERE levenshtein(a.name, b.name) <= {_MAX_DIST}
    """,
    doc="capped-block fuzzy self-join (r13 verdict task 5 — "
    f"join_fuzzy_levenshtein emits 11M rows at sf0.1 and its "
    "per-block quadratic grows quadratically with the corpus): "
    "sub-block on (head noun, length//8 band — edit distance <= 3 "
    f"bounds the length gap at 3), keep a deterministic {_FZ_CAP}-"
    "member stable-hash sample per sub-block (the quarantine-rescue "
    "representative precedent — never drop a whole saturated bucket, "
    "a fuzzy entity has no other band to survive through), pair "
    "within the kept sample only. Work AND output are bounded by "
    "n_sub_blocks * cap^2/2 at any corpus size; the PARTITIONED "
    "rank window and the sub-block equi-join are the only shuffles. "
    "Oracle replicates the rank and cap exactly, so the recall trade "
    "is pinned, not hidden; join_fuzzy_capped_report quantifies it",
)
def join_fuzzy_levenshtein_capped(spark, sf_dir):
    return capped_fuzzy_pairs(spark, sf_dir, _FZ_CAP)


def capped_fuzzy_pairs(spark, sf_dir, cap: int = _FZ_CAP):
    """The capped join body with the cap as a parameter — the
    registered row pins cap = _FZ_CAP; tools/fuzzy_cap_curve.py walks
    the ladder to measure the recall/cost curve the autotune row's
    bounds predict."""
    from pyspark.sql import Window

    from chiv_spark.functions.hashing import hash64

    named = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
        F.expr(f"CAST(length(p_name) AS INT) div {_FZ_LEN_W}").alias("lb"),
    )
    rk = F.row_number().over(
        Window.partitionBy("block", "lb").orderBy(
            hash64(F.concat(F.lit("fzcap:"), F.col("k").cast("string"))), F.col("k")
        )
    )
    kept = named.withColumn("rk", rk).filter(F.col("rk") <= cap)
    a, b = kept.alias("a"), kept.alias("b")
    d = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .filter(d <= _MAX_DIST)
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            d.cast("long").alias("dist"),
        )
    )


@query(
    "join_fuzzy_capped_report",
    f"""
    WITH named AS ({_FZ_NAMED_SQL})
    SELECT block, CAST(lb AS BIGINT) AS len_band,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(LEAST(COUNT(*), {_FZ_CAP}) AS BIGINT) AS n_kept,
           CAST(GREATEST(COUNT(*) - {_FZ_CAP}, 0) AS BIGINT) AS n_capped,
           COUNT(*) > {_FZ_CAP} AS saturated
    FROM named GROUP BY block, lb
    """,
    doc="sub-block saturation audit for the capped fuzzy join: per "
    "(head noun, length band), membership, how many members the "
    f"deterministic {_FZ_CAP}-cap keeps, and how many it drops — the "
    "report a production pipeline reads to SET the cap dial and to "
    "monitor entity-flood regressions between runs (the "
    "dedup_lsh_bucket_report pattern). One hash agg on the block "
    "keys; no join, no window",
)
def join_fuzzy_capped_report(spark, sf_dir):
    named = t(spark, sf_dir, "part").select(
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
        F.expr(f"CAST(length(p_name) AS INT) div {_FZ_LEN_W}").alias("lb"),
    )
    return named.groupBy("block", "lb").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.least(F.count(F.lit(1)), F.lit(_FZ_CAP)).cast("long").alias("n_kept"),
        F.greatest(F.count(F.lit(1)) - _FZ_CAP, F.lit(0)).cast("long").alias("n_capped"),
        (F.count(F.lit(1)) > _FZ_CAP).alias("saturated"),
    ).select(
        "block",
        F.col("lb").cast("long").alias("len_band"),
        "n_members",
        "n_kept",
        "n_capped",
        "saturated",
    )


# --------------------------------------------------------------------------
# join_fuzzy_cap_autotune — saturation-aware cap tuning (r14 verdict
# task 8): _FZ_CAP was a constant; this row turns it into an
# evidence-backed knob. From the capped report's sufficient
# statistics alone (per-sub-block membership — ONE hash agg, no join,
# no pairwise work), it evaluates a ladder of candidate caps: members
# kept/dropped, the drop rate, the pair-work upper bound
# sum(min(m, cap) choose 2) that bounds BOTH output volume and join
# cost at any corpus size, and how many sub-blocks saturate. The
# recommended cap is the smallest whose member drop-rate stays within
# _FZ_DROP_TARGET (falling back to the ladder's largest when none
# qualifies — the report then says the target itself is infeasible at
# this corpus shape). The sweep runs this at both SFs, so the curve
# is committed evidence, not a one-off; tools/fuzzy_cap_curve.py adds
# the MEASURED pair-recall/cost curve for SCALING.md.

#: candidate cap ladder around the production default (_FZ_CAP = 64)
_FZ_CAP_LADDER = [16, 32, 64, 128, 256, 512]

#: member drop-rate budget the recommendation enforces
_FZ_DROP_TARGET = 0.25


def _cap_autotune_oracle() -> str:
    from chiv_spark.functions.detmath import duckdb_det_round

    ladder = ", ".join(str(c) for c in _FZ_CAP_LADDER)
    return f"""
    WITH named AS ({_FZ_NAMED_SQL}),
    blocks AS (SELECT block, lb, COUNT(*) AS m FROM named GROUP BY block, lb),
    caps AS (SELECT unnest([{ladder}]) AS cap),
    curve AS (
      SELECT cap,
             CAST(SUM(LEAST(m, cap)) AS BIGINT) AS n_kept_members,
             CAST(SUM(GREATEST(m - cap, 0)) AS BIGINT) AS n_dropped_members,
             CAST(SUM((LEAST(m, cap) * (LEAST(m, cap) - 1)) // 2) AS BIGINT)
               AS bound_pairs,
             CAST(SUM(CASE WHEN m > cap THEN 1 ELSE 0 END) AS BIGINT)
               AS saturated_blocks
      FROM blocks CROSS JOIN caps GROUP BY cap),
    rated AS (
      SELECT *,
             {duckdb_det_round("n_dropped_members / CAST(n_kept_members + n_dropped_members AS DOUBLE)")}
               AS drop_rate
      FROM curve),
    pick AS (
      SELECT COALESCE(MIN(CASE WHEN drop_rate <= {_FZ_DROP_TARGET} THEN cap END),
                      MAX(cap)) AS rec
      FROM rated)
    SELECT CAST(cap AS BIGINT) AS cap, n_kept_members, n_dropped_members,
           drop_rate, bound_pairs, saturated_blocks,
           drop_rate <= {_FZ_DROP_TARGET} AS meets_target,
           cap = pick.rec AS recommended
    FROM rated, pick
    """


@query(
    "join_fuzzy_cap_autotune",
    None,  # oracle attached below (needs _cap_autotune_oracle())
    doc="saturation-aware CAP AUTO-TUNING for the capped fuzzy join "
    "(r14 verdict task 8 — the LSH bucket-cap precedent applied to "
    "the fuzzy dial): evaluates a cap ladder from the sub-block "
    "membership statistics ALONE — members kept/dropped and drop "
    "rate per candidate cap, the pair-work upper bound "
    "sum(min(m,cap) choose 2) that bounds output and join cost at "
    "any corpus size, saturated-block counts — and recommends the "
    "smallest cap whose member drop-rate stays within the target "
    "(largest-ladder fallback = 'target infeasible here'). Plan: one "
    "map-side hash agg on the block keys, a TINY 6-row cap ladder "
    "broadcast under the blocks relation, one 6-row curve agg + a "
    "1-row pick broadcast — no pairwise work anywhere, so the knob "
    "can be re-evaluated every ingest at any scale",
)
def join_fuzzy_cap_autotune(spark, sf_dir):
    from chiv_spark.functions.detmath import det_round

    named = t(spark, sf_dir, "part").select(
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
        F.expr(f"CAST(length(p_name) AS INT) div {_FZ_LEN_W}").alias("lb"),
    )
    blocks = named.groupBy("block", "lb").agg(
        F.count(F.lit(1)).alias("m")
    )
    caps = spark.createDataFrame(
        [(c,) for c in _FZ_CAP_LADDER], "cap int"
    )
    k = F.least(F.col("m"), F.col("cap"))
    curve = (
        blocks.crossJoin(F.broadcast(caps))
        .groupBy("cap")
        .agg(
            F.sum(k).cast("long").alias("n_kept_members"),
            F.sum(F.greatest(F.col("m") - F.col("cap"), F.lit(0)))
            .cast("long")
            .alias("n_dropped_members"),
            F.sum(F.expr(
                f"(least(m, cap) * (least(m, cap) - 1)) div 2"
            )).cast("long").alias("bound_pairs"),
            F.sum(F.when(F.col("m") > F.col("cap"), 1).otherwise(0))
            .cast("long")
            .alias("saturated_blocks"),
        )
    )
    rated = curve.withColumn(
        "drop_rate",
        det_round(
            F.col("n_dropped_members")
            / (F.col("n_kept_members") + F.col("n_dropped_members")).cast(
                "double"
            )
        ),
    )
    pick = rated.agg(
        F.coalesce(
            F.min(
                F.when(
                    F.col("drop_rate") <= _FZ_DROP_TARGET, F.col("cap")
                )
            ),
            F.max("cap"),
        ).alias("rec")
    )
    return rated.crossJoin(F.broadcast(pick)).select(
        F.col("cap").cast("long").alias("cap"),
        "n_kept_members",
        "n_dropped_members",
        "drop_rate",
        "bound_pairs",
        "saturated_blocks",
        (F.col("drop_rate") <= _FZ_DROP_TARGET).alias("meets_target"),
        (F.col("cap") == F.col("rec")).alias("recommended"),
    )


# --------------------------------------------------------------------------
# join_fuzzy_at_autotuned_cap — the dial WIRED to the join (r15 verdict
# task 5): join_fuzzy_levenshtein_capped pins _FZ_CAP = 64 while the
# autotune row computes the evidence-backed pick one screen up; left
# separate they can silently drift apart. This row runs the capped
# join AT the autotuned cap — the pick is the autotune's 1-row
# recommended relation (a bounded driver-side read, the standing
# 1-row-agg convention), the pairs are capped_fuzzy_pairs(cap=pick),
# and every output row carries cap_used + the pick's meets_target so
# a downstream consumer can see it is reading fallback-cap output
# when the drop-rate target was infeasible (largest-ladder fallback,
# documented in the autotune row).


def _autotuned_pick(spark, sf_dir):
    """(cap, meets_target) from the autotune relation's single
    recommended row — bounded 1-row collect."""
    rec = (
        join_fuzzy_cap_autotune(spark, sf_dir)
        .filter(F.col("recommended"))
        .select("cap", "meets_target")
        .collect()[0]
    )
    return int(rec["cap"]), bool(rec["meets_target"])


def _at_autotuned_cap_oracle() -> str:
    from chiv_spark.functions.detmath import duckdb_det_round

    ladder = ", ".join(str(c) for c in _FZ_CAP_LADDER)
    return f"""
    WITH named AS ({_FZ_NAMED_SQL}),
    blocks AS (SELECT block, lb, COUNT(*) AS m FROM named GROUP BY block, lb),
    caps AS (SELECT unnest([{ladder}]) AS cap),
    curve AS (
      SELECT cap,
             SUM(GREATEST(m - cap, 0)) AS nd,
             SUM(LEAST(m, cap)) AS nk
      FROM blocks CROSS JOIN caps GROUP BY cap),
    rated AS (
      SELECT cap,
             {duckdb_det_round("nd / CAST(nk + nd AS DOUBLE)")} AS drop_rate
      FROM curve),
    pick AS (
      SELECT COALESCE(MIN(CASE WHEN drop_rate <= {_FZ_DROP_TARGET} THEN cap END),
                      MAX(cap)) AS rec,
             COALESCE(BOOL_OR(drop_rate <= {_FZ_DROP_TARGET}), FALSE) AS ok
      FROM rated),
    ranked AS (SELECT *, {_FZ_RANK_SQL} AS rk FROM named),
    kept AS (SELECT * FROM ranked WHERE rk <= (SELECT rec FROM pick))
    SELECT a.k AS key_a, b.k AS key_b,
           a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
           CAST(pick.rec AS BIGINT) AS cap_used,
           pick.ok AS meets_target
    FROM kept a JOIN kept b
      ON a.block = b.block AND a.lb = b.lb AND a.k < b.k, pick
    WHERE levenshtein(a.name, b.name) <= {_MAX_DIST}
    """


@query(
    "join_fuzzy_at_autotuned_cap",
    None,  # oracle attached below (needs _at_autotuned_cap_oracle())
    doc="the capped fuzzy join RUN AT the autotuned cap (r15 verdict "
    "task 5 — join_fuzzy_levenshtein_capped pins cap=64 while "
    "join_fuzzy_cap_autotune computes the evidence-backed pick; this "
    "row composes them so the dial and the join cannot drift): the "
    "autotune's recommended cap (smallest ladder point within the "
    "25% member-drop target, largest-ladder fallback when none "
    "qualifies) parameterizes capped_fuzzy_pairs, and every pair "
    "carries cap_used + meets_target so fallback-cap output is "
    "visibly flagged, never silent. The pick is a bounded 1-row "
    "driver read off one map-side hash agg (the autotune plan); the "
    "pair work stays bounded by n_sub_blocks * cap^2/2. Oracle "
    "recomputes the pick in SQL and parameterizes the capped oracle "
    "with it — the composition is checked end-to-end, not the parts "
    "in isolation",
)
def join_fuzzy_at_autotuned_cap(spark, sf_dir):
    cap, meets = _autotuned_pick(spark, sf_dir)
    return capped_fuzzy_pairs(spark, sf_dir, cap).select(
        "*",
        F.lit(cap).cast("long").alias("cap_used"),
        F.lit(meets).alias("meets_target"),
    )


# --------------------------------------------------------------------------
# Cluster-output formulation (r15 verdict task 2): the autotune PROVED
# pair-capping cannot recover recall on clique-dense blocks — recall
# falls as (cap/m)^2, 0.1% of true pairs at cap=64/sf0.1, and no
# ladder point meets the member target. The fix is to change the
# DELIVERABLE: entity resolution consumes cluster assignments, not
# all-pairs. Within each (head noun, length band) sub-block, every
# member is matched against the <= cap deterministic REPRESENTATIVES
# only (the same stable-hash rank the capped join keeps), and emits
# ONE row — its nearest matching representative (ties to the senior
# rep). Cost is members * cap per sub-block (LINEAR in members at any
# corpus size, vs quadratic pairs), and member recall is near-full on
# exactly the clique-dense blocks where pair recall collapsed:
# a member of a near-clique is within distance 3 of essentially any
# representative. join_fuzzy_cluster_recall measures that claim
# against the UNCAPPED truth and gates it at 95%.


def fuzzy_cluster_assign(spark, sf_dir, cap: int = _FZ_CAP):
    """One row per part: its nearest (dist, then rep seniority)
    matching representative within its sub-block, or itself as a
    singleton when no representative is within _MAX_DIST."""
    from pyspark.sql import Window

    from chiv_spark.functions.hashing import hash64

    named = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
        F.expr(f"CAST(length(p_name) AS INT) div {_FZ_LEN_W}").alias("lb"),
    )
    rk = F.row_number().over(
        Window.partitionBy("block", "lb").orderBy(
            hash64(F.concat(F.lit("fzcap:"), F.col("k").cast("string"))),
            F.col("k"),
        )
    )
    ranked = named.withColumn("rk", rk)
    reps = ranked.filter(F.col("rk") <= cap).select(
        F.col("k").alias("rep_k"),
        F.col("name").alias("rep_name"),
        F.col("rk").alias("rep_rk"),
        "block",
        "lb",
    )
    d = F.levenshtein(F.col("name"), F.col("rep_name"))
    pick = F.row_number().over(
        Window.partitionBy("k").orderBy("d", "rep_rk", "rep_k")
    )
    best = (
        ranked.join(reps, ["block", "lb"])
        .withColumn("d", d)
        .filter(F.col("d") <= _MAX_DIST)
        .withColumn("pick", pick)
        .filter(F.col("pick") == 1)
        .select("k", "rep_k", F.col("d").alias("dist_to_rep"))
    )
    return ranked.join(best, "k", "left").select(
        F.col("k").alias("member_key"),
        "block",
        F.col("lb").cast("long").alias("len_band"),
        (F.col("rk") <= cap).alias("is_rep"),
        F.col("rep_k").isNotNull().alias("assigned"),
        F.coalesce("rep_k", "k").alias("rep_key"),
        F.col("dist_to_rep").cast("long").alias("dist_to_rep"),
    )


def _cluster_assign_sql(cap: int) -> str:
    """The cluster-assignment relation as DuckDB SQL (shared by the
    assignment oracle and the recall oracle)."""
    return f"""
    WITH named AS ({_FZ_NAMED_SQL}),
    ranked AS (SELECT *, {_FZ_RANK_SQL} AS rk FROM named),
    reps AS (SELECT k AS rep_k, name AS rep_name, rk AS rep_rk, block, lb
             FROM ranked WHERE rk <= {cap}),
    matches AS (
      SELECT a.k, r.rep_k, levenshtein(a.name, r.rep_name) AS d,
             ROW_NUMBER() OVER (
               PARTITION BY a.k
               ORDER BY levenshtein(a.name, r.rep_name), r.rep_rk, r.rep_k
             ) AS pick
      FROM ranked a JOIN reps r ON a.block = r.block AND a.lb = r.lb
      WHERE levenshtein(a.name, r.rep_name) <= {_MAX_DIST}),
    best AS (SELECT * FROM matches WHERE pick = 1)
    SELECT a.k AS member_key, a.block,
           CAST(a.lb AS BIGINT) AS len_band,
           a.rk <= {cap} AS is_rep,
           b.rep_k IS NOT NULL AS assigned,
           COALESCE(b.rep_k, a.k) AS rep_key,
           CAST(b.d AS BIGINT) AS dist_to_rep
    FROM ranked a LEFT JOIN best b ON a.k = b.k
    """


@query(
    "join_fuzzy_cluster_assign",
    _cluster_assign_sql(_FZ_CAP),
    doc="CLUSTER-output fuzzy matching (r15 verdict task 2 — the "
    "autotune proved pair-capping cannot recover recall on "
    "clique-dense blocks: recall falls as (cap/m)^2 and no ladder "
    "cap meets the member target at sf0.1): instead of all pairs, "
    "each part is matched against the <= 64 deterministic stable-"
    "hash REPRESENTATIVES of its (head noun, length band) sub-block "
    "and emits ONE row — nearest matching representative, ties to "
    "the senior rep, itself as a singleton when none is within "
    "distance 3. This is representative propagation, the entity-"
    "resolution deliverable users consume: member cost is LINEAR "
    "(members * cap levenshtein evals per sub-block) and output is "
    "one row per member at ANY corpus size, while member recall "
    "stays near-full exactly where pair recall collapsed (a near-"
    "clique member is within 3 of essentially any rep — measured "
    "and gated >= 95% by join_fuzzy_cluster_recall). Plan: one "
    "(block, lb) shuffle for rank + member-x-rep join (rep side "
    "bounded by cap, AQE-broadcastable), one member-keyed window "
    "for the nearest pick; no pairwise blow-up anywhere",
)
def join_fuzzy_cluster_assign(spark, sf_dir):
    return fuzzy_cluster_assign(spark, sf_dir, _FZ_CAP)


def _cluster_recall_oracle(cap: int) -> str:
    from chiv_spark.functions.detmath import duckdb_det_round

    return f"""
    WITH assignments AS ({_cluster_assign_sql(cap)}),
    named AS ({_FZ_NAMED_SQL}),
    vocab AS (SELECT block, name, COUNT(*) AS cnt
              FROM named GROUP BY block, name),
    partnered_names AS (
      SELECT v1.block, v1.name FROM vocab v1
      WHERE v1.cnt > 1
         OR EXISTS (SELECT 1 FROM vocab v2
                    WHERE v2.block = v1.block AND v2.name <> v1.name
                      AND levenshtein(v1.name, v2.name) <= {_MAX_DIST})),
    true_members AS (
      SELECT n.k FROM named n
      JOIN partnered_names p ON n.block = p.block AND n.name = p.name),
    cluster_sizes AS (
      SELECT rep_key, COUNT(*) AS sz FROM assignments
      WHERE assigned GROUP BY rep_key),
    recovered AS (
      SELECT a.member_key FROM assignments a
      JOIN cluster_sizes s ON a.rep_key = s.rep_key
      WHERE a.assigned AND s.sz >= 2),
    stats AS (
      SELECT (SELECT COUNT(*) FROM true_members) AS n_true_members,
             (SELECT COUNT(*) FROM true_members t
              WHERE EXISTS (SELECT 1 FROM recovered r
                            WHERE r.member_key = t.k)) AS n_recovered_true,
             (SELECT COUNT(*) FROM assignments WHERE assigned) AS n_assigned)
    SELECT CAST(n_true_members AS BIGINT) AS n_true_members,
           CAST(n_recovered_true AS BIGINT) AS n_recovered_true,
           CAST(n_assigned AS BIGINT) AS n_assigned,
           {duckdb_det_round("n_recovered_true / CAST(n_true_members AS DOUBLE)")}
             AS member_recall,
           n_recovered_true * 100 >= n_true_members * 95 AS meets_gate
    FROM stats
    """


@query(
    "join_fuzzy_cluster_recall",
    None,  # oracle attached below (needs _cluster_recall_oracle())
    doc="member-recall evaluation of the cluster-output formulation "
    "against the UNCAPPED truth (the ann_recall_at_5 pattern, r15 "
    "verdict task 2's gate): a TRUE member is any part with at least "
    "one uncapped fuzzy partner in its head-noun block (same name "
    "appearing twice, or a distinct name within edit distance 3 — "
    "computed at the NAME level, the registered uncapped row's "
    "dictionary optimization, so the truth pass is vocab-quadratic "
    "per block, not row-quadratic); a member is RECOVERED when the "
    "cluster assignment puts it in a cluster of size >= 2. Emits the "
    "1-row summary (true members, recovered, assigned, member_recall) "
    "with the INTEGER >= 95% gate (n_recovered*100 >= n_true*95 — "
    "exact cross-engine arithmetic, no float threshold). This is the "
    "committed evidence that representative propagation recovers the "
    "members pair-capping dropped: pair recall at cap=64/sf0.1 is "
    "0.1%, member recall here gates >= 95%",
)
def join_fuzzy_cluster_recall(spark, sf_dir):
    from chiv_spark.functions.detmath import det_round

    assignments = fuzzy_cluster_assign(spark, sf_dir, _FZ_CAP)
    named = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
    )
    vocab = named.groupBy("block", "name").agg(F.count(F.lit(1)).alias("cnt"))
    v1, v2 = vocab.alias("v1"), vocab.alias("v2")
    near = (
        v1.join(
            v2,
            (F.col("v1.block") == F.col("v2.block"))
            & (F.col("v1.name") != F.col("v2.name")),
        )
        .filter(
            F.levenshtein(F.col("v1.name"), F.col("v2.name")) <= _MAX_DIST
        )
        .select(F.col("v1.block").alias("block"), F.col("v1.name").alias("name"))
        .distinct()
    )
    partnered = (
        vocab.filter(F.col("cnt") > 1)
        .select("block", "name")
        .unionByName(near)
        .distinct()
    )
    true_members = named.join(partnered, ["block", "name"]).select("k")
    sizes = (
        assignments.filter("assigned")
        .groupBy("rep_key")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    recovered = (
        assignments.filter("assigned")
        .join(sizes.filter(F.col("sz") >= 2), "rep_key", "left_semi")
        .select(F.col("member_key").alias("k"))
    )
    n_true = true_members.agg(F.count(F.lit(1)).alias("n_true_members"))
    n_rec = true_members.join(recovered, "k", "left_semi").agg(
        F.count(F.lit(1)).alias("n_recovered_true")
    )
    n_asn = assignments.filter("assigned").agg(
        F.count(F.lit(1)).alias("n_assigned")
    )
    return (
        n_true.crossJoin(F.broadcast(n_rec))
        .crossJoin(F.broadcast(n_asn))
        .select(
            F.col("n_true_members").cast("long").alias("n_true_members"),
            F.col("n_recovered_true").cast("long").alias("n_recovered_true"),
            F.col("n_assigned").cast("long").alias("n_assigned"),
            det_round(
                F.col("n_recovered_true")
                / F.col("n_true_members").cast("double")
            ).alias("member_recall"),
            (
                F.col("n_recovered_true") * 100
                >= F.col("n_true_members") * 95
            ).alias("meets_gate"),
        )
    )


from chiv_spark.queries.base import REGISTRY as _FZ_REG  # noqa: E402

_FZ_REG["join_fuzzy_cap_autotune"] = _FZ_REG[
    "join_fuzzy_cap_autotune"
].__class__(
    name="join_fuzzy_cap_autotune",
    fn=_FZ_REG["join_fuzzy_cap_autotune"].fn,
    oracle=_cap_autotune_oracle(),
    doc=_FZ_REG["join_fuzzy_cap_autotune"].doc,
)

for _nm, _orc in (
    ("join_fuzzy_at_autotuned_cap", _at_autotuned_cap_oracle()),
    ("join_fuzzy_cluster_recall", _cluster_recall_oracle(_FZ_CAP)),
):
    _FZ_REG[_nm] = _FZ_REG[_nm].__class__(
        name=_nm, fn=_FZ_REG[_nm].fn, oracle=_orc, doc=_FZ_REG[_nm].doc
    )
