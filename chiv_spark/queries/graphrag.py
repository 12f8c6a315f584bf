"""Graph analytics + retrieval chunking + robust outliers.

- ``graph_triangle_count``: triangle counting over the part
  co-purchase graph (parts are adjacent when they share at least two
  orders — the weight threshold keeps the graph sparse and
  scale-stable where single-shared-order edges degenerate toward the
  complete graph). The Spark side uses *degree-ordered orientation* — the
  distributed-triangle-counting standard: orient every undirected edge
  from its lower-(degree, id) endpoint to the higher one, enumerate
  wedges only at each edge's tail, and close them against oriented
  edges. Wedge work is then sum-of-squares of *out*-degrees, which
  orientation bounds by O(E^1.5) total regardless of skew (a celebrity
  node of degree d generates d wedges as a tail only when its
  neighbors all out-rank it — impossible past sqrt scale). The DuckDB
  oracle counts the same triangles with the naive i<j three-way join,
  which is only viable at test scale — exactly the point of pairing
  them.
- ``pipeline_rag_chunks``: fixed-size token-window chunking with
  overlap (the RAG / context-window prep pass): tokens -> strided
  starts via ``sequence`` -> ``slice``. Per-doc work is linear in
  tokens x (1/stride); no shuffle at all — chunking is a narrow map.
- ``events_anomaly_mad``: robust outlier detection via median /
  median-absolute-deviation (3-sigma-equivalent cutoff with the
  1.4826 normal-consistency constant). Two grouped exact medians and
  a broadcast join back — no global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chiv_spark.functions.detmath import det_round, duckdb_det_round
from chiv_spark.plans.partitions import right_size
from chiv_spark.queries.base import query, t

# --------------------------------------------------------------------------
# graph_triangle_count


#: minimum co-occurrence count for an edge — a single shared order is
#: noise in a random-assignment corpus; requiring >= 2 keeps the graph
#: sparse and scale-stable (P[two parts meet twice] stays tiny as both
#: orders and parts grow), where the >= 1 graph degenerates toward the
#: complete graph and triangle OUTPUT becomes the cost
_MIN_W = 2


def _copurchase_edges(spark, sf_dir):
    """Lazy thresholded co-purchase edge list (u < v). Split out so
    plan tests can assert its shape pre-persist.

    Pairs come from a per-order sorted part-set expansion rather than
    a lineitem self-join: ONE shuffle of lineitem (groupBy orderkey;
    collect_set also absorbs the dedup the join shape paid a distinct
    shuffle for) followed by a narrow m-choose-2 struct expansion.
    Per-task expansion work is bounded by the largest order's item
    count squared — the identical bound the self-join had in its
    hottest partition — but two full lineitem shuffles (distinct +
    join) become one, and the join disappears. Measured ~20% faster
    at sf0.1; at cluster scale it removes a lineitem-sized exchange."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("s")
    )
    per = li.groupBy("k").agg(F.sort_array(F.collect_set("s")).alias("ps"))
    pairs = per.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _MIN_W)
        .select("u", "v")
    )


def _triangle_result(e, n_edges_val):
    """Lazy triangle/clustering stats over an edge list ``e``; the
    measured edge count rides along as a literal (the caller already
    paid for it when materializing the cache)."""
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # total order for orientation: (degree, id) as a struct — struct
    # comparison is lexicographic, so ties on degree break by id and
    # the orientation is acyclic at any id magnitude (no packing)
    dk = deg.select("node", F.struct(F.col("d"), F.col("node").alias("n")).alias("ord_key"))
    # the thresholded edge set's node dim is small next to the pair list
    ew = (
        e.join(F.broadcast(dk.withColumnRenamed("node", "u").withColumnRenamed("ord_key", "ku")), "u")
        .join(F.broadcast(dk.withColumnRenamed("node", "v").withColumnRenamed("ord_key", "kv")), "v")
    )
    oe = ew.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.greatest("ku", "kv").alias("dst_key"),
    )
    wedges = (
        oe.alias("x")
        .join(oe.alias("y"), (F.col("x.src") == F.col("y.src")) & (F.col("x.dst_key") < F.col("y.dst_key")))
        .select(F.col("x.dst").alias("b"), F.col("y.dst").alias("c"))
    )
    closed = wedges.join(
        oe.select(F.col("src").alias("b"), F.col("dst").alias("c")), ["b", "c"]
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2.0).alias("n_wedges"),
    )
    return stats.crossJoin(tri).select(
        "n_nodes",
        F.lit(n_edges_val).cast("long").alias("n_edges"),
        F.col("n").cast("long").alias("n_triangles"),
        det_round(3.0 * F.col("n") / F.col("n_wedges")).alias("clustering_coeff"),
    )


@query(
    "graph_triangle_count",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS s FROM lineitem),
    e AS (
      SELECT a.s AS u, b.s AS v
      FROM li a JOIN li b ON a.k = b.k AND a.s < b.s
      GROUP BY a.s, b.s HAVING COUNT(*) >= {_MIN_W}),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node),
    tri AS (
      SELECT COUNT(*) AS n FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
           {duckdb_det_round("3.0 * (SELECT n FROM tri) / (SELECT SUM(d * (d - 1) / 2.0) FROM deg)")}
             AS clustering_coeff
    FROM (SELECT 1)
    """,
    doc="triangle count + global clustering coefficient of the part "
    "co-purchase graph (parts sharing >= 2 orders); Spark side uses "
    "degree-ordered orientation (O(E^1.5) wedge bound), oracle uses "
    "the naive i<j 3-way join",
)
def graph_triangle_count(spark, sf_dir):
    # the per-order self-join in _copurchase_edges is BY FAR the
    # dominant stage and feeds five branches (deg, orientation,
    # wedges x2, closure) — without a persist Spark re-derives it per
    # branch (measured 8.8s -> 4.1s at sf0.1 from persist+coalesce).
    # The eager count() populates the cache race-free AND is n_edges.
    e_cached = _copurchase_edges(spark, sf_dir).persist()
    n_edges_val = e_cached.count()
    # the cache pins the groupBy's full shuffle-partition count (AQE
    # cannot re-coalesce a cached RDD), so every downstream graph stage
    # would spawn that many tasks over the — post-threshold, usually
    # small — edge list. Right-size from the MEASURED count: ~2M edges
    # per task, floor 1. At 100 TB-scale edge lists this keeps the full
    # partitioning; locally it collapses the task spray. coalesce is
    # narrow — no extra shuffle either way.
    # materialize the single result row while the edge cache is alive,
    # then release it (same lifecycle as dedup_clusters) — the caller's
    # later collect reads the pinned row, not the lineage
    result = _triangle_result(right_size(e_cached, n_edges_val), n_edges_val).localCheckpoint(
        eager=True
    )
    e_cached.unpersist()
    return result


# --------------------------------------------------------------------------
# pipeline_rag_chunks

_CHUNK = 32
_STRIDE = 24


@query(
    "pipeline_rag_chunks",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents),
    starts AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, greatest(len(tk), 1), {_STRIDE})) AS start
      FROM toks)
    SELECT doc_id,
           CAST((start - 1) / {_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(tk[start:start + {_CHUNK - 1}]) AS BIGINT) AS n_tokens,
           array_to_string(tk[start:start + {_CHUNK - 1}], ' ') AS chunk_text
    FROM starts
    """,
    doc=f"overlapping token-window chunking ({_CHUNK}-token chunks, stride "
    f"{_STRIDE}) for retrieval indexing; narrow map, zero shuffles",
)
def pipeline_rag_chunks(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk"))
    starts = toks.select(
        "doc_id",
        "tk",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("tk"), F.lit(1)), F.lit(_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("tk"), F.col("start"), _CHUNK)
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / _STRIDE).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# events_anomaly_mad

_MAD_K = 1.4826  # normal-consistency constant: MAD * 1.4826 ~ sigma
_MAD_CUT = 3.0


@query(
    "events_anomaly_mad",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
      GROUP BY event_type)
    SELECT d.event_type,
           {duckdb_det_round('ANY_VALUE(d.med)')} AS median_value,
           {duckdb_det_round('ANY_VALUE(m.mad)')} AS mad,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (
             WHERE d.adev > {_MAD_CUT} * {_MAD_K} * m.mad) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    doc="robust per-type outlier counts via median/MAD (two grouped exact "
    "medians + broadcast joins back; no global sort)",
)
def events_anomaly_mad(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            det_round(F.first("med")).alias("median_value"),
            det_round(F.first("mad")).alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count(F.when(F.col("adev") > _MAD_CUT * _MAD_K * F.col("mad"), 1))
            .cast("long")
            .alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# graph_pagerank_3iter

#: damping factor and integer-micro init (rank scale: mean 1.0 == 1e6
#: micros per node, the "unnormalized" PageRank convention)
_PR_D = 0.85
_PR_INIT = 1_000_000
_PR_BASE = 150_000  # (1 - d) in micros

_PR_EDGE_CTES = f"""
    li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS s FROM lineitem),
    e0 AS (
      SELECT a.s AS u, b.s AS v
      FROM li a JOIN li b ON a.k = b.k AND a.s < b.s
      GROUP BY a.s, b.s HAVING COUNT(*) >= {_MIN_W}),
    edges AS (SELECT u AS a, v AS b FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT a, COUNT(*) AS dg FROM edges GROUP BY a)
"""


def _pr_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT d.a AS node,
             CAST({_PR_BASE} + ROUND({_PR_D} * COALESCE(s.sm, 0)) AS BIGINT) AS r
      FROM deg d LEFT JOIN (
        SELECT e.b AS node, SUM(p.r // d2.dg) AS sm
        FROM edges e
        JOIN {prev} p ON p.node = e.a
        JOIN deg d2 ON d2.a = e.a
        GROUP BY e.b) s ON s.node = d.a)"""


@query(
    "graph_pagerank_3iter",
    f"""
    WITH {_PR_EDGE_CTES.strip()},
    r0 AS (SELECT a AS node, CAST({_PR_INIT} AS BIGINT) AS r FROM deg),
    {_pr_round_sql("r0", "r1").strip()},
    {_pr_round_sql("r1", "r2").strip()},
    {_pr_round_sql("r2", "r3").strip()}
    SELECT node, r AS rank_micro FROM r3
    """,
    doc="three power iterations of PageRank (d=0.85) over the "
    "symmetric part co-purchase graph. All mass rides integer micros: "
    "per-edge shares are floor-divided longs, in-sums are exact, and "
    "the damped update rounds once per node per round — identical in "
    "both engines, so an iterative graph algorithm passes the "
    "bit-exact gate. Scale shape per round: one edge-keyed join "
    "(rank x degree ship with the edge list) + one dest-keyed "
    "aggregation; state is O(nodes), traffic O(edges) — the standard "
    "distributed PR shape. Edges/degrees are computed once and "
    "persisted across rounds (same lifecycle as the triangle count)",
)
def graph_pagerank_3iter(spark, sf_dir):
    # cache the DIRECTED edge list first: the symmetric union below
    # references it twice, and persisting only the union would
    # materialize the expensive per-order self-join lineage once per
    # union branch (measured: 12.9s build -> 4.4s from this ordering).
    e0_cached = _copurchase_edges(spark, sf_dir).persist()
    n_e0 = e0_cached.count()
    # same partition right-sizing as graph_triangle_count: the cache
    # pins pre-AQE partition counts and the loop's joins re-spray them
    e0 = right_size(e0_cached, n_e0)
    edges = e0.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e0.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("dg"))
    # fold the degree onto the edge list ONCE — it is loop-invariant,
    # and joining it per round would cost an exchange per iteration
    ewd_cached = edges.join(deg, "a").persist()
    ewd = right_size(ewd_cached, ewd_cached.count())
    deg = ewd.select(F.col("a"), "dg").distinct()

    r = deg.select(F.col("a").alias("node"), F.lit(_PR_INIT).cast("long").alias("r"))
    for _ in range(3):
        shares = (
            ewd.join(r, r.node == ewd.a)
            .select(F.col("b").alias("node"), F.expr("r div dg").alias("share"))
            .groupBy("node")
            .agg(F.sum("share").alias("sm"))
        )
        r = deg.join(shares, deg.a == shares.node, "left").select(
            F.col("a").alias("node"),
            (
                F.lit(_PR_BASE)
                + F.round(F.lit(_PR_D) * F.coalesce(F.col("sm"), F.lit(0)).cast("double"))
            )
            .cast("long")
            .alias("r"),
        )
    result = r.select("node", F.col("r").alias("rank_micro")).localCheckpoint(eager=True)
    e0_cached.unpersist()
    ewd_cached.unpersist()
    return result


# --------------------------------------------------------------------------
# graph_link_prediction — common-neighbor Jaccard link scores


@query(
    "graph_link_prediction",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS s FROM lineitem),
    pair AS (
      SELECT a.s AS u, b.s AS v
      FROM li a JOIN li b ON a.k = b.k AND a.s < b.s
      GROUP BY a.s, b.s HAVING COUNT(*) >= {_MIN_W}),
    adj AS (SELECT u AS node, v AS nbr FROM pair
            UNION ALL SELECT v AS node, u AS nbr FROM pair),
    deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
    wedge AS (
      SELECT a.nbr AS x, b.nbr AS y, COUNT(*) AS common
      FROM adj a JOIN adj b ON a.node = b.node AND a.nbr < b.nbr
      GROUP BY a.nbr, b.nbr),
    cand AS (
      SELECT w.x, w.y, w.common
      FROM wedge w LEFT JOIN pair p ON p.u = w.x AND p.v = w.y
      WHERE p.u IS NULL),
    scored AS (
      SELECT c.x, c.y, c.common,
             CAST(c.common AS DOUBLE) / (dx.d + dy.d - c.common) AS jaccard
      FROM cand c
      JOIN deg dx ON dx.node = c.x
      JOIN deg dy ON dy.node = c.y),
    ranked AS (
      SELECT x, y, common, jaccard,
             ROW_NUMBER() OVER (ORDER BY jaccard DESC, x, y) AS rk
      FROM scored)
    SELECT x AS node_a, y AS node_b,
           CAST(common AS BIGINT) AS common_neighbors,
           {duckdb_det_round("jaccard")} AS jaccard
    FROM ranked WHERE rk <= 20
    """,
    doc="link prediction over the thresholded co-purchase graph: "
    "non-adjacent part pairs scored by common-neighbor Jaccard "
    "|N(a) n N(b)| / |N(a) u N(b)| — the classic recommender / "
    "graph-completion heuristic, top-20. Exact integer neighbor "
    "counts, one IEEE division, engine-identical ranking. Scale: "
    "wedge enumeration is sum-of-d^2 over the WEIGHT-THRESHOLDED "
    "graph (the >= 2 co-order filter keeps it sparse and "
    "scale-stable, same argument as triangle counting); the "
    "existing-edge exclusion is one anti join; a degree cap is the "
    "documented dial for power-law graphs. The top-20 is "
    "orderBy+limit (TakeOrderedAndProject: per-partition top-k, "
    "driver merges 20 rows per partition) — NOT a global row_number "
    "window, which would move every candidate pair to one task "
    "(InferWindowGroupLimit does not fire on unpartitioned windows). "
    "The (jaccard DESC, x, y) ordering is total, so the rows are "
    "identical to the oracle's rank filter",
)
def graph_link_prediction(spark, sf_dir):
    e = _copurchase_edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    wedge = (
        adj.alias("a")
        .join(
            adj.alias("b"),
            (F.col("a.node") == F.col("b.node")) & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .groupBy(F.col("a.nbr").alias("x"), F.col("b.nbr").alias("y"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedge.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"], "left_anti"
    )
    scored = (
        cand.join(F.broadcast(deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))), "x")
        .join(F.broadcast(deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))), "y")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("dx") + F.col("dy") - F.col("common")),
        )
    )
    return (
        scored.orderBy(F.col("jaccard").desc(), "x", "y")
        .limit(20)
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.col("common").cast("long").alias("common_neighbors"),
            det_round(F.col("jaccard")).alias("jaccard"),
        )
    )
