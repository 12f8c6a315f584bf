"""Statistical + array + iterative-algorithm coverage.

- Exact spread statistics (variance/stddev/correlation) computed from
  DECIMAL-transit power sums — the naive engine-native stddev/corr
  aggregate their float sums in nondeterministic order and would never
  hash-match across engines; power sums are exact integers-at-scale,
  so the derived doubles are bit-identical.
- Connected-component dedup clustering: iterative min-label
  propagation in Spark (driver loop to fixpoint — bounded by cluster
  diameter) vs a recursive CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chiv_spark.functions.detmath import det_round, duckdb_det_round
from chiv_spark.operators import dedup
from chiv_spark.queries.base import query, t


@query(
    "agg_variance_exact",
    """
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem)
    SELECT n,
           (FLOOR(((sx2 - sx*sx/n) / (n-1)) * 1000000.0 + 0.5) / 1000000.0) AS var_qty,
           (FLOOR(SQRT((sx2 - sx*sx/n) / (n-1)) * 1000000.0 + 0.5) / 1000000.0) AS stddev_qty,
           (FLOOR(((sxy - sx*sy/n) / SQRT((sx2 - sx*sx/n) * (sy2 - sy*sy/n))) * 1000000.0 + 0.5) / 1000000.0) AS corr_qty_price
    FROM s
    """,
    doc="exact sample variance/stddev/correlation via decimal power sums (order-free)",
)
def agg_variance_exact(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q8 = F.col("l_quantity").cast("decimal(8,2)")
    p12 = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(q8 * q8).cast("double").alias("sx2"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum(p12 * p12).cast("double").alias("sy2"),
        F.sum(q8 * p12).cast("double").alias("sxy"),
    )
    n, sx, sx2, sy, sy2, sxy = (F.col(c) for c in ["n", "sx", "sx2", "sy", "sy2", "sxy"])
    var_q = (sx2 - sx * sx / n) / (n - 1)
    var_p = sy2 - sy * sy / n
    return s.select(
        n.cast("long").alias("n"),
        det_round(var_q, 6).alias("var_qty"),
        det_round(F.sqrt(var_q), 6).alias("stddev_qty"),
        det_round((sxy - sx * sy / n) / F.sqrt((sx2 - sx * sx / n) * var_p), 6).alias(
            "corr_qty_price"
        ),
    )


@query(
    "join_full_outer",
    """
    WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.k, s.k) AS nationkey,
           CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_customers,
           CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
    doc="full outer join: nations with customers and/or suppliers",
)
def join_full_outer(spark, sf_dir):
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = c.join(s, "k", "full_outer")
    return j.select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).cast("long").alias("n_customers"),
        F.coalesce("n_supp", F.lit(0)).cast("long").alias("n_suppliers"),
    )


@query(
    "scalar_regexp",
    """
    SELECT c_custkey,
           regexp_extract(c_name, '[0-9]+') AS cust_num,
           CAST(regexp_matches(c_mktsegment, '^B') AS BOOLEAN) AS seg_starts_b,
           regexp_replace(c_name, '[0-9]+', '#') AS name_masked
    FROM customer WHERE c_custkey <= 300
    """,
    doc="regexp family: extract / match / replace (patterns valid in both Java regex and RE2)",
)
def scalar_regexp(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "[0-9]+", 0).alias("cust_num"),
        F.col("c_mktsegment").rlike("^B").alias("seg_starts_b"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
    )


@query(
    "array_functions",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           (FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS first_elem,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
           CAST(list_contains(list_transform(embedding, x -> x > 0.5), true) AS BOOLEAN) AS any_gt_half
    FROM embeddings WHERE vec_id < 100
    """,
    doc="array function family: size / index / filter / transform / contains",
)
def array_functions(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        det_round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_positive"),
        F.exists("embedding", lambda x: x > 0.5).alias("any_gt_half"),
    )


@query(
    "agg_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders GROUP BY 1
    """,
    doc="fixed-width histogram via floor bucketing",
)
def agg_histogram(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("o_orderkey").cast("long").alias("min_key"),
    )


@query(
    "explode_tokens",
    """
    SELECT lang, tok, COUNT(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY lang, tok
    HAVING COUNT(*) >= 100
    """,
    doc="explode/unnest + re-aggregate: frequent tokens per language",
)
def explode_tokens(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= 100)
    )


from chiv_spark.queries import llm as _llm  # shared oracle fragments

_CLUSTER_CTES = f"""
    WITH RECURSIVE {_llm._MINHASH_CTES.strip().lstrip()},
    bandsig AS (SELECT doc_id, CAST(p // 4 AS INT) AS band,
                       string_agg(mh::VARCHAR, ',' ORDER BY p) AS sig_str
                FROM sig GROUP BY doc_id, CAST(p // 4 AS INT)),
    bands AS (SELECT doc_id, band,
                     (('0x' || substring(md5(band::VARCHAR || ':' || sig_str), 1, 15))::BIGINT) AS bh
              FROM bandsig),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
    est AS (SELECT c.doc_a, c.doc_b,
                   AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) AS ej
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.doc_a
            JOIN sig sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
            GROUP BY c.doc_a, c.doc_b),
    pairs AS (SELECT doc_a, doc_b FROM est WHERE ej >= 0.5),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )"""

_CLUSTER_ORACLE = f"""{_CLUSTER_CTES}
    SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
    FROM reach GROUP BY src
"""


@query(
    "dedup_clusters",
    _CLUSTER_ORACLE,
    doc="near-dup cluster assignment: connected components over MinHash-LSH pairs "
    "(iterative min-label propagation in Spark, recursive CTE oracle)",
)
def dedup_clusters(spark, sf_dir):
    # min-label propagation loop extracted to
    # dedup.min_label_components (r10, shared with the image tier);
    # the persist/right_size/round-count rationale lives there
    pairs = dedup.minhash_lsh_pairs(t(spark, sf_dir, "documents")).select("doc_a", "doc_b")
    return dedup.min_label_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


_CANONICAL_ORACLE = f"""{_CLUSTER_CTES},
    clusters AS (
      SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
    joined AS (
      SELECT c.cluster_id, d.doc_id, d.lang, d.n_chars
      FROM clusters c JOIN documents d USING (doc_id)),
    ranked AS (
      SELECT cluster_id, doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM joined)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM ranked WHERE rn = 1
    UNION ALL
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT), CAST(1 AS BIGINT)
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters)
"""


@query(
    "dedup_canonical_docs",
    _CANONICAL_ORACLE,
    doc="near-dup corpus compaction: collapse every MinHash-LSH cluster "
    "to its canonical document (longest text, doc_id tiebreak) and keep "
    "all singletons — the step that turns cluster ASSIGNMENTS into the "
    "deduplicated corpus a training run actually reads. Composes "
    "dedup_clusters; winner pick is a cluster-partitioned window "
    "(bounded by cluster size), singletons come back by anti join — "
    "both one doc-count-sized shuffle, nothing quadratic",
)
def dedup_canonical_docs(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    cl = dedup_clusters(spark, sf_dir)
    joined = cl.join(docs, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ws = Window.partitionBy("cluster_id")
    kept = (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(ws).cast("long"))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"), "cluster_size")
    )
    singles = docs.join(cl, "doc_id", "left_anti").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(1).cast("long").alias("cluster_size"),
    )
    return kept.unionByName(singles)


#: split fate hashed on the CLUSTER id (not the doc id) — the whole
#: point of leakage-safe splitting
_LSP_FATE = (
    "((('0x' || substring(md5('lsp:' || cluster_id::VARCHAR), 1, 15))::BIGINT) % 100)"
)


@query(
    "split_leakage_safe",
    f"""{_CLUSTER_CTES},
    clusters AS (SELECT src AS doc_id, MIN(dst) AS cid FROM reach GROUP BY src),
    assigned AS (
      SELECT d.doc_id, CAST(COALESCE(c.cid, d.doc_id) AS BIGINT) AS cluster_id
      FROM documents d LEFT JOIN clusters c USING (doc_id))
    SELECT doc_id, cluster_id,
           CASE WHEN {_LSP_FATE} < 80 THEN 'train'
                WHEN {_LSP_FATE} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """,
    doc="LEAKAGE-SAFE train/val/test split: the 80/10/10 hash fate is "
    "a pure function of the near-dup CLUSTER id (min doc_id of the "
    "MinHash-LSH connected component; singletons are their own "
    "cluster), so two near-duplicate documents can NEVER straddle "
    "splits — the eval-contamination failure mode of the plain "
    "per-doc split_train_val_test, where a test doc's near-twin "
    "sits in train and inflates eval. Composes dedup_clusters "
    "(iterative min-label propagation, 1-3 rounds on near-clique "
    "components); the split assignment itself is one broadcast-free "
    "left join + a hash expression — no sort, no window, no extra "
    "wide shuffle past what clustering already did. Leakage absence "
    "is asserted pairwise by tests/test_mining.py",
)
def split_leakage_safe(spark, sf_dir):
    from chiv_spark.functions.hashing import hash64

    docs = t(spark, sf_dir, "documents").select("doc_id")
    cl = dedup_clusters(spark, sf_dir)
    assigned = docs.join(cl, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").cast("long").alias("cluster_id"),
    )
    h = hash64(F.concat(F.lit("lsp:"), F.col("cluster_id").cast("string"))) % 100
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return assigned.select("doc_id", "cluster_id", split.alias("split"))


@query(
    "stats_ab_ztest",
    """
    WITH labeled AS (
      SELECT event_type,
             user_id % 2 AS grp,
             CAST(ROUND(value * 1000000.0) AS BIGINT) AS xm
      FROM events),
    moments AS (
      SELECT event_type, grp,
             COUNT(*) AS n,
             SUM(CAST(xm AS DECIMAL(38,0))) AS s1,
             SUM(CAST(xm AS DECIMAL(38,0)) * xm) AS s2
      FROM labeled GROUP BY event_type, grp),
    sides AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             CAST(a.s1 AS DOUBLE) / a.n / 1000000.0 AS mean_a,
             CAST(b.s1 AS DOUBLE) / b.n / 1000000.0 AS mean_b,
             (CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) / a.n)
               / (a.n - 1) / 1000000000000.0 AS var_a,
             (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / b.n)
               / (b.n - 1) / 1000000000000.0 AS var_b
      FROM moments a JOIN moments b
        ON a.event_type = b.event_type AND a.grp = 0 AND b.grp = 1)
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           (FLOOR((mean_a - mean_b) * 1000000.0 + 0.5) / 1000000.0) AS mean_diff,
           (FLOOR((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)
                  * 1000000.0 + 0.5) / 1000000.0) AS z_score
    FROM sides
    """,
    doc="two-sample z-test per event type (A/B split by user parity): "
    "means and sample variances from EXACT integer-micro first/second "
    "moments (DECIMAL(38) sums — the squared micros overflow BIGINT), "
    "one IEEE formula at the end. Single-pass two-moment aggregation "
    "per (type, arm), groups-sized exchange; the arm self-join is "
    "groups x 2 rows. Order-free by construction — sample variance "
    "from floats would hash-diverge between engines",
)
def stats_ab_ztest(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    xm = F.round(F.col("value").cast("double") * 1_000_000.0).cast("long")
    m = (
        ev.select("event_type", (F.col("user_id") % 2).alias("grp"), xm.alias("xm"))
        .groupBy("event_type", "grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("xm").cast("decimal(38,0)")).alias("s1"),
            F.sum(F.col("xm").cast("decimal(38,0)") * F.col("xm")).alias("s2"),
        )
    )
    a = m.filter(F.col("grp") == 0).select(
        "event_type", F.col("n").alias("n_a"), F.col("s1").alias("s1_a"), F.col("s2").alias("s2_a")
    )
    b = m.filter(F.col("grp") == 1).select(
        "event_type", F.col("n").alias("n_b"), F.col("s1").alias("s1_b"), F.col("s2").alias("s2_b")
    )
    j = a.join(b, "event_type")

    def mean(s1, n):
        return F.col(s1).cast("double") / F.col(n) / 1_000_000.0

    def var(s2, s1, n):
        return (
            (F.col(s2).cast("double") - F.col(s1).cast("double") * F.col(s1).cast("double") / F.col(n))
            / (F.col(n) - 1)
            / 1_000_000_000_000.0
        )

    mean_a, mean_b = mean("s1_a", "n_a"), mean("s1_b", "n_b")
    var_a, var_b = var("s2_a", "s1_a", "n_a"), var("s2_b", "s1_b", "n_b")
    se = F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return j.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        det_round(mean_a - mean_b, 6).alias("mean_diff"),
        det_round((mean_a - mean_b) / se, 6).alias("z_score"),
    )


# --------------------------------------------------------------------------
# stats_ks_test — two-sample Kolmogorov-Smirnov


@query(
    "stats_ks_test",
    f"""
    WITH cnt AS (
      SELECT value,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
      GROUP BY value),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_a,
             SUM(cb) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_b,
             SUM(ca) OVER () AS n_a,
             SUM(cb) OVER () AS n_b
      FROM cnt)
    SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           {duckdb_det_round(
               'MAX(abs(CAST(cum_a AS DOUBLE) / n_a'
               ' - CAST(cum_b AS DOUBLE) / n_b))')} AS d_stat
    FROM cum
    """,
    doc="two-sample Kolmogorov-Smirnov D statistic comparing the "
    "click vs purchase value distributions: per-distinct-value "
    "conditional counts (one hash agg, map-side partials), running "
    "ECDFs over the DISTINCT-VALUE table, D = max ECDF gap. The "
    "global window runs on the distinct-value table, not the events "
    "— bounded by value cardinality (quantize the value first when "
    "it is continuous at 100 TB; the event table itself only ever "
    "sees the one hash agg). Each candidate gap is two exact-integer "
    "divisions and a subtraction — no float accumulation — so the "
    "max is engine-identical",
)
def stats_ks_test(spark, sf_dir):
    # NULL values are excluded explicitly on BOTH sides: the running
    # ECDF orders by value, and Spark's ascending default is NULLS
    # FIRST while DuckDB's is NULLS LAST — with NULLs present the
    # cumulative sums would diverge even on identical data (r5 ADVICE)
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    cnt = e.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w_run = (
        Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    cum = cnt.select(
        F.sum("ca").over(w_run).alias("cum_a"),
        F.sum("cb").over(w_run).alias("cum_b"),
        F.sum("ca").over(w_all).alias("n_a"),
        F.sum("cb").over(w_all).alias("n_b"),
    )
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a")
        - F.col("cum_b").cast("double") / F.col("n_b")
    )
    return cum.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        det_round(F.max(gap)).alias("d_stat"),
    )


# --------------------------------------------------------------------------
# agg_quantile_approx — KLL/GK-style approximate median, rank-gated


@query(
    "agg_quantile_approx",
    # exact quantiles hash-compared; the approximation claim reduces
    # to a rank-error boolean both engines must agree on (the
    # agg_sample_scaleup gating pattern — DuckDB cannot replay
    # Spark's approx_percentile internals, but it CAN assert the
    # published rank guarantee held)
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {duckdb_det_round("quantile_cont(value, 0.5)")} AS p50_exact,
           TRUE AS rank_ok
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc="approximate median per event type via approx_percentile "
    "(Greenwald-Khanna style mergeable quantile summary, accuracy "
    "1000 -> rank error <= n/1000): the sketch path an exact "
    "percentile cannot take at 100 TB, where percentile() must "
    "collect each group's values while the GK summary is a bounded "
    "map-side-mergeable state. Gated, not hash-matched: the emitted "
    "row carries the EXACT interpolated median (engine percentile "
    "== DuckDB quantile_cont, parity pinned by agg_percentile_exact) "
    "plus a tie-robust realized-rank check on the approximate "
    "answer — share of values strictly below the estimate must not "
    "exceed 0.5+eps and share at-or-below must reach 0.5-eps "
    "(eps = 0.01, 10x the sketch's guarantee) — asserted TRUE by "
    "the oracle",
)
def agg_quantile_approx(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    approx = e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("p50_approx")
    )
    eps = 0.01
    gated = (
        e.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("percentile(value, 0.5)").alias("p50_exact_raw"),
            F.sum(
                (F.col("value") < F.col("p50_approx")).cast("long")
            ).alias("n_lt"),
            F.sum(
                (F.col("value") <= F.col("p50_approx")).cast("long")
            ).alias("n_le"),
        )
    )
    rank_ok = (
        F.col("n_lt").cast("double") / F.col("n") <= 0.5 + eps
    ) & (F.col("n_le").cast("double") / F.col("n") >= 0.5 - eps)
    return gated.select(
        "event_type",
        "n",
        det_round(F.col("p50_exact_raw")).alias("p50_exact"),
        rank_ok.alias("rank_ok"),
    )


# --------------------------------------------------------------------------
# stats_benford_digits — first-digit law conformance


@query(
    "stats_benford_digits",
    f"""
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0),
    d AS (
      SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM c),
    obs AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           {duckdb_det_round("CAST(n AS DOUBLE) / total")} AS observed_p,
           {duckdb_det_round("log10(1.0 + 1.0 / digit)")} AS benford_p,
           {duckdb_det_round(
               "(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / digit))"
               " * (CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / digit))"
               " / log10(1.0 + 1.0 / digit) * total")} AS chi2_term
    FROM obs, tot
    """,
    doc="Benford's-law first-digit audit of order totals — the "
    "classic fraud/synthetic-data detector. The leading significant "
    "digit is taken from the INTEGER cents rendering (bigint-to-"
    "string is byte-identical across engines, unlike double "
    "formatting), so digit extraction is exact; expected "
    "frequencies log10(1+1/d) and the per-digit chi-square terms "
    "are det-rounded to absorb libm ulps. One 9-key hash agg plus a "
    "1-row total broadcast — nothing here outgrows a pocket "
    "calculator at 100 TB",
)
def stats_benford_digits(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100.0).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    bp = F.log10(1.0 + 1.0 / F.col("digit"))
    chi2 = (p - bp) * (p - bp) / bp * F.col("total")
    return obs.join(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        det_round(p).alias("observed_p"),
        det_round(bp).alias("benford_p"),
        det_round(chi2).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# stats_mann_whitney — rank-sum test on the bounded distinct-value table


@query(
    "stats_mann_whitney",
    f"""
    WITH cnt AS (
      SELECT value,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
      GROUP BY value),
    ranked AS (
      SELECT ca, cb, ca + cb AS t,
             SUM(ca + cb) OVER (ORDER BY value
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM cnt),
    contrib AS (
      -- average rank of a tie group ending at cumulative position cum
      -- with t members is (2*cum - t + 1) / 2; ride 2x-scaled integers
      SELECT ca, cb, (2 * cum - t + 1) AS double_rank
      FROM ranked),
    agg AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(SUM(ca * double_rank) AS BIGINT) AS double_rank_sum_a
      FROM contrib)
    SELECT n_a, n_b,
           {duckdb_det_round(
               "(CAST(double_rank_sum_a AS DOUBLE) / 2.0"
               " - CAST(n_a AS DOUBLE) * (n_a + 1) / 2.0)")} AS u_a
    FROM agg
    """,
    doc="Mann-Whitney U (rank-sum) statistic comparing click vs "
    "purchase value distributions — the nonparametric location test "
    "completing the pair with stats_ks_test. Tie-corrected average "
    "ranks come from ONE running sum over the DISTINCT-VALUE table "
    "(bounded by value cardinality, the corpus only sees one hash "
    "agg): a tie group of size t ending at cumulative count c has "
    "average rank (2c - t + 1)/2, carried as 2x-scaled integers so "
    "every rank sum is exact — the single IEEE division happens "
    "once at the end",
)
def stats_mann_whitney(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    cnt = e.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w_run = (
        Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tt = F.col("ca") + F.col("cb")
    ranked = cnt.select(
        "ca",
        "cb",
        (2 * F.sum(tt).over(w_run) - tt + 1).alias("double_rank"),
    )
    agg = ranked.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca") * F.col("double_rank")).cast("long").alias("drs"),
    )
    u_a = (
        F.col("drs").cast("double") / 2.0
        - F.col("n_a").cast("double") * (F.col("n_a") + 1) / 2.0
    )
    return agg.select("n_a", "n_b", det_round(u_a).alias("u_a"))


# --------------------------------------------------------------------------
# stats_ols_by_group — grouped least-squares regression from exact
# integer power sums (price-vs-quantity elasticity per return flag)


@query(
    "stats_ols_by_group",
    """
    WITH q AS (
      SELECT l_returnflag AS grp,
             CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS xc,
             CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS yc
      FROM lineitem),
    m AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(xc AS DECIMAL(38,0))) AS sx,
             SUM(CAST(yc AS DECIMAL(38,0))) AS sy,
             SUM(CAST(xc AS DECIMAL(38,0)) * xc) AS sxx,
             SUM(CAST(yc AS DECIMAL(38,0)) * yc) AS syy,
             SUM(CAST(xc AS DECIMAL(38,0)) * yc) AS sxy
      FROM q GROUP BY grp),
    d AS (
      SELECT grp, n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n,
             CAST(n * sxx - sx * sx AS DOUBLE) AS var_x_n,
             CAST(n * syy - sy * sy AS DOUBLE) AS var_y_n,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM m)
    SELECT grp AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
           (FLOOR((cov_n / var_x_n) * 1000000.0 + 0.5) / 1000000.0) AS slope,
           (FLOOR(((syd - (cov_n / var_x_n) * sxd) / n / 100.0)
                  * 1000000.0 + 0.5) / 1000000.0) AS intercept,
           (FLOOR((cov_n / sqrt(var_x_n) / sqrt(var_y_n))
                  * 1000000.0 + 0.5) / 1000000.0) AS pearson_r
    FROM d
    """,
    doc="grouped OLS (extendedprice ~ quantity per return flag) with "
    "Pearson r, from EXACT centi-quantized power sums in DECIMAL(38) "
    "— slope/intercept/r are each ONE final IEEE expression over "
    "exact integers, so they hash-match across engines where a "
    "float-summed regr_slope never would. Centi (not micro) "
    "quantization keeps the per-row xc*yc product inside BIGINT "
    "(5e3 x 1e9 << 2^63) while DECIMAL(38) absorbs the sums. Scale: "
    "one map-side-partial hash agg, groups-sized exchange, no sort, "
    "no window — the same single-pass shape as variance/skewness, "
    "i.e. THE distributed closed-form-model fit",
)
def stats_ols_by_group(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    q = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity").cast("double") * 100.0).cast("long").alias("xc"),
        F.round(F.col("l_extendedprice").cast("double") * 100.0).cast("long").alias("yc"),
    )
    m = q.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("xc")).alias("sx"),
        F.sum(dec("yc")).alias("sy"),
        F.sum(dec("xc") * F.col("xc")).alias("sxx"),
        F.sum(dec("yc") * F.col("yc")).alias("syy"),
        F.sum(dec("xc") * F.col("yc")).alias("sxy"),
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_x_n = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y_n = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = cov_n / var_x_n
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col("n") / 100.0
    r = cov_n / F.sqrt(var_x_n) / F.sqrt(var_y_n)
    return m.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").cast("long").alias("n_rows"),
        det_round(slope).alias("slope"),
        det_round(intercept).alias("intercept"),
        det_round(r).alias("pearson_r"),
    )


# --------------------------------------------------------------------------
# stats_spearman_corr — rank correlation with exact tie handling


@query(
    "stats_spearman_corr",
    """
    WITH q AS (
      SELECT event_type AS grp,
             CAST(ROUND(value * 1000000.0) AS BIGINT) AS x,
             epoch_us(ts::TIMESTAMP) AS y
      FROM events WHERE value IS NOT NULL),
    ranked AS (
      SELECT grp,
             2 * rank() OVER (PARTITION BY grp ORDER BY x)
               + COUNT(*) OVER (PARTITION BY grp, x) - 1 AS rx,
             2 * rank() OVER (PARTITION BY grp ORDER BY y)
               + COUNT(*) OVER (PARTITION BY grp, y) - 1 AS ry
      FROM q),
    m AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(rx AS DECIMAL(38,0))) AS sx,
             SUM(CAST(ry AS DECIMAL(38,0))) AS sy,
             SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS sxx,
             SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS syy,
             SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS sxy
      FROM ranked GROUP BY grp)
    SELECT grp AS event_type, CAST(n AS BIGINT) AS n_rows,
           (FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                   / sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) / 1000000.0) AS spearman_rho
    FROM m
    """,
    doc="Spearman rank correlation (value vs event time per event "
    "type) with EXACT fractional tie ranks: the doubled average rank "
    "2*avg = 2*minrank + tiecount - 1 stays integer, so rho is "
    "Pearson over exact integer rank moments (DECIMAL(38) sums, one "
    "final IEEE expression) — scaling by 2 cancels in the "
    "correlation. The monotone-relationship detector Pearson can't "
    "provide. Scale: ranking windows partition by event_type "
    "(low-card — at extreme scale the swap is the two-pass "
    "cumulative-count ranking over value-distribution aggregates, "
    "the KS-test shape); the moment agg is single-pass map-side",
)
def stats_spearman_corr(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    q = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value").cast("double") * 1_000_000.0).cast("long").alias("x"),
        F.unix_micros(F.col("ts")).alias("y"),
    )
    rx = (
        2 * F.rank().over(Window.partitionBy("grp").orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("grp", "x"))
        - 1
    )
    ry = (
        2 * F.rank().over(Window.partitionBy("grp").orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("grp", "y"))
        - 1
    )
    ranked = q.select("grp", rx.alias("rx"), ry.alias("ry"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("rx")).alias("sx"),
        F.sum(dec("ry")).alias("sy"),
        F.sum(dec("rx") * F.col("rx")).alias("sxx"),
        F.sum(dec("ry") * F.col("ry")).alias("syy"),
        F.sum(dec("rx") * F.col("ry")).alias("sxy"),
    )
    rho = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    )
    return m.select(
        F.col("grp").alias("event_type"),
        F.col("n").cast("long").alias("n_rows"),
        det_round(rho).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# stats_gini_by_group — revenue concentration (inequality) per group


@query(
    "stats_gini_by_group",
    """
    WITH q AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders),
    ranked AS (
      SELECT grp, cents,
             row_number() OVER (PARTITION BY grp
                                ORDER BY cents, o_orderkey) AS i
      FROM q),
    m AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(cents AS DECIMAL(38,0))) AS s1,
             SUM(CAST(i AS DECIMAL(38,0)) * cents) AS sw
      FROM ranked GROUP BY grp)
    SELECT grp AS o_orderpriority, CAST(n AS BIGINT) AS n_orders,
           (FLOOR((CAST(2 * sw - (n + 1) * s1 AS DOUBLE)
                   / CAST(n * s1 AS DOUBLE))
                  * 1000000.0 + 0.5) / 1000000.0) AS gini
    FROM m
    """,
    doc="Gini coefficient of order-value concentration per order "
    "priority: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over "
    "rank-ordered cent values — numerator and denominator are EXACT "
    "DECIMAL(38) integers, one final IEEE division. Equal values "
    "give the same G under any tie order (they contribute equal "
    "x_i), and the (cents, orderkey) ordering key makes the rank "
    "deterministic anyway. The inequality/concentration measure "
    "every marketplace-health dashboard wants. Scale: per-group "
    "rank window (5 priorities — at extreme scale swap to the "
    "value-distribution form: G from cumulative sums over grouped "
    "value counts, a two-agg pipeline with no per-row sort)",
)
def stats_gini_by_group(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    q = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("double") * 100.0).cast("long").alias("cents"),
    )
    ranked = q.select(
        "grp",
        "cents",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("cents", "o_orderkey"))
        .alias("i"),
    )
    m = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("sw"),
    )
    gini = (2 * F.col("sw") - (F.col("n") + 1) * F.col("s1")).cast("double") / (
        F.col("n") * F.col("s1")
    ).cast("double")
    return m.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("n").cast("long").alias("n_orders"),
        det_round(gini).alias("gini"),
    )


# --------------------------------------------------------------------------
# stats_chi_square — test of independence over a contingency table


@query(
    "stats_chi_square",
    """
    WITH cells AS (
      SELECT event_type, user_id % 2 AS grp, COUNT(*) AS o
      FROM events GROUP BY event_type, grp),
    margins AS (
      SELECT c.event_type, c.grp, c.o,
             r.rt, g.ct, t.n
      FROM cells c
      JOIN (SELECT event_type, SUM(o) AS rt FROM cells GROUP BY event_type) r
        ON r.event_type = c.event_type
      JOIN (SELECT grp, SUM(o) AS ct FROM cells GROUP BY grp) g
        ON g.grp = c.grp
      CROSS JOIN (SELECT SUM(o) AS n FROM cells) t),
    contrib AS (
      SELECT event_type, grp, o,
             CAST(rt AS DOUBLE) * ct / n AS e,
             (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
               * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
               / (CAST(rt AS DOUBLE) * ct / n) AS x2
      FROM margins),
    total AS (
      SELECT list_reduce(
               list(x2 ORDER BY event_type, grp),
               (acc, v) -> acc + v) AS chi2,
             COUNT(*) AS n_cells
      FROM contrib)
    SELECT c.event_type, CAST(c.grp AS BIGINT) AS grp,
           CAST(c.o AS BIGINT) AS observed,
           (FLOOR(c.e * 1000000.0 + 0.5) / 1000000.0) AS expected,
           (FLOOR(c.x2 * 1000000.0 + 0.5) / 1000000.0) AS cell_chi2,
           (FLOOR(t.chi2 * 1000000.0 + 0.5) / 1000000.0) AS chi2_total
    FROM contrib c, total t
    """,
    doc="chi-square test of independence (event_type x user-parity "
    "arm): per-cell observed/expected/contribution plus the total "
    "statistic. Expected counts and contributions are each ONE IEEE "
    "expression over exact integer margins; the cross-cell total is "
    "a SORTED scalar list fold — (event_type, grp) order in both "
    "engines — because a hash-aggregated float SUM would "
    "hash-diverge on summation order (the EWMA-oracle lesson "
    "applied to a statistic). Scale: cells/margins are "
    "category-sized aggregates of one map-side pass; the fold runs "
    "over |types|x2 cells, never rows",
)
def stats_chi_square(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("grp")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    ct = cells.groupBy("grp").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("n"))
    m = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "grp")
        .crossJoin(F.broadcast(n))
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    x2 = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    contrib = m.select("event_type", "grp", "o", e.alias("e"), x2.alias("x2"))
    total = contrib.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "grp", "x2"))),
            F.lit(0.0),
            lambda acc, s: acc + s["x2"],
        ).alias("chi2")
    )
    return contrib.crossJoin(F.broadcast(total)).select(
        "event_type",
        F.col("grp").cast("long").alias("grp"),
        F.col("o").cast("long").alias("observed"),
        det_round(F.col("e")).alias("expected"),
        det_round(F.col("x2")).alias("cell_chi2"),
        det_round(F.col("chi2")).alias("chi2_total"),
    )
