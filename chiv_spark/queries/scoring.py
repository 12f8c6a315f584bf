"""Scoring tier: columnar model inference and behavioral scoring —
the passes that turn curated data into ranked / segmented / flagged
data without ever leaving the JVM.

- ``mlprep_linear_score``: batch inference of a linear (logistic)
  quality classifier over engineered document features. The model is
  a fixed weight vector, so scoring is a pure column expression —
  the pattern that replaces a per-row predict() UDF for any linear /
  GLM / scorecard model at 100 TB: zero shuffles, whole-stage
  codegen, one sigmoid per row.
- ``events_user_rfm``: classic RFM segmentation. Per-user
  recency/frequency/monetary in one events pass, then quartile codes
  via ntile over a (metric, user_id) total order. The global sort
  ranks the *user* dimension, not the event stream; at the point the
  user dimension itself outgrows a sort, the swap is percentile
  cutoffs + broadcast (the mlprep_winsorize shape) at the cost of
  exact quartile boundaries.
- ``text_keyword_tfidf``: per-document top-3 TF-IDF keywords. The
  tf table is corpus-sized but the df/idf side is vocabulary-keyed;
  ranking happens per-document (doc-partitioned window, no global
  sort). Ordering key is (det-rounded tfidf, token) so rank is
  insensitive to sub-rounding float noise.
- ``timeseries_cusum``: one-sided CUSUM drift detector, the
  change-point recurrence s_t = max(0, s_{t-1} + x_t - k) that SQL
  windows cannot express. Same fold contract as timeseries_ewma
  (timeseries.py:328): per-user ordered list (bounded by
  events-per-user), JVM higher-order aggregate, unique (ts,
  event_id) order makes the IEEE result identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chiv_spark.functions.detmath import (
    det_round,
    duckdb_det_round,
    duckdb_money_sum,
    money_sum,
)
from chiv_spark.queries.base import query, t

# --------------------------------------------------------------------------
# mlprep_linear_score

#: fixed "trained" logistic-regression weights for the quality model:
#: intercept, n_chars/1000, n_words/100, mean word length
_W0, _W1, _W2, _W3 = -1.4, 3.0, 2.0, -0.15
#: decision threshold on the probability
_SCORE_CUT = 0.5


@query(
    "mlprep_linear_score",
    f"""
    WITH feat AS (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) / 1000.0 AS f_chars,
             CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS f_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS f_wlen
      FROM documents)
    SELECT doc_id,
           {duckdb_det_round(
               f'1.0 / (1.0 + exp(-({_W0} + {_W1} * f_chars'
               f' + {_W2} * f_words + {_W3} * f_wlen)))')} AS quality_score,
           (1.0 / (1.0 + exp(-({_W0} + {_W1} * f_chars
              + {_W2} * f_words + {_W3} * f_wlen))) >= {_SCORE_CUT}) AS accepted
    FROM feat
    """,
    doc="batch inference of a fixed-weight logistic quality model: "
    "feature engineering + sigmoid as pure column expressions (the "
    "no-UDF replacement for per-row predict() — zero shuffles, "
    "whole-stage codegen); det-rounded probability + accept verdict",
)
def mlprep_linear_score(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("double")
    f_chars = F.col("n_chars").cast("double") / 1000.0
    f_words = n_words / 100.0
    f_wlen = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_words
    z = F.lit(_W0) + F.lit(_W1) * f_chars + F.lit(_W2) * f_words + F.lit(_W3) * f_wlen
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        "doc_id",
        det_round(score).alias("quality_score"),
        (score >= _SCORE_CUT).alias("accepted"),
    )


# --------------------------------------------------------------------------
# events_user_rfm


@query(
    "events_user_rfm",
    f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             {duckdb_money_sum('value')} AS monetary
      FROM events GROUP BY user_id),
    anchor AS (SELECT MAX(ts) AS now_ts FROM events),
    rfm AS (
      SELECT user_id,
             CAST(date_diff('day', last_ts, now_ts) AS BIGINT) AS recency_days,
             frequency, monetary
      FROM per_user CROSS JOIN anchor)
    SELECT user_id, recency_days, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_quartile
    FROM rfm
    """,
    doc="RFM segmentation: per-user recency (vs corpus max ts, a 1-row "
    "broadcast anchor) / frequency / exact-cents monetary in one "
    "events pass, then deterministic quartiles via ntile over the "
    "unique (metric, user_id) order. The sort ranks the user "
    "dimension, never the event stream; past that scale the swap is "
    "percentile cutoffs + broadcast at the cost of exact boundaries",
)
def events_user_rfm(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        money_sum("value").alias("monetary"),
    )
    anchor = e.agg(F.max("ts").alias("now_ts"))
    rfm = per_user.join(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("now_ts", "last_ts").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    return rfm.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "user_id"))
        .cast("long")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "user_id"))
        .cast("long")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "user_id"))
        .cast("long")
        .alias("m_quartile"),
    )


# --------------------------------------------------------------------------
# events_user_rfm_scalable — skew-safe twin: broadcast cutoffs, no sort


@query(
    "events_user_rfm_scalable",
    f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             {duckdb_money_sum('value')} AS monetary
      FROM events GROUP BY user_id),
    anchor AS (SELECT MAX(ts) AS now_ts FROM events),
    rfm AS (
      SELECT user_id,
             CAST(date_diff('day', last_ts, now_ts) AS BIGINT) AS recency_days,
             frequency, monetary,
             CAST(ROUND(monetary * 100) AS BIGINT) AS cents
      FROM per_user CROSS JOIN anchor),
    cuts AS (
      SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS cr,
             quantile_cont(frequency, [0.25, 0.5, 0.75]) AS cf,
             quantile_cont(cents, [0.25, 0.5, 0.75]) AS cm
      FROM rfm)
    SELECT user_id, recency_days, frequency, monetary,
           CAST(1 + len(list_filter(cr, c -> recency_days > c)) AS BIGINT)
             AS r_quartile,
           CAST(1 + len(list_filter(cf, c -> frequency < c)) AS BIGINT)
             AS f_quartile,
           CAST(1 + len(list_filter(cm, c -> cents < c)) AS BIGINT)
             AS m_quartile
    FROM rfm CROSS JOIN cuts
    """,
    doc="sixth skew-safe twin (r7 verdict task 3): RFM segmentation "
    "without the three global ntile sorts of events_user_rfm — at "
    "100 TB the per-user relation is billions of rows and an "
    "unpartitioned ntile window moves ALL of it to one task "
    "(InferWindowGroupLimit never fires on unpartitioned windows). "
    "Here the corpus never sorts: exact interpolated quartile "
    "cutoffs are one 1-row aggregate (percentile over the integer "
    "recency/frequency/cents columns — quartile fractions are "
    "dyadic, so the lerp arithmetic is EXACT in both engines "
    "regardless of their a+(b-a)f vs (1-f)a+fb formula), broadcast "
    "back, and the quartile is an array HOF count. CONTRACT (differs "
    "from ntile only on cutoff ties / n%4 != 0): r_quartile = 1 + "
    "|{{c in P25/50/75(recency) : recency > c}}| (low recency = 1), "
    "f/m_quartile = 1 + |{{c : v < c}}| (high value = 1); on "
    "distinct values with user-count divisible by 4 this equals "
    "ntile exactly (proven by the generator pytest). Monetary "
    "quartiles cut on exact integer cents so no float interpolation "
    "noise can flip a bin",
)
def events_user_rfm_scalable(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        money_sum("value").alias("monetary"),
    )
    anchor = e.agg(F.max("ts").alias("now_ts"))
    rfm = per_user.join(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("now_ts", "last_ts").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
        F.round(F.col("monetary") * 100).cast("long").alias("cents"),
    )
    cuts = rfm.agg(
        F.expr("percentile(recency_days, array(0.25, 0.5, 0.75))").alias("cr"),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias("cf"),
        F.expr("percentile(cents, array(0.25, 0.5, 0.75))").alias("cm"),
    )
    d = rfm.join(F.broadcast(cuts))
    rq = F.lit(1) + F.size(F.filter("cr", lambda c: F.col("recency_days") > c))
    fq = F.lit(1) + F.size(F.filter("cf", lambda c: F.col("frequency") < c))
    mq = F.lit(1) + F.size(F.filter("cm", lambda c: F.col("cents") < c))
    return d.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        rq.cast("long").alias("r_quartile"),
        fq.cast("long").alias("f_quartile"),
        mq.cast("long").alias("m_quartile"),
    )


# --------------------------------------------------------------------------
# text_keyword_tfidf

_TFIDF_TOPK = 3


@query(
    "text_keyword_tfidf",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, w),
    df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w, tf.tf,
             {duckdb_det_round('tf.tf * ln(n.n_docs / df.df)')} AS tfidf
      FROM tf JOIN df USING (w) CROSS JOIN n)
    SELECT doc_id, CAST(rn AS BIGINT) AS rank, w AS token, tf, tfidf
    FROM (SELECT doc_id, w, tf, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, w) AS rn
          FROM scored)
    WHERE rn <= {_TFIDF_TOPK}
    """,
    doc="per-document top-3 TF-IDF keywords: corpus-sized tf table, "
    "vocabulary-keyed df/idf join (AQE-broadcastable), doc-partitioned "
    "ranking window — no global sort; rank ordering is on the "
    "det-rounded score + token, so it cannot flip on sub-rounding "
    "float noise between engines",
)
def text_keyword_tfidf(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = tok.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "w")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            "tf",
            det_round(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    ranked = scored.select(
        "doc_id",
        "w",
        "tf",
        "tfidf",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "w"))
        .alias("rn"),
    ).filter(F.col("rn") <= _TFIDF_TOPK)
    return ranked.select(
        "doc_id",
        F.col("rn").cast("long").alias("rank"),
        F.col("w").alias("token"),
        "tf",
        "tfidf",
    )


# --------------------------------------------------------------------------
# timeseries_cusum

#: allowance (target) and decision threshold of the one-sided CUSUM
_CUSUM_K = 150.0
_CUSUM_H = 500.0


@query(
    "timeseries_cusum",
    f"""
    WITH per_user AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           {duckdb_det_round(
               'list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),'
               f' (acc, x) -> greatest(0.0, acc + x - {_CUSUM_K}))')} AS cusum_final,
           (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                        (acc, x) -> greatest(0.0, acc + x - {_CUSUM_K}))
            > {_CUSUM_H}) AS drift
    FROM per_user
    """,
    doc="one-sided CUSUM drift detector: the change-point recurrence "
    "s_t = max(0, s_(t-1) + x_t - k) folded per user over the unique "
    "(ts, event_id) order — same bounded-list higher-order-aggregate "
    "contract as timeseries_ewma; flags users whose cumulative "
    "positive drift exceeds h. No UDF, no window, one shuffle",
)
def timeseries_cusum(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    series = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ts"), F.col("event_id"), F.col("value").cast("double").alias("value")
                )
            )
        ).alias("xs")
    )
    vals = F.transform(F.col("xs"), lambda s: s["value"])
    fold = F.aggregate(
        vals,
        F.lit(0.0),
        lambda acc, x: F.greatest(F.lit(0.0), acc + x - F.lit(_CUSUM_K)),
    )
    return series.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        det_round(fold).alias("cusum_final"),
        (fold > _CUSUM_H).alias("drift"),
    )
