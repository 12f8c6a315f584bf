"""Bucketed-table join: the co-located fact-fact join for the 100 TB
path — both sides bucketed on the join key join WITHOUT a shuffle
exchange (SCALING.md 'Joins')."""

from __future__ import annotations

import re

import pytest

from chiv_spark.plans import op_counts, physical_plan
from chiv_spark.queries.base import t as read_t


@pytest.mark.slow
class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir, tmp_path):
        # warehouse.dir is a static conf — tables land in the default
        # spark-warehouse/ (gitignored) and are dropped afterwards
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
        try:
            li = read_t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
            orders = read_t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
            (
                li.write.mode("overwrite")
                .bucketBy(8, "l_orderkey")
                .sortBy("l_orderkey")
                .saveAsTable("li_bkt")
            )
            (
                orders.write.mode("overwrite")
                .bucketBy(8, "o_orderkey")
                .sortBy("o_orderkey")
                .saveAsTable("ord_bkt")
            )
            joined = spark.table("li_bkt").join(
                spark.table("ord_bkt"),
                spark.table("li_bkt").l_orderkey == spark.table("ord_bkt").o_orderkey,
            )
            plan = physical_plan(joined)
            ops = op_counts(joined)
            # co-located: SortMergeJoin with ZERO shuffle exchanges
            assert ops.get("SortMergeJoin", 0) == 1, ops
            n_shuffle_exchanges = len(re.findall(r"Exchange (hashpartitioning|rangepartitioning)", plan))
            assert n_shuffle_exchanges == 0, plan[:500]
            # and the result is correct
            assert joined.count() == li.count()
        finally:
            spark.sql("DROP TABLE IF EXISTS li_bkt")
            spark.sql("DROP TABLE IF EXISTS ord_bkt")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
