"""Driver-contract tests: entry/queries/oracle_sql shapes, plus a
value-level Spark-vs-DuckDB comparison for a representative sample
(the full 48-query sweep lives in tools/check_correctness.py)."""

from __future__ import annotations

import datetime as dt
import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from chiv_spark.queries import REGISTRY
from chiv_spark.sources.catalog import TABLES

SF = "/root/testdata/sf0.001"

# representative cross-section: one per operator family
SAMPLE = [
    "q5_revenue_by_nation",
    "join_anti",
    "agg_rollup",
    "window_lag_delta",
    "set_intersect",
    "scalar_date_funcs",
    "text_stats",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "events_tumbling_window",
]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


class TestContractShape:
    def test_entry_returns_rows(self, spark):
        df = entry_mod.entry(spark)
        assert df.count() > 0
        assert df.columns == ["n_name", "revenue"]

    def test_queries_and_oracles_align(self):
        qs = entry_mod.queries()
        os_ = entry_mod.oracle_sql()
        assert len(qs) >= 45
        assert set(os_) <= set(qs)
        # zero rows-only entries since round 8: the last holdout
        # (agg_approx_distinct's HLL sketch) is now boolean-gated —
        # exact COUNT(DISTINCT) hash-compared plus an integer
        # realized-error bound the oracle asserts TRUE
        assert set(qs) == set(os_)

    def test_registry_docs(self):
        for name, spec in REGISTRY.items():
            assert spec.doc, f"{name} lacks a doc string"


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF)
    srows = [tuple(_norm(v) for v in r) for r in sdf.collect()]
    res = oracle.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(_norm(v) for v in r) for r in res.fetchall()]
    assert sorted(sdf.columns) == sorted(ocols)
    order = [sdf.columns.index(c) for c in sorted(sdf.columns)]
    oorder = [ocols.index(c) for c in sorted(ocols)]
    sset = sorted((tuple(r[i] for i in order) for r in srows), key=repr)
    oset = sorted((tuple(r[i] for i in oorder) for r in orows), key=repr)
    assert len(sset) == len(oset)
    assert sset == oset
