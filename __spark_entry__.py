"""Driver contract for the spark-graft builder (PySpark target).

Backed by the chiv_spark engine: ``chiv_spark.queries.REGISTRY`` holds
every implemented operator from SURVEY.md §2 as a (spark_fn,
oracle_sql) pair; this module just exposes the registry in the
driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Python workers resolve imports through PYTHONPATH, not the driver's
# sys.path — export so worker-side closure deserialization can import
# chiv_spark even when the harness runs from another directory
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import DataFrame, SparkSession

from chiv_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation —
    the star-schema join+agg the reference delegates to its RDBMS
    (SURVEY.md §7.1), run natively on Catalyst."""
    return REGISTRY["q5_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible
    ops: streaming, Pandas-UDF plumbing, approximate sketches)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
