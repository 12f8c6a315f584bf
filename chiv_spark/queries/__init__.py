"""Query registry: every operator from SURVEY.md §2 plus the
LLM-pipeline operators, each as a (spark_fn, oracle_sql) pair.

``REGISTRY[name].fn(spark, sf_dir)`` returns the Spark DataFrame;
``REGISTRY[name].oracle`` is the equivalent DuckDB SQL (None only for
genuinely non-SQL-expressible ops, e.g. real Structured Streaming).
__spark_entry__.py exposes this registry to the driver.
"""

from __future__ import annotations

from chiv_spark.queries.base import REGISTRY, QuerySpec

# importing the modules populates REGISTRY
from chiv_spark.queries import (  # noqa: E402,F401
    advanced,
    curation,
    events,
    fuzzy,
    graphrag,
    ingest,
    llm,
    mining,
    mlprep,
    parity,
    quality,
    relational,
    scoring,
    stats,
    timeseries,
    tpch,
    tpch_extra,
    tpch_more,
)

__all__ = ["REGISTRY", "QuerySpec"]
