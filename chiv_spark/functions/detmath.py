"""Cross-engine deterministic numeric helpers.

Float results must hash-match between Spark and the DuckDB oracle, so:

- Sums over money columns go through DECIMAL (exact, order-free):
  the test data's money columns are exact 2-decimal doubles, so the
  double→decimal cast is lossless and SUM is exact integer arithmetic
  in both engines.
- Rounding uses ``floor(x * 10^n + 0.5) / 10^n`` instead of each
  engine's ``round()``: Spark rounds via BigDecimal-of-shortest-repr
  (HALF_UP on the decimal string) while DuckDB rounds the binary
  double — they disagree on values whose shortest representation is a
  decimal tie. The floor formula is pure IEEE arithmetic, computed
  bit-identically by both engines on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def det_round(col: Column, digits: int = 6) -> Column:
    """Deterministic half-up rounding via pure IEEE float ops."""
    scale = float(10**digits)
    return (F.floor(col.cast("double") * scale + F.lit(0.5)) / scale).cast("double")


def duckdb_det_round(expr: str, digits: int = 6) -> str:
    scale = float(10**digits)
    return f"(FLOOR(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) / {scale})"


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact SUM of a fixed-point double column via integer cents
    (round(x*10^scale)::long), returned as double.

    ~2× faster than decimal transit (plain long hash-agg) and equally
    exact/order-free. Overflow bound: max|x|·10^scale · rows_per_group
    < 2^63 — for 2-decimal prices ≤ 10^7 cents that allows ~9·10^11
    rows per group, comfortably past the 100 TB point for plain
    column sums. Products of columns exceed the bound and use DECIMAL
    transit instead (see queries/tpch.py)."""
    c = F.col(col) if isinstance(col, str) else col
    factor = 10**scale
    return (F.sum(F.round(c * factor).cast("long")) / float(factor)).cast("double")


def duckdb_money_sum(expr: str, scale: int = 2) -> str:
    factor = 10**scale
    return f"(CAST(SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) AS DOUBLE) / {float(factor)})"
