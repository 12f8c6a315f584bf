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
    """Exact SUM of a fixed-point double column via decimal transit;
    returned as double (identical bits in both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def duckdb_money_sum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
