"""Engine operators.

- ``relational``: the algebra the reference delegates to its RDBMS
  (SURVEY.md §2.3-2.8) — thin, named, tested builders over Catalyst.
- ``dedup`` / ``similarity`` / ``text`` / ``multimodal``: the
  LLM-data-pipeline operators (BASELINE.json north star), designed
  for 100 TB: banded LSH instead of quadratic self-joins, integer
  quantization for cross-engine determinism, JVM-side expressions
  throughout (no Python UDFs in hot paths).
"""
