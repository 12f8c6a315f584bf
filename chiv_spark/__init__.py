"""chiv_spark — a PySpark-native analytics + archival engine.

Re-expresses the capabilities of the reference archiver
(gavincabbage/chiv, see /root/reference/chiv.go:1 "Package chiv archives
relational data to Amazon S3") as an idiomatic Spark engine:

- ``Archiver`` / ``archive`` / ``archive_df``: the reference's
  ``Archive`` / ``ArchiveRows`` surface (chiv.go:27-52) on DataFrames.
- ``formats``: byte-compatible CSV / JSON / YAML sink encoders
  (chiv_formatters.go:42-221).
- ``operators`` / ``functions``: the relational algebra the reference
  delegates to its backing RDBMS (SURVEY.md §2.3-2.8), owned natively
  here on Catalyst, plus LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing).
- ``streaming``: Structured Streaming over event tables (net-new
  surface vs the reference, SURVEY.md §2.9).
"""

from chiv_spark.core.archiver import Archiver, archive, archive_df
from chiv_spark.core.options import ArchiveOptions
from chiv_spark.session import get_spark

__all__ = ["Archiver", "ArchiveOptions", "archive", "archive_df", "get_spark"]
__version__ = "0.1.0"
