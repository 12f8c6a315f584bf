from chiv_spark.core.archiver import Archiver, archive, archive_df
from chiv_spark.core.options import ArchiveOptions

__all__ = ["ArchiveOptions", "Archiver", "archive", "archive_df"]
