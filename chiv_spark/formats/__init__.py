"""Sink encoders byte-compatible with the reference formatters.

Reference: /root/reference/chiv_formatters.go (CSV :42-96, YAML
:98-143, JSON :151-221, type parse table :236-276). Encoders operate
on typed Python rows (Spark already carries schema end-to-end;
SURVEY.md §1.3), so the reference's bytes→typed ``parse()`` step
becomes a serialization rule table instead.
"""

from chiv_spark.formats.base import Formatter, FormatterFunc
from chiv_spark.formats.csv_format import CsvFormatter
from chiv_spark.formats.json_format import JsonFormatter
from chiv_spark.formats.yaml_format import YamlFormatter

FORMATS: dict[str, FormatterFunc] = {
    "csv": CsvFormatter,
    "json": JsonFormatter,
    "yaml": YamlFormatter,
}

__all__ = [
    "FORMATS",
    "CsvFormatter",
    "Formatter",
    "FormatterFunc",
    "JsonFormatter",
    "YamlFormatter",
]
