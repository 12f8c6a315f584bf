"""JSON sink encoder: one array, streamed, sorted keys.

Reference: /root/reference/chiv_formatters.go:151-221 — ``[`` on open,
comma-separated compact objects per row (keys sorted — Go map
marshalling), ``]`` on close. Values are typed (the reference's
``parse()`` table, :244-276); here values arrive typed from Spark and
serialize via :mod:`chiv_spark.formats.encode`.
"""

from __future__ import annotations

from collections.abc import Sequence

from chiv_spark.formats.base import ByteSink, RecordLengthError
from chiv_spark.formats.encode import json_escape, json_value


class JsonFormatter:
    # typed sinks receive Python-typed values; untyped sinks get strings
    typed = True
    extension = "json"

    def __init__(self, sink: ByteSink, columns: Sequence[str]):
        self._sink = sink
        self._columns = list(columns)
        # pre-sort once: (sorted_name, original_index)
        self._order = sorted(range(len(self._columns)), key=lambda i: self._columns[i])
        self._not_first = False

    def open(self) -> None:
        self._sink.write(b"[")

    def format_row(self, record: Sequence[object]) -> None:
        if len(record) != len(self._columns):
            raise RecordLengthError()
        parts = [
            f"{json_escape(self._columns[i])}:{json_value(record[i])}" for i in self._order
        ]
        body = "{" + ",".join(parts) + "}"
        if self._not_first:
            self._sink.write(b",")
        self._sink.write(body.encode("utf-8"))
        self._not_first = True

    def close(self) -> None:
        self._sink.write(b"]")
