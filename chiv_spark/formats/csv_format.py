"""CSV sink encoder, byte-compatible with Go ``encoding/csv``.

Reference: /root/reference/chiv_formatters.go:42-96 (header on open,
one record per row, flush on close). Quoting follows Go's
``fieldNeedsQuotes``: a field is quoted iff it contains the delimiter,
a double quote, ``\\r`` or ``\\n``, begins with a space/tab, or is the
literal ``\\.``; quotes are doubled; records end with ``\\n``.
"""

from __future__ import annotations

from collections.abc import Sequence

from chiv_spark.formats.base import ByteSink, RecordLengthError
from chiv_spark.formats.encode import to_csv_str


# Go fieldNeedsQuotes checks unicode.IsSpace on the first rune: the
# full White_Space set, not just space/tab (\v, \f, U+0085, U+00A0,
# U+1680, U+2000-200A, U+2028, U+2029, U+202F, U+205F, U+3000).
_GO_SPACE = frozenset(
    "\t\n\v\f\r \u0085\u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def _quote_field(s: str) -> str:
    if s == "\\.":
        return '"\\."'
    if s == "":
        return s
    needs = any(c in s for c in (',', '"', '\r', '\n')) or s[0] in _GO_SPACE
    if not needs:
        return s
    return '"' + s.replace('"', '""') + '"'


class CsvFormatter:
    # typed sinks receive Python-typed values; untyped sinks get strings
    typed = False
    extension = "csv"

    def __init__(self, sink: ByteSink, columns: Sequence[str]):
        self._sink = sink
        self._columns = list(columns)

    def open(self) -> None:
        self._write_record(self._columns)

    def format_row(self, record: Sequence[object]) -> None:
        if len(record) != len(self._columns):
            raise RecordLengthError()
        self._write_record([to_csv_str(v) for v in record])

    def close(self) -> None:
        pass

    def _write_record(self, fields: Sequence[str]) -> None:
        line = ",".join(_quote_field(f) for f in fields) + "\n"
        self._sink.write(line.encode("utf-8"))
