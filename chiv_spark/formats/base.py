"""Formatter lifecycle protocol.

Mirrors the reference's ``Formatter`` interface —
``Open() → Format(record) per row → Close()``
(/root/reference/chiv_formatters.go:28-35) — and the ``Extensioner``
default-extension hook (:38-40). A formatter is constructed with the
output column names (the reference passes ``[]Column``; Spark carries
a full ``StructType`` so names suffice here) and writes encoded bytes
into any ``write(bytes)``-able sink, the analog of the reference's
``io.Writer`` end of its pipe (/root/reference/chiv.go:128-129).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Protocol, runtime_checkable


class ByteSink(Protocol):
    def write(self, data: bytes) -> object: ...


@runtime_checkable
class Formatter(Protocol):
    """Open/format/close encoder lifecycle (chiv_formatters.go:28-35)."""

    extension: str | None

    def open(self) -> None: ...

    def format_row(self, record: Sequence[object]) -> None: ...

    def close(self) -> None: ...


# The reference's FormatterFunc (chiv_formatters.go:23-24): given a
# writer and columns, return an initialized Formatter.
FormatterFunc = Callable[[ByteSink, Sequence[str]], Formatter]


class RecordLengthError(ValueError):
    """Raised when a record's arity doesn't match the column list
    (reference behavior at chiv_formatters.go:71-73)."""

    def __init__(self) -> None:
        super().__init__("record length does not match number of columns")
