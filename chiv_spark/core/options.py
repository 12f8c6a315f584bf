"""Archive options with the reference's five functional options and
override precedence.

Reference: /root/reference/chiv_options.go:4-39 (``WithFormat``,
``WithKey``, ``WithExtension``, ``WithNull``, ``WithColumns``) and the
copy-override precedence at /root/reference/chiv.go:88-91 (per-call
options shadow constructor options without mutating the archiver).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Union

from chiv_spark.formats.base import FormatterFunc

_UNSET = object()


@dataclass(frozen=True)
class ArchiveOptions:
    # name of a built-in format ("csv"/"json"/"yaml") or a custom
    # FormatterFunc — the reference's WithFormat (chiv_options.go:7-11);
    # CSV is the constructor default (chiv.go:71).
    format: Union[str, FormatterFunc] = "csv"
    # explicit upload key — WithKey (chiv_options.go:14-18)
    key: str | None = None
    # explicit extension — WithExtension (chiv_options.go:21-25);
    # formatter-provided extension applies only when unset (chiv.go:132-134)
    extension: str | None = None
    # NULL placeholder — WithNull (chiv_options.go:28-32), substituted
    # before encoding (chiv.go:175-181)
    null: str | None = None
    # column projection — WithColumns (chiv_options.go:35-39)
    columns: tuple[str, ...] | None = None

    def merged(self, **overrides: object) -> "ArchiveOptions":
        """Per-call options shadow defaults (chiv.go:88-91)."""
        clean = {k: v for k, v in overrides.items() if v is not _UNSET and v is not None}
        if "columns" in clean:
            clean["columns"] = tuple(clean["columns"])  # type: ignore[arg-type]
        return replace(self, **clean)  # type: ignore[arg-type]
