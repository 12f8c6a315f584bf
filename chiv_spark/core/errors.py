"""Error wrapping parity with the reference.

The reference wraps every failure site with a stage-chained message
(``errorf``, /root/reference/chiv.go:255-257; sites asserted string-
exact by its unit tests, chiv_test.go:61-148): ``chiv: querying 't':
…``, ``chiv: downloading: formatting row: …``, ``chiv: uploading: …``.
This engine raises ``ArchiveError`` with the same stage chain so
callers can match on stage or message.
"""

from __future__ import annotations


class ArchiveError(RuntimeError):
    """Stage-chained archive failure (reference errorf parity)."""

    def __init__(self, stage: str, cause: BaseException):
        self.stage = stage
        self.cause = cause
        super().__init__(f"chiv: {stage}: {cause}")


class UploadError(ArchiveError):
    """Failure writing to the storage sink (the reference's uploading
    stage, chiv.go:217-244)."""

    def __init__(self, cause: BaseException):
        super().__init__("uploading", cause)


class _UploadGuard:
    """Wraps a storage sink so write failures surface as UploadError
    even when raised from inside a formatter's encode call — the
    analog of the reference's pipe separating producer and consumer
    errors."""

    def __init__(self, sink: object):
        self._sink = sink

    def write(self, data: bytes) -> None:
        try:
            self._sink.write(data)
        except ArchiveError:
            raise
        except Exception as e:  # noqa: BLE001
            raise UploadError(e) from e
