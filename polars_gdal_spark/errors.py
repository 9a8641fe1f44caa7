"""Typed exception hierarchy mirroring the reference error surface.

Reference: ``src/error.rs:6-55`` — each variant maps to one exception class
with the same trigger condition (SURVEY.md §2.M). ``GdalSourceError`` is the
root so callers can catch the whole family.
"""

from __future__ import annotations


class GdalSourceError(Exception):
    """Root of the engine's error hierarchy (reference ``Error`` enum)."""


class EmptyDataError(GdalSourceError):
    """Empty byte input to an in-memory read (``src/lib.rs:205-207``)."""


class ReadonlyMustSetError(GdalSourceError):
    """In-memory reads must be opened read-only (``src/lib.rs:208-212``)."""


class UpdateNotSupportedError(GdalSourceError):
    """Update/write flags rejected on byte input (``src/lib.rs:213-217``)."""


class FeatureLimitReachedError(GdalSourceError):
    """Erroring LIMIT: source produced more than ``maxRows`` rows
    (``src/lib.rs:371-375``, ``src/error.rs:29-30``)."""

    def __init__(self, limit: int):
        self.limit = limit
        super().__init__(f"feature limit reached: source exceeds {limit} rows")


class GeometryColumnCollisionError(GdalSourceError):
    """Declared in the reference but unused (``src/error.rs:32-34``) — the
    rename path (``{name}_original``) is used instead; kept for parity."""


class FidColumnCollisionError(GdalSourceError):
    """Declared-but-unused parity twin (``src/error.rs:36-38``)."""


class GeometryColumnWrongTypeError(GdalSourceError):
    """Geometry column has the wrong dtype on write (``src/error.rs:40-42``,
    trigger ``src/lib.rs:714-733``)."""

    def __init__(self, column: str, expected: str, got: str):
        self.column, self.expected, self.got = column, expected, got
        super().__init__(
            f"geometry column {column!r}: expected {expected}, got {got}"
        )


class UnableToDetermineGeometryTypeError(GdalSourceError):
    """Geometry type sniff from row 0 failed (``src/lib.rs:529-540``)."""


class EmptyDataframeError(GdalSourceError):
    """Refuse to write an empty DataFrame (``src/lib.rs:509-511``)."""


class CannotFindGeometryColumnError(GdalSourceError):
    """Write path: named geometry column absent (``src/lib.rs:523-525``)."""

    def __init__(self, column: str):
        self.column = column
        super().__init__(f"cannot find geometry column {column!r}")


class UnsupportedFormatError(GdalSourceError):
    """No registered driver can open the resource (GDAL driver-probe miss)."""
