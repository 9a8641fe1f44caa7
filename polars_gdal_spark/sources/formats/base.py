"""Driver protocol + registry.

A *resource* is a local path (str). A *layer* is a named sub-table
(GDAL's Dataset→Layer model, reference ``src/lib.rs:241-247``): GeoJSON
and CSV expose one layer; SQLite containers expose one per table.

Field dtypes use Spark DDL strings: ``bigint double string boolean
array<bigint> array<double> array<string> timestamp_ntz date``.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

from polars_gdal_spark.errors import UnsupportedFormatError


@dataclass
class Field:
    name: str
    dtype: str  # Spark DDL type string
    nullable: bool = True


@dataclass
class Feature:
    """One row from a layer: source FID, geometry (internal rep), props.

    ``wkb``: optional pre-encoded ISO WKB bytes — a driver fast path for
    formats whose on-disk coordinate layout already matches WKB (e.g.
    shapefile: little-endian float64 (x,y) pairs memcpy straight into
    the WKB body). Only emitted when the read requested wkb output and
    no bbox filter (the reader's bbox refine needs the tuple rep);
    ``geom`` is None in that case."""

    fid: int | None
    geom: tuple | None
    props: dict = field(default_factory=dict)
    wkb: bytes | None = None


class FormatDriver:
    """Abstract driver. Subclasses register via ``register()``."""

    #: GDAL-style driver short name (used by the `drivers` allow-list
    #: option, reference ReadParams.allowed_drivers src/lib.rs:41-44).
    name: str = ""
    #: filename extensions this driver claims during probing
    extensions: tuple[str, ...] = ()

    def can_open(self, path: str, head: bytes) -> bool:
        """Content-based probe (GDAL driver-probing analogue)."""
        raise NotImplementedError

    def list_layers(self, path: str, options: dict) -> list[str]:
        raise NotImplementedError

    def layer_fields(self, path: str, layer: str, options: dict) -> list[Field]:
        """Declared/inferred attribute fields (geometry NOT included)."""
        raise NotImplementedError

    def iter_features(
        self, path: str, layer: str, options: dict
    ) -> Iterator[Feature]:
        raise NotImplementedError

    # -- optional capabilities -------------------------------------------
    def layer_crs(self, path: str, layer: str, options: dict) -> str | None:
        """CRS of the layer (WKT or 'EPSG:n'), if the format stores one.
        Carried as geometry-column metadata — strictly more than the
        reference keeps (it drops CRS on read, SURVEY §1.2)."""
        return None

    def feature_count(self, path: str, layer: str, options: dict) -> int | None:
        """Cheap count if the format stores one (else None)."""
        return None

    def layer_bbox(
        self, path: str, layer: str, options: dict
    ) -> tuple[float, float, float, float] | None:
        """Layer envelope if knowable from headers/indexes WITHOUT a
        feature scan (else None). Drives spatial partition pruning: a
        multi-file read with a ``bbox`` filter skips whole files whose
        envelope misses the box — the spatial analogue of parquet
        min/max partition pruning."""
        return None

    def split_ranges(
        self, path: str, layer: str, options: dict, target_splits: int
    ) -> list[tuple[int, int]] | None:
        """Optional intra-file parallelism: list of (start, end) feature
        index ranges that ``iter_features_range`` can read independently.
        None → the file is not splittable (e.g. one JSON document)."""
        return None

    def iter_features_range(
        self, path: str, layer: str, options: dict, start: int, end: int
    ) -> Iterator[Feature]:
        raise NotImplementedError

    def iter_arrow_batches(
        self,
        path: str,
        layer: str,
        options: dict,
        columns: list[tuple[str, str, str]],
        fid_col: str | None,
        geom_col: str,
        geom_format: str,
        start: int | None = None,
        end: int | None = None,
    ):
        """Optional columnar fast path for the plain full-scan case (no
        pushed filters / bbox / offset / limit). ``columns`` is the output
        attribute spec ``[(out_name, source_name, spark_ddl_type), ...]``.
        Yield ``pyarrow.RecordBatch`` objects whose columns are exactly
        ``[fid_col?] + [out_name...] + [geom_col]`` with types mirroring
        the Spark schema, or return None when the driver (or this file /
        option combination) can't guarantee identical semantics to the
        row path — the reader then falls back to ``iter_features``."""
        return None


DRIVERS: list[FormatDriver] = []


def register(driver: FormatDriver) -> FormatDriver:
    DRIVERS.append(driver)
    return driver


def find_driver(
    path: str, allowed: list[str] | None = None
) -> FormatDriver:
    """Probe registered drivers (extension first, then content sniff),
    honoring the ``drivers`` allow-list (reference ``allowed_drivers``,
    ``src/lib.rs:41-44``)."""
    candidates = [
        d
        for d in DRIVERS
        if allowed is None or d.name.lower() in [a.lower() for a in allowed]
    ]
    try:
        with open(path, "rb") as f:
            head = f.read(4096)
    except OSError as e:
        raise UnsupportedFormatError(f"cannot open {path!r}: {e}") from e
    lowered = path.lower()
    for d in candidates:
        if any(lowered.endswith(ext) for ext in d.extensions) and d.can_open(
            path, head
        ):
            return d
    for d in candidates:
        if d.can_open(path, head):
            return d
    raise UnsupportedFormatError(
        f"no registered driver can open {path!r}"
        + (f" (allow-list: {allowed})" if allowed else "")
        + f"; supported formats: {sorted({d.name for d in DRIVERS})}"
    )
