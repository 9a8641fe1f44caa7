"""Vector-format drivers (the engine's analogue of GDAL's driver layer).

Each driver is pure Python (no GDAL binding exists in this environment)
and implements the small protocol in ``base.py``: layer listing, schema
description, and feature iteration. The DataSource on top owns the
Spark-facing semantics (fid/geometry columns, offset/limit, schema
drift, pruning) so drivers stay dumb byte parsers — mirroring how the
reference delegates parsing to GDAL and owns only the pivot
(reference ``src/lib.rs:332-485``).
"""

from polars_gdal_spark.sources.formats.base import (  # noqa: F401
    DRIVERS,
    Feature,
    Field,
    FormatDriver,
    find_driver,
)

# Import side-effects register the drivers (probe order: extension match
# first, then content sniff — see base.find_driver).
from polars_gdal_spark.sources.formats import (  # noqa: F401, E402
    arrow_ipc,
    csv_xy,
    dxf,
    esrijson,
    flatgeobuf,
    geojson,
    georss,
    gml,
    kml_gpx,
    mapinfo_mif,
    mapinfo_tab,
    osm_xml,
    shapefile,
    sqlite_vec,
    topojson,
    vrt,
    zipped,
)
