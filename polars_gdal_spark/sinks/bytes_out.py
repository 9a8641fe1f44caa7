"""DataFrame → encoded bytes of any supported vector format.

The engine's ``gdal_bytes_from_df`` (reference ``src/lib.rs:586-611``):
the reference encodes into a unique ``/vsimem/`` path and copies the
bytes out; here the writer pipeline targets a unique driver-local temp
path and the bytes are read back. Multi-file formats (shapefile) return
a dict of extension → bytes.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

from polars_gdal_spark.errors import EmptyDataframeError

_EXT = {
    "geojson": ".geojson",
    "geojsonseq": ".ndjson",
    "csv": ".csv",
    "gpkg": ".gpkg",
    "esri shapefile": ".shp",
    "shapefile": ".shp",
    "shp": ".shp",
}


def write_gdal_bytes(
    df: DataFrame, driver: str = "GeoJSON", **options: str
) -> bytes | dict[str, bytes]:
    """Encode a geometry-bearing DataFrame to in-memory bytes.

    Single-file drivers return ``bytes``; the shapefile driver returns
    ``{".shp": ..., ".shx": ..., ".dbf": ..., ".prj": ...}``. Empty
    DataFrames are rejected (reference ``src/lib.rs:509-511``).
    """
    ext = _EXT.get(driver.lower())
    if ext is None:
        raise ValueError(f"unsupported driver {driver!r}")
    d = tempfile.mkdtemp(prefix=f"gdal_bytes_out_{os.getpid()}_")
    path = os.path.join(d, f"out{ext}")
    try:
        w = df.write.format("gdal").mode("overwrite").option("driver", driver)
        for k, v in options.items():
            w = w.option(k, v)
        w.save(path)
        if ext == ".shp":
            out = {}
            for p in glob.glob(os.path.join(d, "out.*")):
                with open(p, "rb") as f:
                    out[os.path.splitext(p)[1]] = f.read()
            return out
        with open(path, "rb") as f:
            return f.read()
    finally:
        shutil.rmtree(d, ignore_errors=True)
