"""Source-side API.

``read_gdal_bytes`` is the engine's ``df_from_bytes`` (reference
``src/lib.rs:174-259``): parse an in-memory byte buffer as any vector
format. The reference registers the borrowed buffer as a GDAL
``/vsimem/`` virtual file with a unique per-process path
(``src/lib.rs:220-237``); the Spark analogue is a driver-local temp file
(bytes are by definition on one machine — partitioning is meaningless,
SURVEY §3.2), unique per process/call, removed after the read plan is
materialized.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from polars_gdal_spark.errors import EmptyDataError

_COUNTER = itertools.count()


def read_gdal_bytes(
    spark: SparkSession,
    data: bytes,
    filename_hint: str | None = None,
    **options: str,
) -> DataFrame:
    """Parse in-memory bytes through the gdal source and materialize.

    ``filename_hint`` matters for container formats sniffed by extension
    (reference ``src/lib.rs:163-165``, zipped-shapefile test
    ``src/test.rs:49-51``). Empty input is rejected exactly like the
    reference (``src/lib.rs:205-207``, error ``EmptyData``).
    """
    if not data:
        raise EmptyDataError("cannot read an empty byte buffer")
    from polars_gdal_spark import register_gdal_source

    register_gdal_source(spark)
    # unique per-process/per-call path (the /vsimem/ analogue,
    # reference src/lib.rs:220-226)
    hint = filename_hint or "buffer.bin"
    d = tempfile.mkdtemp(
        prefix=f"gdal_bytes_{os.getpid()}_{next(_COUNTER)}_"
    )
    path = os.path.join(d, os.path.basename(hint))
    with open(path, "wb") as f:
        f.write(data)
    reader = spark.read.format("gdal")
    for k, v in options.items():
        reader = reader.option(k, v)
    # materialize eagerly so the temp file can be dropped (read-only
    # borrow semantics, reference src/lib.rs:208-217)
    df = reader.load(path)
    rows = df.collect()
    out = spark.createDataFrame(rows, df.schema)
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    return out
