"""WFS (OGC Web Feature Service) 2.0 reader — remote-source parity with
GDAL's WFS driver (the reference reads any OGR source, including WFS,
through libgdal; ``Cargo.toml:7``).

Spark-first shape: WFS 2.0 response paging (``startIndex``/``count``)
IS a partitioning scheme — the driver makes ONE tiny ``resultType=hits``
request to learn ``numberMatched``, derives the page list, and passes
ALL page URLs as a single multi-path ``gdal``-datasource load (schema
pinned from page 1), so each page is one scan partition whose HTTP
fetch + GML parse happens on the executor that scans it (per-machine
cache in ``_localize``). A parallel remote scan: N pages → N scan
tasks, one plan node, constant driver memory.

Responses are GML; the existing streaming GML driver parses them
(``wfs:member`` is already a recognized feature wrapper). A ``bbox``
is forwarded as the WFS BBOX parameter, so spatial filtering happens
SERVER-side — the OGC analogue of filter pushdown.
"""

from __future__ import annotations

import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession


def _with_params(base_url: str, params: dict) -> str:
    sep = "&" if "?" in base_url else "?"
    return base_url + sep + urllib.parse.urlencode(params)


def wfs_hits(base_url: str, typename: str, bbox=None, version="2.0.0") -> int:
    """``numberMatched`` from a ``resultType=hits`` probe (no features
    transferred — the standard way to size a WFS result)."""
    params = {
        "service": "WFS",
        "version": version,
        "request": "GetFeature",
        "typenames": typename,
        "resultType": "hits",
    }
    if bbox is not None:
        params["bbox"] = ",".join(str(v) for v in bbox)
    with urllib.request.urlopen(_with_params(base_url, params)) as r:  # noqa: S310
        root = ET.fromstring(r.read())
    n = root.attrib.get("numberMatched")
    if n is None or not str(n).isdigit():
        raise ValueError(
            f"WFS hits probe returned no numberMatched (got {n!r})"
        )
    return int(n)


def read_wfs(
    spark: SparkSession,
    base_url: str,
    typename: str,
    page_size: int = 5000,
    bbox=None,
    version: str = "2.0.0",
    sort_by: str | None = None,
    **reader_options,
) -> DataFrame:
    """Paged parallel WFS read → DataFrame with WKB ``geometry``.

    All page URLs go into ONE datasource ``load()`` (newline-joined
    multi-path), so partition planning stays inside the datasource: the
    driver fetches and parses exactly one page (the first, for schema
    inference) at plan time; every page — including the first — is an
    executor-side fetch + GML parse at scan time. Constant driver memory
    and a flat one-node scan lineage regardless of ``numberMatched``.

    Pages missing optional properties that page 1 carried are null-
    backfilled by the reader (file-datasource drift semantics); a
    property appearing ONLY on a later page is dropped, since the schema
    is pinned from page 1 — for a single WFS typename the server schema
    is fixed, so this doesn't occur in practice.

    ``sort_by`` is forwarded as the WFS ``sortBy`` parameter. Pass it
    (e.g. the feature id property) for servers whose unsorted paging
    order is unstable — WFS 2.0 only guarantees consistent pages under
    an explicit sort, and unstable order can duplicate or drop features
    across ``startIndex`` boundaries.
    """
    total = wfs_hits(base_url, typename, bbox=bbox, version=version)
    params = {
        "service": "WFS",
        "version": version,
        "request": "GetFeature",
        "typenames": typename,
        "count": page_size,
    }
    if bbox is not None:
        params["bbox"] = ",".join(str(v) for v in bbox)
    if sort_by is not None:
        params["sortBy"] = sort_by
    urls = [
        _with_params(base_url, {**params, "startIndex": start})
        for start in range(0, max(total, 1), page_size)
    ]
    # Schema from the FIRST page only — one driver-side fetch; passing it
    # explicitly below means DataSource.schema() never runs, so no other
    # page is touched until executors scan.
    from polars_gdal_spark.sources.datasource import infer_schema

    schema = infer_schema({**reader_options, "path": urls[0]})
    return (
        spark.read.format("gdal")
        .schema(schema)
        .options(**reader_options)
        .load("\n".join(urls))
    )
