"""WFS (OGC Web Feature Service) 2.0 reader — remote-source parity with
GDAL's WFS driver (the reference reads any OGR source, including WFS,
through libgdal; ``Cargo.toml:7``).

Spark-first shape: WFS 2.0 response paging (``startIndex``/``count``)
IS a partitioning scheme — the driver makes ONE tiny ``resultType=hits``
request to learn ``numberMatched``, derives the page list, and each
page becomes an independent ``gdal``-datasource read of its own
GetFeature URL (the per-machine HTTP cache in ``_localize`` fetches it
on the executor that scans it). The union of pages is therefore a
parallel remote scan: N pages → N scan tasks, no driver-side feature
parsing, constant driver memory.

Responses are GML; the existing streaming GML driver parses them
(``wfs:member`` is already a recognized feature wrapper). A ``bbox``
is forwarded as the WFS BBOX parameter, so spatial filtering happens
SERVER-side — the OGC analogue of filter pushdown.
"""

from __future__ import annotations

import functools
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
    **reader_options,
) -> DataFrame:
    """Paged parallel WFS read → DataFrame with WKB ``geometry``.

    Each page is one partition's HTTP fetch + GML parse; pages union by
    name with missing-column tolerance (WFS pages can legitimately
    differ in which optional properties appear — the same per-file
    schema-drift semantics as the file datasource).
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
    pages = []
    for start in range(0, max(total, 1), page_size):
        url = _with_params(base_url, {**params, "startIndex": start})
        pages.append(
            spark.read.format("gdal").options(**reader_options).load(url)
        )
    return functools.reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), pages
    )
