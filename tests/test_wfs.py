"""WFS 2.0 reader against a local in-process HTTP server: hits probe,
page partitioning, bbox forwarding, GML member parsing end-to-end."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from polars_gdal_spark.sources.wfs import read_wfs, wfs_hits

CITIES = [
    ("alpha", 1.0, 2.0),
    ("beta", 3.0, 4.0),
    ("gamma", 5.0, 6.0),
    ("delta", 7.0, 8.0),
    ("epsilon", 9.0, 10.0),
]


def _collection(members, matched):
    rows = "".join(
        f"""
  <wfs:member>
    <app:city gml:id="c{i}">
      <app:name>{name}</app:name>
      <app:geom>
        <gml:Point srsName="EPSG:4326"><gml:pos>{x} {y}</gml:pos></gml:Point>
      </app:geom>
    </app:city>
  </wfs:member>"""
        for i, (name, x, y) in enumerate(members)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<wfs:FeatureCollection numberMatched="{matched}" '
        f'numberReturned="{len(members)}" '
        'xmlns:wfs="http://www.opengis.net/wfs/2.0" '
        'xmlns:gml="http://www.opengis.net/gml/3.2" '
        'xmlns:app="http://example.com/app">'
        f"{rows}\n</wfs:FeatureCollection>"
    )


class _Handler(BaseHTTPRequestHandler):
    requests_seen = []

    def do_GET(self):  # noqa: N802
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
        type(self).requests_seen.append(q)
        if q.get("resultType") == "hits":
            body = _collection([], len(CITIES))
        else:
            start = int(q.get("startIndex", 0))
            count = int(q.get("count", 1000))
            body = _collection(CITIES[start : start + count], len(CITIES))
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/gml+xml")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def wfs_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.requests_seen = []
    yield f"http://127.0.0.1:{srv.server_address[1]}/wfs"
    srv.shutdown()


def test_wfs_hits(wfs_server):
    assert wfs_hits(wfs_server, "app:city") == 5


def test_wfs_paged_read(spark, wfs_server):
    df = read_wfs(spark, wfs_server, "app:city", page_size=2)
    rows = df.collect()
    assert len(rows) == 5
    assert sorted(r["name"] for r in rows) == sorted(n for n, _, _ in CITIES)
    # every row carries a WKB point
    assert all(r["geometry"] is not None for r in rows)
    # 1 hits probe + 3 pages of <=2 (driver) + executor re-fetches; the
    # page split must reflect numberMatched
    starts = sorted(
        int(q["startIndex"])
        for q in _Handler.requests_seen
        if "startIndex" in q
    )
    assert set(starts) == {0, 2, 4}


def test_wfs_bbox_forwarded(spark, wfs_server):
    read_wfs(
        spark, wfs_server, "app:city", page_size=10, bbox=(0, 0, 6, 7)
    ).count()
    assert any(
        q.get("bbox") == "0,0,6,7" for q in _Handler.requests_seen
    )


def test_wfs_plan_time_fetches_one_page(spark, wfs_server):
    """Plan time must cost 1 hits probe + 1 schema page — the driver may
    not download/parse every page eagerly (round-3 advice)."""
    df = read_wfs(spark, wfs_server, "app:city", page_size=2)
    starts = {
        int(q["startIndex"])
        for q in _Handler.requests_seen
        if "startIndex" in q
    }
    assert starts == {0}, f"plan time touched pages {starts}"
    assert df.count() == 5  # scan still reads every page


def test_wfs_sort_by_forwarded(spark, wfs_server):
    read_wfs(
        spark, wfs_server, "app:city", page_size=2, sort_by="app:name"
    ).count()
    assert all(
        q.get("sortBy") == "app:name"
        for q in _Handler.requests_seen
        if "startIndex" in q
    )
