"""Property-based codec tests (hypothesis): WKB/WKT/GeoJSON round-trips
are fixed points for arbitrary generated geometries (SURVEY §5 strategy
item iii)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from polars_gdal_spark.geometry import (
    geojson_to_geom,
    geom_to_geojson,
    geom_to_wkb,
    geom_to_wkt,
    wkb_to_geom,
    wkt_to_geom,
)

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
point2 = st.tuples(coord, coord)
point3 = st.tuples(coord, coord, coord)
points = st.one_of(point2, point3)


def ring(pt):
    return st.lists(pt, min_size=4, max_size=8).map(
        lambda r: r + [r[0]]  # close the ring
    )


def geometries():
    pt = st.shared(st.sampled_from([point2, point3]), key="dim").flatmap(
        lambda p: p
    )
    return st.one_of(
        pt.map(lambda c: ("Point", c)),
        st.lists(pt, min_size=2, max_size=10).map(
            lambda c: ("LineString", c)
        ),
        st.lists(pt, min_size=1, max_size=6).map(lambda c: ("MultiPoint", c)),
        st.lists(ring(pt), min_size=1, max_size=3).map(
            lambda c: ("Polygon", c)
        ),
        st.lists(
            st.lists(pt, min_size=2, max_size=6), min_size=1, max_size=4
        ).map(lambda c: ("MultiLineString", c)),
        st.lists(
            st.lists(ring(pt), min_size=1, max_size=2), min_size=1, max_size=3
        ).map(lambda c: ("MultiPolygon", c)),
    )


@given(geometries())
@settings(max_examples=200, deadline=None)
def test_wkb_fixed_point(geom):
    wkb = geom_to_wkb(geom)
    assert geom_to_wkb(wkb_to_geom(wkb)) == wkb


@given(geometries())
@settings(max_examples=200, deadline=None)
def test_wkt_fixed_point(geom):
    wkb = geom_to_wkb(geom)
    assert geom_to_wkb(wkt_to_geom(geom_to_wkt(wkb_to_geom(wkb)))) == wkb


@given(geometries())
@settings(max_examples=200, deadline=None)
def test_geojson_fixed_point(geom):
    wkb = geom_to_wkb(geom)
    gj = json.loads(json.dumps(geom_to_geojson(wkb_to_geom(wkb))))
    assert geom_to_wkb(geojson_to_geom(gj)) == wkb
