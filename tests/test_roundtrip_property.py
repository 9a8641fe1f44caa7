"""Property-based DataSource round-trip (SURVEY §5 iii): generated
feature collections survive read→write→read across sink drivers with
byte-identical WKB and equal attributes."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

coord = st.floats(
    min_value=-179, max_value=179, allow_nan=False, allow_infinity=False
)

attr_value = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters='",\n\r'
        ),
        max_size=20,
    ),
    st.none(),
)


@st.composite
def feature_collections(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    keys = draw(
        st.lists(
            st.text(
                alphabet="abcdefghijklmnop_", min_size=1, max_size=8
            ),
            min_size=1,
            max_size=4,
            unique=True,
        )
    )
    feats = []
    for i in range(n):
        props = {k: draw(attr_value) for k in keys}
        geom = {
            "type": "Point",
            "coordinates": [draw(coord), draw(coord)],
        }
        feats.append(
            {"type": "Feature", "geometry": geom, "properties": props}
        )
    return {"type": "FeatureCollection", "features": feats}


@given(fc=feature_collections())
@settings(
    max_examples=5,  # Spark-in-the-loop: each example costs several jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.parametrize(
    "driver,ext",
    [
        ("GeoJSON", "geojson"),
        ("GPKG", "gpkg"),
        # MIF's MID attribute channel cannot distinguish '' from null
        # (same collapse as shapefile DBF) — canon() normalizes below.
        ("MapInfo File", "mif"),
        ("FlatGeobuf", "fgb"),
        # TAB quantizes coordinates into its 10^7 integer space and its
        # fixed-width Char channel pads with spaces — canon() compares
        # the quantized integers and rstrips text for this driver.
        ("MapInfo File", "tab"),
    ],
)
def test_roundtrip_fixed_point(spark, tmp_path_factory, fc, driver, ext):
    tmp = tmp_path_factory.mktemp("rtp")
    src_path = tmp / "in.geojson"
    src_path.write_text(json.dumps(fc))
    df = spark.read.format("gdal").load(str(src_path))

    out = str(tmp / f"out.{ext}")
    df.write.format("gdal").mode("overwrite").option("driver", driver).save(out)
    back = spark.read.format("gdal").load(out)

    def canon(frame):
        cols = sorted(c for c in frame.columns if c != "geometry")
        dtypes = dict(frame.dtypes)
        rows = []
        for r in frame.collect():
            vals = []
            for c in cols:
                v = r[c]
                # TAB's binary numeric channels have no null encoding
                # (MapInfo has no null concept; GDAL writes 0 too) —
                # collapse on both sides of the compare.
                if ext == "tab" and v is None:
                    v = {"bigint": 0, "double": 0.0, "boolean": False}.get(
                        dtypes.get(c), v
                    )
                # sinks serialize through text (GeoJSON numbers / GPKG
                # TEXT affinity for strings); normalize for compare.
                # -0.0 → 0.0: SQLite's record format stores integral
                # REALs as integers, so -0.0 cannot round-trip through
                # GPKG/SpatiaLite (GDAL's own driver has the same
                # normalization).
                if isinstance(v, float) and v == 0.0:
                    v = 0.0
                if ext == "tab" and isinstance(v, str):
                    v = v.rstrip("\x00 ")
                s = str(v) if v is not None else None
                # MIF/MID (like DBF) writes null text as '' — both sides
                # of the compare collapse to None for that channel.
                if ext in ("mif", "tab") and s == "":
                    s = None
                vals.append(s)
            geom = r["geometry"]
            if geom is None:
                vals.append(None)
            elif ext == "tab":
                # quantized-integer compare: the writer's exact transform
                from polars_gdal_spark.geometry import wkb_to_geom

                _, (x, y) = wkb_to_geom(bytes(geom))
                vals.append(f"{round(x * 10**7)}:{round(y * 10**7)}")
            else:
                vals.append(bytes(geom).hex())
            rows.append(tuple(vals))
        return sorted(rows, key=lambda t: tuple(v or "" for v in t))

    assert canon(back) == canon(df)
