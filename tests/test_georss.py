"""GeoRSS driver tests: RSS 2.0 + GeoRSS-Simple, Atom entries, W3C-geo
fallback, and the lat/lon → x/y axis swap."""

from __future__ import annotations

from polars_gdal_spark.geometry import wkb_to_geom

RSS = """<?xml version="1.0"?>
<rss version="2.0" xmlns:georss="http://www.georss.org/georss"
     xmlns:geo="http://www.w3.org/2003/01/geo/wgs84_pos#">
 <channel>
  <title>quakes</title>
  <item>
   <title>M 3.2</title>
   <link>http://example.com/1</link>
   <description>small quake</description>
   <pubDate>Tue, 05 Aug 2025 01:02:03 GMT</pubDate>
   <georss:point>45.256 -71.92</georss:point>
  </item>
  <item>
   <title>fault trace</title>
   <georss:line>45.0 -71.0 46.0 -72.0</georss:line>
  </item>
  <item>
   <title>zone</title>
   <georss:polygon>45.0 -71.0 46.0 -71.0 46.0 -72.0</georss:polygon>
  </item>
  <item>
   <title>w3c point</title>
   <geo:lat>55.7</geo:lat>
   <geo:long>37.6</geo:long>
  </item>
 </channel>
</rss>
"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"
      xmlns:georss="http://www.georss.org/georss">
 <title>spots</title>
 <entry>
  <title>cafe</title>
  <link href="http://example.com/cafe"/>
  <summary>good coffee</summary>
  <updated>2025-08-05T01:02:03Z</updated>
  <georss:point>52.52 13.405</georss:point>
 </entry>
</feed>
"""


def test_rss_georss_simple(spark, tmp_path):
    p = tmp_path / "quakes.xml"
    p.write_text(RSS)
    df = spark.read.format("gdal").load(str(p))
    rows = {r["title"]: r for r in df.collect()}
    assert set(rows) == {"M 3.2", "fault trace", "zone", "w3c point"}
    assert rows["M 3.2"]["link"] == "http://example.com/1"
    assert rows["M 3.2"]["pubdate"] == "Tue, 05 Aug 2025 01:02:03 GMT"
    # lat lon -> x=lon y=lat
    t, c = wkb_to_geom(bytes(rows["M 3.2"]["geometry"]))
    assert t == "Point" and c == (-71.92, 45.256)
    t, c = wkb_to_geom(bytes(rows["fault trace"]["geometry"]))
    assert t == "LineString" and c == [(-71.0, 45.0), (-72.0, 46.0)]
    t, rings = wkb_to_geom(bytes(rows["zone"]["geometry"]))
    assert t == "Polygon"
    assert rings[0][0] == rings[0][-1]  # auto-closed
    t, c = wkb_to_geom(bytes(rows["w3c point"]["geometry"]))
    assert t == "Point" and c == (37.6, 55.7)


def test_atom_entries(spark, tmp_path):
    p = tmp_path / "spots.atom"
    p.write_text(ATOM)
    df = spark.read.format("gdal").load(str(p))
    [row] = df.collect()
    assert row["title"] == "cafe"
    assert row["link"] == "http://example.com/cafe"
    assert row["description"] == "good coffee"
    assert row["pubdate"] == "2025-08-05T01:02:03Z"
    t, c = wkb_to_geom(bytes(row["geometry"]))
    assert t == "Point" and c == (13.405, 52.52)
