"""ESRI Shapefile writer (.shp/.shx/.dbf/.prj) — pure Python.

Write-side twin of sources/formats/shapefile.py, per the same public
spec. Geometry support: Point, MultiPoint, LineString/MultiLineString
(→PolyLine), Polygon/MultiPolygon (→Polygon with CW outer / CCW hole
ring orientation enforced). Attributes map to dBase III fields
(string→C, bigint→N(18,0), double→N(24,10), boolean→L, date→D) —
completing what the reference's dtype map covers (src/lib.rs:672-705)
without its silent column drops.
"""

from __future__ import annotations

import datetime as dt
import os
import struct

_SHAPE_CODES = {
    "Point": 1,
    "LineString": 3,
    "Polygon": 5,
    "MultiPoint": 8,
    "MultiLineString": 3,
    "MultiPolygon": 5,
}
# Z-variant codes (spec: PointZ=11, PolyLineZ=13, PolygonZ=15,
# MultiPointZ=18); measure (M) arrays written as NoData (< -1e38)
_Z_CODES = {1: 11, 3: 13, 5: 15, 8: 18}
_M_NODATA = -1e39


def _geom_has_z(geom) -> bool:
    t, c = geom
    probe = c
    depth = {
        "Point": 0, "LineString": 1, "MultiPoint": 1,
        "Polygon": 2, "MultiLineString": 2, "MultiPolygon": 3,
    }[t]
    for _ in range(depth):
        if not probe:
            return False
        probe = probe[0]
    return len(probe) >= 3


def _z_of(p) -> float:
    return float(p[2]) if len(p) >= 3 else 0.0


def _z_block(pts) -> bytes:
    zs = [_z_of(p) for p in pts]
    out = struct.pack("<2d", min(zs), max(zs))
    out += struct.pack(f"<{len(zs)}d", *zs)
    # measure block: range + per-point NoData
    out += struct.pack("<2d", _M_NODATA, _M_NODATA)
    out += struct.pack(f"<{len(pts)}d", *([_M_NODATA] * len(pts)))
    return out

_WGS84_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def _ring_clockwise(ring) -> bool:
    s = 0.0
    for i in range(len(ring) - 1):
        s += (ring[i + 1][0] - ring[i][0]) * (ring[i + 1][1] + ring[i][1])
    return s > 0


def _orient(ring, clockwise: bool):
    return ring if _ring_clockwise(ring) == clockwise else list(reversed(ring))


def _poly_rings(geom) -> list[list]:
    """Polygon/MultiPolygon → flat ring list with shapefile orientation."""
    t, c = geom
    polys = [c] if t == "Polygon" else c
    rings = []
    for poly in polys:
        for j, ring in enumerate(poly):
            rings.append(_orient(ring, clockwise=(j == 0)))
    return rings


def _line_parts(geom) -> list[list]:
    t, c = geom
    return [c] if t == "LineString" else c


def _shape_content(geom) -> bytes:
    t, c = geom
    code = _SHAPE_CODES[t]
    has_z = _geom_has_z(geom)
    if has_z:
        code = _Z_CODES[code]
    if t == "Point":
        if has_z:
            return struct.pack("<i4d", code, c[0], c[1], _z_of(c), _M_NODATA)
        return struct.pack("<i2d", code, c[0], c[1])
    if t == "MultiPoint":
        xs = [p[0] for p in c]
        ys = [p[1] for p in c]
        out = struct.pack(
            "<i4di", code, min(xs), min(ys), max(xs), max(ys), len(c)
        )
        for p in c:
            out += struct.pack("<2d", p[0], p[1])
        if has_z:
            out += _z_block(c)
        return out
    parts = _poly_rings(geom) if code in (5, 15) else _line_parts(geom)
    pts = [p for part in parts for p in part]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    out = struct.pack(
        "<i4d2i", code, min(xs), min(ys), max(xs), max(ys), len(parts), len(pts)
    )
    idx = 0
    for part in parts:
        out += struct.pack("<i", idx)
        idx += len(part)
    for p in pts:
        out += struct.pack("<2d", p[0], p[1])
    if has_z:
        out += _z_block(pts)
    return out


def _header(
    shape_code: int, file_words: int, bbox, zrange=(0.0, 0.0)
) -> bytes:
    return (
        struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, file_words)
        + struct.pack("<2i", 1000, shape_code)
        + struct.pack(
            "<8d",
            bbox[0], bbox[1], bbox[2], bbox[3],
            zrange[0], zrange[1], 0, 0,
        )
    )


def _dbf_field_spec(name: str, ddl: str) -> tuple[str, str, int, int]:
    name = name[:10]
    if ddl in ("bigint", "int", "smallint"):
        return (name, "N", 18, 0)
    if ddl in ("double", "float"):
        return (name, "N", 24, 10)
    if ddl == "boolean":
        return (name, "L", 1, 0)
    if ddl == "date":
        return (name, "D", 8, 0)
    return (name, "C", 254, 0)


def _dbf_value(
    v, ftype: str, length: int, decimals: int, enc: str = "latin-1"
) -> bytes:
    if v is None:
        return b" " * length
    if ftype == "N":
        text = (
            f"{v:.{decimals}f}" if decimals else str(int(v))
        )
        return text[:length].rjust(length).encode("latin-1", "replace")
    if ftype == "L":
        return b"T" if v else b"F"
    if ftype == "D":
        if isinstance(v, (dt.date, dt.datetime)):
            return v.strftime("%Y%m%d").encode()
        return str(v).replace("-", "")[:8].ljust(8).encode()
    raw = str(v).encode(enc, "replace")[:length]
    if enc == "utf-8":
        # never leave a split multi-byte sequence at the truncation edge
        raw = raw.decode("utf-8", "ignore").encode("utf-8")
    return raw.ljust(length)


def write_shapefile(
    path: str,
    fields: list[tuple[str, str]],  # (name, spark ddl type)
    features,  # iterable of (geom_internal, props_dict)
    srs_wkt: str | None = _WGS84_WKT,
) -> None:
    base = os.path.splitext(path)[0]
    specs = [_dbf_field_spec(n, t) for n, t in fields]
    names = [n for n, _ in fields]

    shp_records: list[bytes] = []
    row_props: list[dict] = []
    needs_utf8 = False
    shape_code = None
    bbox = [float("inf"), float("inf"), float("-inf"), float("-inf")]
    zmin, zmax = float("inf"), float("-inf")
    for geom, props in features:
        if geom is None:
            content = struct.pack("<i", 0)  # null shape
        else:
            content = _shape_content(geom)
            code = struct.unpack("<i", content[:4])[0]
            if shape_code is None:
                shape_code = code
            elif code != shape_code:
                # A shapefile holds exactly ONE shape type (spec p.4);
                # GDAL errors on mismatched writes, so do we instead of
                # emitting a spec-invalid file.
                raise ValueError(
                    "shapefile layers hold a single geometry type: "
                    f"first feature wrote shape code {shape_code}, "
                    f"got {code} ({geom[0]})"
                )
            # accumulate bbox from the content's coordinates
            t, c = geom
            pts = []

            def walk(node):
                if isinstance(node, tuple) and node and isinstance(
                    node[0], (int, float)
                ):
                    pts.append(node)
                else:
                    for sub in node:
                        walk(sub)

            walk(c)
            for p in pts:
                bbox[0] = min(bbox[0], p[0])
                bbox[1] = min(bbox[1], p[1])
                bbox[2] = max(bbox[2], p[0])
                bbox[3] = max(bbox[3], p[1])
                if len(p) >= 3:
                    zmin = min(zmin, p[2])
                    zmax = max(zmax, p[2])
        shp_records.append(content)
        row_props.append(props)
        if not needs_utf8:
            for (orig, _t), (_nm, ftype, _l, _d) in zip(fields, specs):
                v = props.get(orig)
                if ftype == "C" and isinstance(v, str):
                    try:
                        v.encode("latin-1")
                    except UnicodeEncodeError:
                        needs_utf8 = True
                        break

    # DBF text encoding: classic latin-1 unless the data demands UTF-8;
    # either way a .cpg sidecar declares it (GDAL reads/writes the same).
    enc = "utf-8" if needs_utf8 else "latin-1"
    dbf_records: list[bytes] = []
    for props in row_props:
        rec = b" "  # not deleted
        for (orig, _t), (nm, ftype, length, dec) in zip(fields, specs):
            rec += _dbf_value(props.get(orig), ftype, length, dec, enc)
        dbf_records.append(rec)

    if shape_code is None:
        shape_code = 1
    if bbox[0] == float("inf"):
        bbox = [0.0, 0.0, 0.0, 0.0]
    zrange = (0.0, 0.0) if zmin == float("inf") else (zmin, zmax)

    # .shp + .shx
    shp_len = 100
    shx_entries = []
    with open(base + ".shp", "wb") as f:
        f.write(b"\x00" * 100)  # placeholder header
        for i, content in enumerate(shp_records):
            shx_entries.append((shp_len // 2, len(content) // 2))
            f.write(struct.pack(">2i", i + 1, len(content) // 2))
            f.write(content)
            shp_len += 8 + len(content)
        f.seek(0)
        f.write(_header(shape_code, shp_len // 2, bbox, zrange))
    with open(base + ".shx", "wb") as f:
        f.write(
            _header(
                shape_code, (100 + 8 * len(shx_entries)) // 2, bbox, zrange
            )
        )
        for off, ln in shx_entries:
            f.write(struct.pack(">2i", off, ln))

    # .dbf
    record_size = 1 + sum(s[2] for s in specs)
    header_size = 32 + 32 * len(specs) + 1
    today = dt.date.today()
    with open(base + ".dbf", "wb") as f:
        f.write(
            struct.pack(
                "<4BIHH20x",
                0x03,
                today.year - 1900,
                today.month,
                today.day,
                len(dbf_records),
                header_size,
                record_size,
            )
        )
        for nm, ftype, length, dec in specs:
            f.write(
                nm.encode("latin-1", "replace")[:11].ljust(11, b"\x00")
                + ftype.encode()
                + b"\x00" * 4
                + struct.pack("<BB", length, dec)
                + b"\x00" * 14
            )
        f.write(b"\x0d")
        for rec in dbf_records:
            f.write(rec)
        f.write(b"\x1a")

    if srs_wkt:
        with open(base + ".prj", "w") as f:
            f.write(srs_wkt)
    with open(base + ".cpg", "w") as f:
        f.write("UTF-8" if enc == "utf-8" else "ISO-8859-1")
