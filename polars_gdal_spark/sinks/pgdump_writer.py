"""PostgreSQL dump (PGDump) writer — GDAL's write-only ``PGDump``
vector driver re-expressed for this engine (reference exposes every
GDAL driver through ``gdal_resource_from_df``, src/lib.rs:629-642).

Emits a ``psql``-loadable SQL script in GDAL's layout: ``CREATE TABLE``
with a serial FID, ``AddGeometryColumn`` (so the script works on a
PostGIS database), per-field ``ALTER TABLE ... ADD COLUMN``, then the
rows as one ``COPY ... FROM STDIN`` block (default, the fast path psql
streams) or ``INSERT`` statements (``pgUseCopy=false``).

Geometry values are hex EWKB with the SRID flag set on the top-level
type word — PostGIS rejects SRID-less WKB on a typmod-constrained
geometry column, which is why GDAL embeds the SRID too. Inner
geometries of Multi*/Collections keep the engine's ISO encoding
(Z = type+1000); PostGIS's WKB parser accepts ISO and EWKB type words
interchangeably at any nesting level.

This completes the PostGIS story: ``sources/postgis.py`` reads (JDBC +
EWKB decode), this writes the load script.
"""

from __future__ import annotations

import struct

_TYPE_MAP = {
    "string": "VARCHAR",
    "bigint": "INT8",
    "int": "INTEGER",
    "smallint": "INT2",
    "tinyint": "INT2",
    "double": "FLOAT8",
    "float": "FLOAT4",
    "boolean": "BOOLEAN",
    "date": "date",
    "timestamp": "timestamp with time zone",
    "timestamp_ntz": "timestamp",
    "binary": "BYTEA",
}

_EWKB_SRID_FLAG = 0x20000000
_EWKB_Z_FLAG = 0x80000000


def wkb_to_ewkb_hex(wkb: bytes, srid: int) -> str:
    """Patch the top-level type word of little-endian (I)SO WKB to the
    EWKB form (SRID flag + embedded SRID; Z moves from +1000 to the
    0x80000000 flag) and return uppercase hex."""
    if not wkb or wkb[0] != 1:
        raise ValueError("expected little-endian WKB")
    (code,) = struct.unpack_from("<I", wkb, 1)
    z = code >= 1000
    base = code - 1000 if z else code
    patched = base | _EWKB_SRID_FLAG | (_EWKB_Z_FLAG if z else 0)
    out = (
        wkb[:1]
        + struct.pack("<I", patched)
        + struct.pack("<I", srid)
        + wkb[5:]
    )
    return out.hex().upper()


def _copy_escape(v, sql_type: str) -> str:
    """COPY text-format value: tab/newline/backslash escaped, bool as
    t/f, bytea as \\x hex, NULL as \\N (handled by the caller)."""
    if sql_type == "BOOLEAN":
        truthy = v if isinstance(v, bool) else str(v).lower() in ("true", "t", "1")
        return "t" if truthy else "f"
    if sql_type == "BYTEA":
        # _jsonish already hex-encoded binary values
        return "\\\\x" + str(v)
    s = v if isinstance(v, str) else str(v)
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _sql_literal(v, sql_type: str) -> str:
    if sql_type == "BOOLEAN":
        truthy = v if isinstance(v, bool) else str(v).lower() in ("true", "t", "1")
        return "TRUE" if truthy else "FALSE"
    if sql_type in ("INT8", "INTEGER", "INT2", "FLOAT8", "FLOAT4"):
        return str(v)
    if sql_type == "BYTEA":
        return "'\\x" + str(v) + "'"
    return "'" + str(v).replace("'", "''") + "'"


def write_pgdump(
    parts: list[str],
    path: str,
    options: dict,
    schema,
    geom_col: str,
    gfmt: str = "wkb",
) -> None:
    from polars_gdal_spark.geometry import geom_to_wkb
    from polars_gdal_spark.sinks import _iter_rows

    table = options.get("layer", "layer").lower()
    pg_schema = options.get("pgschema", options.get("pgSchema", "public"))
    srs = options.get("srs", "4326")
    try:
        srid = int(str(srs).split(":")[-1])
    except ValueError:
        srid = 4326
    use_copy = (
        str(options.get("pgusecopy", options.get("pgUseCopy", "true"))).lower()
        != "false"
    )

    # Field names are laundered to lowercase (GDAL's PG behavior).
    fields = [
        (f.name.lower(), _TYPE_MAP.get(f.dataType.simpleString(), "VARCHAR"))
        for f in schema.fields
        if f.name != geom_col
    ]

    # One pass over the parts: buffer rows (formatted lazily per mode)
    # while discovering the geometry type/dimensionality for the
    # AddGeometryColumn header, which must precede the data.
    rows: list[tuple[str | None, list]] = []
    geom_types: set[str] = set()
    has_z = False
    for geom, props in _iter_rows(parts, geom_col, gfmt):
        hex_ewkb = None
        if geom is not None:
            wkb = geom_to_wkb(geom)
            (code,) = struct.unpack_from("<I", wkb, 1)
            if code >= 1000:
                has_z = True
            geom_types.add(geom[0])
            hex_ewkb = wkb_to_ewkb_hex(wkb, srid)
        rows.append((hex_ewkb, [props.get(n) for n, _ in fields]))

    if len(geom_types) == 1:
        gtype = next(iter(geom_types)).upper()
    else:
        gtype = "GEOMETRY"  # mixed or empty → unconstrained typmod

    qt = f'"{pg_schema}"."{table}"'
    cols = ['"wkb_geometry"'] + [f'"{n}"' for n, _ in fields]
    with open(path, "w", encoding="utf-8") as f:
        f.write("SET standard_conforming_strings = ON;\n")
        f.write(f"DROP TABLE IF EXISTS {qt} CASCADE;\n")
        f.write("BEGIN;\n")
        f.write(
            f'CREATE TABLE {qt} ("ogc_fid" SERIAL, '
            f'CONSTRAINT "{table}_pk" PRIMARY KEY ("ogc_fid"));\n'
        )
        f.write(
            f"SELECT AddGeometryColumn('{pg_schema}','{table}',"
            f"'wkb_geometry',{srid},'{gtype}',{3 if has_z else 2});\n"
        )
        for n, t in fields:
            f.write(f'ALTER TABLE {qt} ADD COLUMN "{n}" {t};\n')
        if use_copy:
            f.write(f'COPY {qt} ({", ".join(cols)}) FROM STDIN;\n')
            for hex_ewkb, vals in rows:
                out = [hex_ewkb if hex_ewkb is not None else "\\N"]
                for (n, t), v in zip(fields, vals):
                    out.append("\\N" if v is None else _copy_escape(v, t))
                f.write("\t".join(out) + "\n")
            f.write("\\.\n")
        else:
            for hex_ewkb, vals in rows:
                lits = [
                    f"'{hex_ewkb}'" if hex_ewkb is not None else "NULL"
                ]
                for (n, t), v in zip(fields, vals):
                    lits.append("NULL" if v is None else _sql_literal(v, t))
                f.write(
                    f'INSERT INTO {qt} ({", ".join(cols)}) '
                    f'VALUES ({", ".join(lits)});\n'
                )
        f.write("COMMIT;\n")
