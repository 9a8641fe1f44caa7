"""Geospatial queries through the ``gdal`` DataSource (rows-only checks).

These read the engine-generated fixtures under ``tests/data`` — DuckDB
has no spatial extension in this environment, so these entries omit
``oracle_sql`` and the driver records the weaker rows-only check; full
value-level verification lives in ``tests/test_datasource_read.py``.

Populated once the DataSource lands (M1); kept importable from day one.
"""

from __future__ import annotations
