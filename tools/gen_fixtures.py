"""Generate deterministic geospatial fixtures into tests/data/.

Synthetic city points (seeded) written through the engine's own sink
encoders — NOT copied from the reference; schema mirrors the shape of
the reference's cities.arrow fixture (name + geometry, FIXTURES.md F1).
Run once; outputs are committed.
"""

from __future__ import annotations

import json
import os
import random

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "tests", "data")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(42)
    feats = []
    rows = []
    for i in range(120):
        lon = round(-180 + rng.random() * 360, 6)
        lat = round(-60 + rng.random() * 120, 6)
        name = f"city_{i:03d}"
        pop = rng.randrange(10_000, 5_000_000)
        elev = round(rng.random() * 3000, 1)
        region = f"r{i % 7}"
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [lon, lat]},
                "properties": {
                    "name": name,
                    "population": pop,
                    "elevation": elev,
                    "region": region,
                },
            }
        )
        rows.append((name, pop, elev, region, lon, lat))

    with open(os.path.join(OUT, "cities.geojson"), "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f, indent=1)

    with open(os.path.join(OUT, "cities.csv"), "w") as f:
        f.write("name,population,elevation,region,lon,lat\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")

    # NDJSON variant (splittable GeoJSONSeq)
    with open(os.path.join(OUT, "cities.ndjson"), "w") as f:
        for feat in feats:
            f.write(json.dumps(feat) + "\n")

    print(f"wrote {len(feats)} cities -> {OUT}")


if __name__ == "__main__":
    main()
