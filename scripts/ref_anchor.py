#!/usr/bin/env python
"""Reference-anchor benchmark: the reference's own largest fixture shape.

Kuoste/LasUtility's shapefile-rasterization test builds ONE 12000x12000
byte raster (tile L4133L = [380000,392000) x [6666000,6678000)) from
2,044 polygons + 5,052 lines in a single thread
(LasUtility.Tests/RasteriserEvenOdd.Tests.cs:19-80).  This script runs
the same shape through the engine's per-tile kernel single-threaded —
the apples-to-apples "matches-or-beats the reference's single-node
throughput at the same data scale" number — then the Spark path over the
same features at px=12000.

With the reference fixture shapefiles present (gridlib/shp.py reads
them directly), this runs the REAL workload and reports byte parity
against the committed terraintype.asp; otherwise it falls back to a
deterministic synthetic feature set at the same scale (FIXTURES.md §2).

Output: one JSON line with cells/sec + features/sec (+ parity).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> None:
    from lasutility_spark import datagen
    from lasutility_spark.engine import pip_stage
    from lasutility_spark.gridlib import topodb
    from lasutility_spark.gridlib.tilenamer import cell_id as cid, tile_decode

    # L4133L = 12x12 km; our grammar's 12 km level
    minx, miny, maxx, maxy = tile_decode("L4133L")
    assert (maxx - minx) == 12000 and (maxy - miny) == 12000

    fixture_dir = (
        "/root/reference/LasUtility.Tests/TestFiles/RasteriserEvenOdd/"
        "AddShapefileAndSave/Input"
    )
    parity = None
    if os.path.isdir(fixture_dir):
        # the real thing: reference shapefiles + the test's class maps
        import pandas as pd

        from lasutility_spark.gridlib.shp import read_shapefile

        p = read_shapefile(os.path.join(fixture_dir, "m_L4133L_p.shp"))
        v = read_shapefile(os.path.join(fixture_dir, "m_L4133L_v.shp"))
        v = v.assign(seq=v["seq"] + len(p))
        allf = pd.concat([p, v])
        feats = [
            (int(s), int(l), bytes(g))
            for s, l, g in zip(allf["seq"], allf["luokka"], allf["geom_wkb"])
        ]
        classmap = {
            **topodb.WATER_POLYGON, **topodb.WATER_LINE,
            **topodb.SWAMP_POLYGON, **topodb.FIELD_POLYGON,
            **topodb.ROCK_POLYGON, **topodb.SAND_POLYGON,
        }
    else:
        # fixture-scale synthetic stand-in: 2,044 polygons + 5,052 lines
        pdf, ldf, _edf = datagen.gen_features(
            ["L4133L"], n_polygons=2044, n_lines=5052
        )
        feats = [
            (int(s), int(l), bytes(g))
            for s, l, g in zip(pdf["seq"], pdf["luokka"], pdf["geom_wkb"])
        ] + [
            (int(s), int(l), bytes(g))
            for s, l, g in zip(ldf["seq"], ldf["luokka"], ldf["geom_wkb"])
        ]
        classmap = {**topodb.ALL_POLYGON, **topodb.ALL_LINE}
    cell = int(cid(np.array([minx]), np.array([miny]), 12000)[0])

    t0 = time.time()
    out = pip_stage._rasterize_tile(cell, 12000, 12000, feats, classmap)
    dt = time.time() - t0
    if os.path.isdir(fixture_dir):
        from lasutility_spark.gridlib import asc
        from lasutility_spark.gridlib.png import png_decode

        with open(os.path.join(fixture_dir, "terraintype.asp")) as f:
            ref, _bounds = asc.ascii_to_byte_raster(f.read(), compressed=True)
        parity = bool((png_decode(bytes(out["bytes"])) == ref).all())
    cells = 12000 * 12000
    print(
        json.dumps(
            {
                "metric": "ref_anchor_12000sq_sec",
                "value": round(dt, 3),
                "unit": "sec",
                "cells": cells,
                "cells_per_sec": round(cells / dt),
                "n_features": len(feats),
                "features_per_sec": round(len(feats) / dt, 1),
                "painted_cells": out["painted_cells"],
                "byte_parity_vs_terraintype_asp": parity,
                "reference_shape": "RasteriserEvenOdd.Tests.cs:19-80 "
                "(12000^2 raster, 2044 polygons + 5052 lines, 1 thread)",
            }
        )
    )


if __name__ == "__main__":
    main()
