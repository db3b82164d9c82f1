"""Minimal ESRI Shapefile (.shp + .dbf) reader, stdlib+numpy only.

Implements the public ESRI Shapefile Technical Description (the .shp
main-file record layout) and the dBASE III table layout for attributes —
enough to consume the reference's NLS fixture shapefiles directly
(Shapefile/RasteriserEvenOdd.cs:28-56 reads features in file order,
takes the ``LUOKKA`` numeric attribute, and dispatches
Polygon/MultiPolygon/LineString/MultiLineString).

Supported shape types: 1/11/21 Point, 3/13/23 PolyLine, 5/15/25 Polygon
(Z/M variants parse the XY part and ignore the rest).  Polygon records
group their rings by winding order: clockwise (negative shoelace area in
map coords) = outer ring, counter-clockwise = hole of the preceding
outer ring — the shapefile convention NTS applies when building
geometries.  Geometries are emitted as WKB (the engine's vector-feature
interchange), so the output frame drops straight into the PIP stage.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from .wkb import (
    encode_linestring,
    encode_multilinestring,
    encode_multipolygon,
    encode_polygon,
)

_POINT = {1, 11, 21}
_POLYLINE = {3, 13, 23}
_POLYGON = {5, 15, 25}


def _signed_area2(xs: np.ndarray, ys: np.ndarray) -> float:
    """Twice the shoelace area; negative = clockwise in map coords."""
    return float(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))


def _rings_of(points: np.ndarray, parts: np.ndarray) -> list:
    bounds = list(parts) + [len(points)]
    return [
        (points[a:b, 0].copy(), points[a:b, 1].copy())
        for a, b in zip(bounds[:-1], bounds[1:])
        if b - a >= 2
    ]


def _polygon_wkb(points: np.ndarray, parts: np.ndarray) -> bytes:
    """Group rings into polygons by winding order, emit (Multi)Polygon."""
    rings = _rings_of(points, parts)
    polys: list[list] = []
    for ring in rings:
        if not polys or _signed_area2(*ring) <= 0:  # outer (CW) or first
            polys.append([ring])
        else:  # hole (CCW) of the preceding outer
            polys[-1].append(ring)
    if len(polys) == 1:
        return encode_polygon(polys[0])
    return encode_multipolygon(polys)


def _polyline_wkb(points: np.ndarray, parts: np.ndarray) -> bytes:
    lines = _rings_of(points, parts)
    if len(lines) == 1:
        return encode_linestring(*lines[0])
    return encode_multilinestring(lines)


def read_shp(path: str) -> list[tuple[int, bytes | None]]:
    """.shp main file -> [(record_number, wkb_or_None)], file order.

    Null shapes (type 0) yield None geometry.
    """
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError(f"{path}: not a shapefile (bad file code)")
    file_len = struct.unpack(">i", data[24:28])[0] * 2  # 16-bit words
    out: list[tuple[int, bytes | None]] = []
    pos = 100
    while pos + 8 <= min(file_len, len(data)):
        rec_no, content_len = struct.unpack(">2i", data[pos : pos + 8])
        pos += 8
        end = pos + content_len * 2
        (stype,) = struct.unpack_from("<i", data, pos)
        if stype == 0:
            out.append((rec_no, None))
        elif stype in _POINT:
            # represent as a degenerate 2-vertex linestring: Bresenham
            # stamps the single cell, matching a point's raster footprint
            x, y = struct.unpack_from("<2d", data, pos + 4)
            out.append((rec_no, encode_linestring([x, x], [y, y])))
        elif stype in _POLYLINE or stype in _POLYGON:
            # box(32) + numParts(4) + numPoints(4)
            n_parts, n_points = struct.unpack_from("<2i", data, pos + 36)
            parts = np.frombuffer(data, dtype="<i4", count=n_parts, offset=pos + 44)
            pts = np.frombuffer(
                data, dtype="<f8", count=2 * n_points, offset=pos + 44 + 4 * n_parts
            ).reshape(n_points, 2)
            wkb_bytes = (
                _polygon_wkb(pts, parts)
                if stype in _POLYGON
                else _polyline_wkb(pts, parts)
            )
            out.append((rec_no, wkb_bytes))
        else:
            raise ValueError(f"{path}: unsupported shape type {stype}")
        pos = end
    return out


def read_dbf_column(path: str, column: str) -> list:
    """dBASE III .dbf -> one column's values, file order.

    Numeric (N) fields parse to int/float; character (C) to stripped str.
    """
    with open(path, "rb") as f:
        data = f.read()
    n_rec = struct.unpack("<i", data[4:8])[0]
    header_size, record_size = struct.unpack("<2h", data[8:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\0")[0].decode("ascii", "replace")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fdec = data[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    offsets = {}
    off = 1  # skip deletion flag
    for name, ftype, flen, fdec in fields:
        offsets[name] = (off, ftype, flen, fdec)
        off += flen
    if column not in offsets:
        raise KeyError(f"{path}: no field {column!r} (have {sorted(offsets)})")
    off, ftype, flen, fdec = offsets[column]
    out = []
    for i in range(n_rec):
        rec = data[header_size + i * record_size :][:record_size]
        raw = rec[off : off + flen].decode("ascii", "replace").strip()
        if ftype == "N":
            if not raw or raw == "*" * len(raw):
                out.append(None)
            elif fdec or "." in raw:
                out.append(float(raw))
            else:
                out.append(int(raw))
        else:
            out.append(raw)
    return out


def read_shapefile(path: str, class_column: str = "LUOKKA") -> pd.DataFrame:
    """Shapefile -> engine feature frame (feature_id, geom_wkb, luokka, seq).

    ``seq`` is the file-order record index — the reference rasterizes
    features strictly in scan order (RasteriserEvenOdd.cs:28, V8
    last-writer-wins), so downstream sorting on seq reproduces it.
    Null shapes and records with no class value are dropped (they can
    never rasterize).
    """
    shp = read_shp(path)
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    classes = read_dbf_column(dbf_path, class_column)
    if len(classes) != len(shp):
        raise ValueError(
            f"{path}: .shp has {len(shp)} records but .dbf has {len(classes)}"
        )
    rows = []
    for i, ((rec_no, wkb_bytes), luokka) in enumerate(zip(shp, classes)):
        if wkb_bytes is None or luokka is None:
            continue
        rows.append(
            {
                "feature_id": rec_no - 1,
                "geom_wkb": wkb_bytes,
                "luokka": int(luokka),
                "seq": i,
            }
        )
    return pd.DataFrame(rows, columns=["feature_id", "geom_wkb", "luokka", "seq"])
