"""Minimal ESRI Shapefile (.shp + .dbf) reader AND PolygonZ writer,
stdlib+numpy only.

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


def read_polygonz(path: str) -> list[list[tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """.shp of PolygonZ (type 15) records -> per record a list of CLOSED
    rings ``(xs, ys, zs)``, file order — the Z-preserving counterpart of
    :func:`read_shp` used for byte-parity round trips of the reference's
    triangle exports (DEM/Triangulation.cs:132-157 writes one PolygonZ
    per triangle)."""
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError(f"{path}: not a shapefile (bad file code)")
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    out = []
    pos = 100
    while pos + 8 <= min(file_len, len(data)):
        _rec_no, content_len = struct.unpack(">2i", data[pos : pos + 8])
        pos += 8
        end = pos + content_len * 2
        (stype,) = struct.unpack_from("<i", data, pos)
        if stype != 15:
            raise ValueError(f"{path}: record is type {stype}, want PolygonZ (15)")
        n_parts, n_points = struct.unpack_from("<2i", data, pos + 36)
        parts = np.frombuffer(data, dtype="<i4", count=n_parts, offset=pos + 44)
        pts_off = pos + 44 + 4 * n_parts
        pts = np.frombuffer(data, dtype="<f8", count=2 * n_points, offset=pts_off)
        pts = pts.reshape(n_points, 2)
        # z block: zmin, zmax, then n_points z values
        z_off = pts_off + 16 * n_points
        zs = np.frombuffer(data, dtype="<f8", count=n_points, offset=z_off + 16)
        bounds = list(parts) + [n_points]
        out.append(
            [
                (pts[a:b, 0].copy(), pts[a:b, 1].copy(), zs[a:b].copy())
                for a, b in zip(bounds[:-1], bounds[1:])
            ]
        )
        pos = end
    return out


_M_NODATA = struct.unpack("<d", struct.pack("<d", -1.7976931348623157e308))[0]
# NetTopologySuite.IO.Esri writes unset measures as double.MinValue — the
# golden DEM.shp fixture pins this exact byte pattern.


def write_polygonz(
    path: str,
    records: list[list[tuple[np.ndarray, np.ndarray, np.ndarray]]],
    ids: list[int] | None = None,
    date: tuple[int, int, int] = (2026, 3, 13),
) -> None:
    """Write PolygonZ records (+ .shx, .dbf with an ``ID`` N(10) column,
    .cpg) — the ExportToShp sink (DEM/Triangulation.cs:132-157, written
    through NetTopologySuite.IO.Esri.Shapefile.WriteAllFeatures).

    ``records``: per feature, a list of rings ``(xs, ys, zs)``; rings may
    be open (closed automatically).  Outer rings are written clockwise
    and holes counter-clockwise (the ESRI convention); rings already
    oriented are passed through byte-identical, which is what makes the
    golden-fixture round trip byte-exact.

    ``date`` is the .dbf header's last-update stamp — fixed by default so
    output bytes are deterministic (the reference fixture's stamp).

    This is a sequential single-file format, hence a driver-side sink:
    callers collect the (small) triangle table per tile first.  The
    distributed shape is one .shp per tile, exactly like the reference's
    one-file-per-DEM export.
    """
    ids = list(range(len(records))) if ids is None else list(ids)
    if len(ids) != len(records):
        raise ValueError("ids and records length mismatch")

    rec_blobs = []
    for rings in records:
        closed = []
        for i, (xs, ys, zs) in enumerate(rings):
            xs = np.asarray(xs, np.float64)
            ys = np.asarray(ys, np.float64)
            zs = np.asarray(zs, np.float64)
            if xs[0] != xs[-1] or ys[0] != ys[-1]:
                xs = np.append(xs, xs[0])
                ys = np.append(ys, ys[0])
                zs = np.append(zs, zs[0])
            # ESRI winding: outer CW (negative shoelace), holes CCW
            area2 = _signed_area2(xs[:-1], ys[:-1])
            want_cw = i == 0
            if (area2 > 0) == want_cw:
                xs, ys, zs = xs[::-1], ys[::-1], zs[::-1]
            closed.append((xs, ys, zs))
        n_points = sum(len(r[0]) for r in closed)
        parts = np.cumsum([0] + [len(r[0]) for r in closed[:-1]]).astype("<i4")
        ax = np.concatenate([r[0] for r in closed])
        ay = np.concatenate([r[1] for r in closed])
        az = np.concatenate([r[2] for r in closed])
        body = bytearray()
        body += struct.pack("<i", 15)
        body += struct.pack(
            "<4d", ax.min(), ay.min(), ax.max(), ay.max()
        )
        body += struct.pack("<2i", len(closed), n_points)
        body += parts.tobytes()
        xy = np.empty((n_points, 2), dtype="<f8")
        xy[:, 0] = ax
        xy[:, 1] = ay
        body += xy.tobytes()
        body += struct.pack("<2d", az.min(), az.max())
        body += az.astype("<f8").tobytes()
        body += struct.pack("<2d", _M_NODATA, _M_NODATA)
        body += struct.pack("<d", _M_NODATA) * n_points
        rec_blobs.append(bytes(body))

    def _main_header(total_words: int) -> bytes:
        if rec_blobs:
            gx0 = min(struct.unpack_from("<4d", b, 4)[0] for b in rec_blobs)
            gy0 = min(struct.unpack_from("<4d", b, 4)[1] for b in rec_blobs)
            gx1 = max(struct.unpack_from("<4d", b, 4)[2] for b in rec_blobs)
            gy1 = max(struct.unpack_from("<4d", b, 4)[3] for b in rec_blobs)
            zoff = lambda b: 44 + 4 * struct.unpack_from("<2i", b, 36)[0] + 16 * struct.unpack_from("<2i", b, 36)[1]  # noqa: E731
            gz0 = min(struct.unpack_from("<2d", b, zoff(b))[0] for b in rec_blobs)
            gz1 = max(struct.unpack_from("<2d", b, zoff(b))[1] for b in rec_blobs)
        else:
            gx0 = gy0 = gx1 = gy1 = gz0 = gz1 = 0.0
        h = bytearray(100)
        struct.pack_into(">i", h, 0, 9994)
        struct.pack_into(">i", h, 24, total_words)
        struct.pack_into("<2i", h, 28, 1000, 15)
        struct.pack_into("<4d", h, 36, gx0, gy0, gx1, gy1)
        struct.pack_into("<2d", h, 68, gz0, gz1)
        struct.pack_into("<2d", h, 84, _M_NODATA, _M_NODATA)
        return bytes(h)

    base = os.path.splitext(path)[0]
    shp = bytearray()
    shx_entries = bytearray()
    offset_words = 50
    for i, body in enumerate(rec_blobs):
        clen_words = len(body) // 2
        shp += struct.pack(">2i", i + 1, clen_words)
        shp += body
        shx_entries += struct.pack(">2i", offset_words, clen_words)
        offset_words += 4 + clen_words
    with open(base + ".shp", "wb") as f:
        f.write(_main_header(50 + len(shp) // 2))
        f.write(shp)
    with open(base + ".shx", "wb") as f:
        f.write(_main_header(50 + len(shx_entries) // 2))
        f.write(shx_entries)

    # dBASE III: one N(10,0) ID column, space-padded right-aligned values
    n = len(ids)
    dbf = bytearray()
    dbf += bytes([0x03, date[0] - 1900, date[1], date[2]])
    dbf += struct.pack("<i", n)
    dbf += struct.pack("<2h", 32 + 32 + 1, 1 + 10)
    dbf += bytes(20)
    fld = bytearray(32)
    fld[0:2] = b"ID"
    fld[11] = ord("N")
    fld[16] = 10
    dbf += fld
    dbf += b"\x0d"
    for v in ids:
        dbf += b" " + str(int(v)).rjust(10).encode("ascii")
    dbf += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(dbf))
    with open(base + ".cpg", "wb") as f:
        f.write(b"UTF-8")


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
