"""ESRI ASCII grid codecs (.asc dense / .asp run-length encoded).

Pinned semantics (reference file:line):

- header keys ``ncols nrows xllcorner yllcorner cellsize NODATA_value``,
  written with the same column alignment (ByteRaster.cs:33-38)
- byte-raster data rows are written **top row first** (rows reversed,
  ByteRaster.cs:40); NoData = 0 (ByteRaster.cs:13)
- ``.asp`` rows are RLE ``<count>x<value>`` tokens (ByteRaster.cs:94-122)
- reader floors xllcorner/yllcorner to ints and ceils the max edge
  (ByteRaster.cs:209-222)
- DEM float writers: ``save_dem_ground`` writes rows bottom-up with
  NoData -9999 (VoxelGrid.cs:200-220) while ``write_dem_topdown`` writes
  rows reversed with NoData -999 and a trailing space per line
  (VoxelGrid.cs:319-345).  The two sinks genuinely disagree — per-sink
  semantics are pinned by tests, do not "fix".
"""

from __future__ import annotations

import math

import numpy as np

from .bounds import RasterBounds
from .rle import rle_compress_row, rle_decompress_row

NODATA_BYTE = 0  # ByteRaster.cs:13


def _fmt_num(v: float) -> str:
    """C#-style shortest representation: integral doubles print without
    a decimal point ('517550', '1'), fractional print shortest ('0.5')."""
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


def _header_lines(cols: int, rows: int, minx, miny, cellsize, nodata) -> list[str]:
    # exact spacing from ByteRaster.cs:33-38 / VoxelGrid.cs:224-229
    return [
        "ncols         " + _fmt_num(cols),
        "nrows         " + _fmt_num(rows),
        "xllcorner     " + _fmt_num(minx),
        "yllcorner     " + _fmt_num(miny),
        "cellsize      " + _fmt_num(cellsize),
        "NODATA_value  " + _fmt_num(nodata),
    ]


def byte_raster_to_ascii(raster: np.ndarray, bounds: RasterBounds, compressed: bool) -> str:
    """S6: ByteRaster.WriteAsAscii (ByteRaster.cs:27-51). Row 0 of ``raster``
    is the southernmost row; output is written top-down."""
    lines = _header_lines(
        bounds.cols, bounds.rows, bounds.minx, bounds.miny, bounds.cell_width, NODATA_BYTE
    )
    for irow in range(bounds.rows - 1, -1, -1):
        row = raster[irow]
        if compressed:
            lines.append(rle_compress_row(row))
        else:
            lines.append(" ".join(str(int(v)) for v in row))
    return "\n".join(lines) + "\n"


def byte_raster_window_to_ascii(
    raster: np.ndarray,
    bounds: RasterBounds,
    iminx: int,
    iminy: int,
    imaxx: int,
    imaxy: int,
    compressed: bool,
) -> str:
    """S7: cropped-window writer (ByteRaster.cs:53-87)."""
    r0, c0, r1, c1 = bounds.clip_window_cells(iminx, iminy, imaxx, imaxy)
    lines = _header_lines(
        c1 - c0 + 1, r1 - r0 + 1, iminx, iminy, bounds.cell_width, NODATA_BYTE
    )
    for irow in range(r1, r0 - 1, -1):
        row = raster[irow, c0 : c1 + 1]
        if compressed:
            lines.append(rle_compress_row(row))
        else:
            lines.append(" ".join(str(int(v)) for v in row))
    return "\n".join(lines) + "\n"


def ascii_to_byte_raster(text: str, compressed: bool) -> tuple[np.ndarray, RasterBounds]:
    """S5: ByteRaster.CreateFromAscii (ByteRaster.cs:181-284)."""
    rows = cols = None
    minx = miny = None
    cellsize = math.nan
    raster = None
    irow = -1
    header_read = False

    for line in text.splitlines():
        words = line.split()
        if not words:
            continue
        if not header_read:
            key = words[0].upper()
            if key == "NCOLS":
                cols = int(words[1])
                continue
            elif key == "NROWS":
                rows = int(words[1])
                continue
            elif key == "XLLCORNER":
                minx = int(math.floor(float(words[1])))  # ByteRaster.cs:209
                continue
            elif key == "YLLCORNER":
                miny = int(math.floor(float(words[1])))
                continue
            elif key == "CELLSIZE":
                cellsize = float(words[1])
                continue
            elif key == "NODATA_VALUE":
                continue
            else:
                if rows is None or cols is None or minx is None or miny is None or math.isnan(cellsize):
                    raise ValueError("Invalid format in header")
                maxx = minx + int(math.ceil(cols * cellsize))  # ByteRaster.cs:221
                maxy = miny + int(math.ceil(rows * cellsize))
                bounds = RasterBounds(rows, cols, minx, miny, maxx, maxy)
                raster = np.zeros((rows, cols), dtype=np.uint8)
                header_read = True
                irow = rows
        # data row (falls through on the first non-header line)
        if irow <= 0:
            raise ValueError("too many data rows")
        irow -= 1
        if compressed:
            raster[irow] = rle_decompress_row(line, cols)
        else:
            vals = np.array(words, dtype=np.uint8)
            if vals.size != cols:
                raise ValueError(f"invalid column count {vals.size}")
            raster[irow] = vals

    if raster is None or irow != 0:
        raise ValueError("too few data rows")
    return raster, bounds


def _fmt_float32(v: np.float32) -> str:
    """C# prints floats widened to double with shortest round-trip repr;
    Python's repr(float(float32)) matches that, minus the integral case."""
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


def save_dem_ground(dem: np.ndarray, bounds: RasterBounds, nodata: float = -9999.0) -> str:
    """S12: VoxelGrid.SaveAsAscGroundHeight (VoxelGrid.cs:200-220).
    NB: rows written bottom-up (row 0 first) — pinned as-is."""
    lines = _header_lines(
        bounds.cols, bounds.rows, bounds.minx, bounds.miny, bounds.cell_width, nodata
    )
    for irow in range(bounds.rows):
        vals = dem[irow]
        lines.append(
            " ".join(
                _fmt_float32(nodata if np.isnan(v) else v) for v in vals
            )
        )
    return "\n".join(lines) + "\n"


def write_dem_topdown(dem: np.ndarray, bounds: RasterBounds) -> str:
    """S13: VoxelGrid.WriteDemAsAscii (VoxelGrid.cs:319-345).
    NoData -999, rows reversed, trailing space per line — pinned as-is."""
    nodata = -999
    lines = _header_lines(
        bounds.cols, bounds.rows, bounds.minx, bounds.miny, bounds.cell_width, nodata
    )
    for irow in range(bounds.rows - 1, -1, -1):
        vals = dem[irow]
        lines.append(
            "".join(
                _fmt_float32(nodata if np.isnan(v) else v) + " " for v in vals
            )
        )
    return "\n".join(lines) + "\n"
