"""Byte-raster operations: crop window and point lookup (V9/A9)."""

from __future__ import annotations

import numpy as np

from .bounds import RasterBounds

NODATA = 0  # ByteRaster.cs:13


def crop(
    raster: np.ndarray, bounds: RasterBounds, iminx: int, iminy: int, imaxx: int, imaxy: int
) -> tuple[np.ndarray, RasterBounds]:
    """V9: ByteRaster.Crop (ByteRaster.cs:154-178) — half-open window with
    epsilon on the max edge; new bounds carry the integer window corners."""
    r0, c0, r1, c1 = bounds.clip_window_cells(iminx, iminy, imaxx, imaxy)
    out = raster[r0 : r1 + 1, c0 : c1 + 1].copy()
    nb = RasterBounds(r1 - r0 + 1, c1 - c0 + 1, iminx, iminy, imaxx, imaxy)
    return out, nb


def get_value(raster: np.ndarray, bounds: RasterBounds, x, y):
    """A9: ByteRaster.GetValue (ByteRaster.cs:304-318) — NaN outside bounds
    and for NoData cells; vectorized."""
    row, col = bounds.proj_to_cell(x, y)
    ok = (row >= 0) & (col >= 0)
    vals = np.full(np.shape(row), np.nan, dtype=np.float64)
    rr = np.where(ok, row, 0)
    cc = np.where(ok, col, 0)
    v = raster[rr, cc].astype(np.float64)
    v[raster[rr, cc] == NODATA] = np.nan
    vals[ok] = v[ok]
    return vals
