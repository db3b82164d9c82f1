"""Georeferenced grid frame with half-open bounds.

Semantics pinned by the reference (LasUtility/Common/RasterBounds.cs:8-134):

- bounds are half-open: ``[MinX, MaxX) x [MinY, MaxY)`` (RasterBounds.cs:48)
- cell assignment is ``int((c - min) / cellsize)`` (RasterBounds.cs:126-132)
- row 0 is the *southernmost* row (RasterBounds.cs:97-98)
- epsilon for "just inside the max edge" is 1e-5 (RasterBounds.cs:10)
- non-square, non-metric cells supported (RasterBounds.cs:39-41)

Everything is vectorized over numpy arrays; out-of-bounds maps to -1
(instead of the reference's RcIndex.Empty sentinel, RcIndex.cs:6).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

EPSILON = 1e-5  # RasterBounds.cs:10 dEpsilon


@dataclass(frozen=True)
class RasterBounds:
    """Immutable grid frame: rows x cols over [minx, maxx) x [miny, maxy)."""

    rows: int
    cols: int
    minx: float
    miny: float
    maxx: float
    maxy: float

    def __post_init__(self) -> None:
        if self.minx >= self.maxx or self.miny >= self.maxy:
            raise ValueError("RasterBounds: invalid bounds")

    @property
    def cell_width(self) -> float:
        return (self.maxx - self.minx) / self.cols

    @property
    def cell_height(self) -> float:
        return (self.maxy - self.miny) / self.rows

    # --- point -> cell (vectorized X3; RasterBounds.cs:118-133) ---------

    def proj_to_cell(self, x, y):
        """(x, y) arrays -> (row, col) int32 arrays; -1 where out of bounds.

        Truncation (C# ``(int)``) equals floor here because inputs are
        non-negative after the bounds check.
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        inb = (x >= self.minx) & (x < self.maxx) & (y >= self.miny) & (y < self.maxy)
        col = np.where(inb, ((x - self.minx) / self.cell_width).astype(np.int64), -1)
        row = np.where(inb, ((y - self.miny) / self.cell_height).astype(np.int64), -1)
        return row.astype(np.int32), col.astype(np.int32)

    def proj_to_cell_unchecked(self, x, y):
        """(x, y) arrays KNOWN to be in bounds -> (row, col) int32 arrays.

        Skips the bounds mask of :meth:`proj_to_cell` — callers that just
        clipped to a box inside the bounds (the per-ring hot path) pay a
        measurable cost for the redundant compare/where on tiny arrays.
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        row = ((y - self.miny) / self.cell_height).astype(np.int32)
        col = ((x - self.minx) / self.cell_width).astype(np.int32)
        return row, col

    def proj_to_cell_scalar(self, x: float, y: float) -> tuple[int, int]:
        """Scalar point -> (row, col); (-1, -1) out of bounds.  Plain
        float arithmetic (no array round-trip) — the PIP kernel calls
        this tens of times per tile.  int() truncation equals the array
        path's astype(int64) because inputs are non-negative in bounds."""
        if self.minx <= x < self.maxx and self.miny <= y < self.maxy:
            return (
                int((y - self.miny) / self.cell_height),
                int((x - self.minx) / self.cell_width),
            )
        return -1, -1

    # --- cell -> point (X4; RasterBounds.cs:90-111) ----------------------

    def cell_bottom_left(self, row, col):
        row = np.asarray(row)
        col = np.asarray(col)
        if np.any((row < 0) | (row >= self.rows) | (col < 0) | (col >= self.cols)):
            raise IndexError("Cell indexes are out of range.")
        return self.minx + col * self.cell_width, self.miny + row * self.cell_height

    def cell_top_right(self, row, col):
        x, y = self.cell_bottom_left(row, col)
        return x + self.cell_width, y + self.cell_height

    def in_bounds_cell(self, row, col):
        row = np.asarray(row)
        col = np.asarray(col)
        return (row >= 0) & (row < self.rows) & (col >= 0) & (col < self.cols)

    def clip_window_cells(self, iminx: float, iminy: float, imaxx: float, imaxy: float):
        """Integer sub-window -> inclusive (r0, c0, r1, c1) cell range.

        Max edges treated as exclusive via epsilon, mirroring
        ByteRaster.WriteAsAscii/Crop (ByteRaster.cs:53-60,154-162).
        """
        r0, c0 = self.proj_to_cell_scalar(iminx, iminy)
        r1, c1 = self.proj_to_cell_scalar(imaxx - EPSILON, imaxy - EPSILON)
        if r0 < 0 or r1 < 0:
            raise ValueError("window outside raster bounds")
        return r0, c0, r1, c1
