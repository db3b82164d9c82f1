"""Pure numpy semantic core — no Spark imports.

Ports the *pinned invariants* of the reference (half-open bounds, integer
cell-space scanline, NLS tile grammar, descending bin sort, TIN barycentric
rasterization) as vectorized numpy functions usable both inside Arrow UDFs
and in single-process oracles for tests.
"""

from .bounds import RasterBounds
from .rle import rle_compress_row, rle_decompress_row
from .tilenamer import tile_decode, tile_encode, tile_encode_batch

__all__ = [
    "RasterBounds",
    "tile_encode",
    "tile_decode",
    "tile_encode_batch",
    "rle_compress_row",
    "rle_decompress_row",
]
