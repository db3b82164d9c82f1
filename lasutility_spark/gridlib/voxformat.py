"""Reference-compatible VoxelGrid checkpoint codec (MessagePack layout).

The reference persists a whole VoxelGrid as one MessagePack blob
(VoxelGrid/VoxelGrid.cs:347-366, byte-identical golden test
VoxelGrid.Tests.cs:52-135).  The engine's own checkpoints are parquet
tables (engine/checkpoint.py — the right shape at 10^9 tiles), but this
codec makes the reference's on-disk format readable AND writable so a
LasUtility user can exchange .obj grid files with this engine.

Wire layout (from the MessagePack-CSharp [Key(n)] annotations):

- VoxelGrid  = [bounds, grid, dem, is_sorted]        (VoxelGrid.cs:14-28)
- bounds     = [0, [rows, cols, minx, miny, maxx, maxy]]
               (Union tag 0 -> RasterBounds, IRasterBounds.cs:5;
               int32 tag written as fixed-width d2)
- grid       = [rows, cols, bin x rows*cols]         (2-D array format)
- bin        = [[point, ...]]                        (Bin.cs:11)
- point      = [float32 z, uint class]               (Bin.cs:45-48)
- dem        = [rows, cols, float32 x rows*cols]
- C# float.NaN serializes as 0xFFC00000 (not numpy's canonical
  0x7FC00000) — preserved both ways for byte parity.

Only the types the layout needs are implemented; this is not a general
MessagePack library.
"""

from __future__ import annotations

import struct

import numpy as np

_CSHARP_NAN = b"\xca\xff\xc0\x00\x00"


# --- minimal writer --------------------------------------------------------


def _w_arrayhead(out: bytearray, n: int) -> None:
    if n <= 15:
        out.append(0x90 | n)
    elif n <= 0xFFFF:
        out += b"\xdc" + struct.pack(">H", n)
    else:
        out += b"\xdd" + struct.pack(">I", n)


def _w_int(out: bytearray, v: int) -> None:
    """Minimal-width unsigned encoding (matches MessagePack-CSharp for
    the non-negative ints this layout contains)."""
    if v < 0x80:
        out.append(v)
    elif v <= 0xFF:
        out += b"\xcc" + bytes([v])
    elif v <= 0xFFFF:
        out += b"\xcd" + struct.pack(">H", v)
    else:
        out += b"\xce" + struct.pack(">I", v)


def _w_f32(out: bytearray, v: float) -> None:
    f = np.float32(v)
    if np.isnan(f):
        out += _CSHARP_NAN
    else:
        out += b"\xca" + struct.pack(">f", float(f))


def _w_f64(out: bytearray, v: float) -> None:
    out += b"\xcb" + struct.pack(">d", float(v))


def serialize_voxel_grid(
    rows: int,
    cols: int,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    bins: list[list[tuple[float, int]]],
    dem: np.ndarray,
    is_sorted: bool = True,
) -> bytes:
    """Grid state -> reference-layout MessagePack bytes.

    ``bins``: row-major list of rows*cols cells, each a list of
    (z, classification) in stored order (sort desc by z first for a
    SortAndTrim-equivalent file).  ``dem``: (rows, cols) float32.
    """
    if len(bins) != rows * cols:
        raise ValueError("bins must have rows*cols entries (row-major)")
    dem = np.asarray(dem, dtype=np.float32)
    if dem.shape != (rows, cols):
        raise ValueError("dem shape mismatch")
    out = bytearray()
    _w_arrayhead(out, 4)
    # bounds: Union tag (fixed int32) + RasterBounds keys 0-5
    _w_arrayhead(out, 2)
    out += b"\xd2" + struct.pack(">i", 0)
    _w_arrayhead(out, 6)
    _w_int(out, rows)
    _w_int(out, cols)
    for v in (minx, miny, maxx, maxy):
        _w_f64(out, v)
    # grid: 2-D array = [dim0, dim1, elements...]
    _w_arrayhead(out, 3)
    _w_int(out, rows)
    _w_int(out, cols)
    _w_arrayhead(out, rows * cols)
    for cell in bins:
        _w_arrayhead(out, 1)
        _w_arrayhead(out, len(cell))
        for z, cls in cell:
            _w_arrayhead(out, 2)
            _w_f32(out, z)
            _w_int(out, int(cls))
    # dem: 2-D array of float32
    _w_arrayhead(out, 3)
    _w_int(out, rows)
    _w_int(out, cols)
    _w_arrayhead(out, rows * cols)
    for v in dem.ravel():
        _w_f32(out, v)
    out += b"\xc3" if is_sorted else b"\xc2"
    return bytes(out)


# --- minimal reader --------------------------------------------------------


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def _take(self, n: int) -> bytes:
        b = self.d[self.p : self.p + n]
        self.p += n
        return b

    def arrayhead(self) -> int:
        t = self.d[self.p]
        self.p += 1
        if 0x90 <= t <= 0x9F:
            return t & 0x0F
        if t == 0xDC:
            return struct.unpack(">H", self._take(2))[0]
        if t == 0xDD:
            return struct.unpack(">I", self._take(4))[0]
        raise ValueError(f"expected array at {self.p - 1}, got {t:#x}")

    def integer(self) -> int:
        t = self.d[self.p]
        self.p += 1
        if t < 0x80:
            return t
        if t == 0xCC:
            return self._take(1)[0]
        if t == 0xCD:
            return struct.unpack(">H", self._take(2))[0]
        if t == 0xCE:
            return struct.unpack(">I", self._take(4))[0]
        if t == 0xD2:
            return struct.unpack(">i", self._take(4))[0]
        raise ValueError(f"expected int at {self.p - 1}, got {t:#x}")

    def f32(self) -> float:
        t = self.d[self.p]
        self.p += 1
        if t != 0xCA:
            raise ValueError(f"expected float32, got {t:#x}")
        return struct.unpack(">f", self._take(4))[0]

    def f32_raw(self) -> np.float32:
        t = self.d[self.p]
        self.p += 1
        if t != 0xCA:
            raise ValueError(f"expected float32, got {t:#x}")
        return np.frombuffer(self._take(4), dtype=">f4")[0]

    def f64(self) -> float:
        t = self.d[self.p]
        self.p += 1
        if t != 0xCB:
            raise ValueError(f"expected float64, got {t:#x}")
        return struct.unpack(">d", self._take(8))[0]

    def boolean(self) -> bool:
        t = self.d[self.p]
        self.p += 1
        if t == 0xC3:
            return True
        if t == 0xC2:
            return False
        raise ValueError(f"expected bool, got {t:#x}")


def deserialize_voxel_grid(data: bytes):
    """Reference .obj bytes -> (bounds dict, bins, dem, is_sorted)."""
    r = _Reader(data)
    if r.arrayhead() != 4:
        raise ValueError("not a VoxelGrid blob")
    if r.arrayhead() != 2:
        raise ValueError("bad bounds union")
    tag = r.integer()
    if tag != 0:
        raise ValueError(f"unknown IRasterBounds union tag {tag}")
    if r.arrayhead() != 6:
        raise ValueError("bad RasterBounds")
    rows, cols = r.integer(), r.integer()
    minx, miny, maxx, maxy = r.f64(), r.f64(), r.f64(), r.f64()
    if r.arrayhead() != 3:
        raise ValueError("bad grid array")
    grows, gcols = r.integer(), r.integer()
    n = r.arrayhead()
    if n != grows * gcols:
        raise ValueError("grid element count mismatch")
    bins = []
    for _ in range(n):
        if r.arrayhead() != 1:
            raise ValueError("bad Bin")
        cell = []
        for _ in range(r.arrayhead()):
            if r.arrayhead() != 2:
                raise ValueError("bad BinPoint")
            cell.append((r.f32(), r.integer()))
        bins.append(cell)
    if r.arrayhead() != 3:
        raise ValueError("bad dem array")
    drows, dcols = r.integer(), r.integer()
    m = r.arrayhead()
    dem = np.empty(m, dtype=np.float32)
    for i in range(m):
        dem[i] = r.f32_raw()
    is_sorted = r.boolean()
    bounds = {
        "rows": rows, "cols": cols,
        "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
    }
    return bounds, bins, dem.reshape(drows, dcols), is_sorted
