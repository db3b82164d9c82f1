"""Run-length codec for ``.asp`` raster rows.

Exact string format pinned by ByteRaster.GetCompressedString
(LasUtility/Common/ByteRaster.cs:94-122): tokens ``"<count>x<value>"``
joined by single spaces, no trailing space.
"""

from __future__ import annotations

import numpy as np


def rle_compress_row(row: np.ndarray) -> str:
    """uint8 row -> '<count>x<value> ...' (ByteRaster.cs:94-122)."""
    row = np.asarray(row)
    if row.size == 0:
        raise ValueError("empty row")
    # boundaries where the value changes
    change = np.flatnonzero(row[1:] != row[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [row.size]))
    return " ".join(f"{e - s}x{int(row[s])}" for s, e in zip(starts, ends))


def rle_decompress_row(text: str, expected_cols: int | None = None) -> np.ndarray:
    """Inverse of :func:`rle_compress_row` (read path ByteRaster.cs:246-274)."""
    counts = []
    values = []
    for word in text.split():
        parts = word.split("x")
        if len(parts) != 2:
            raise ValueError(f"invalid [count]x[value] token: {word!r}")
        counts.append(int(parts[0]))
        values.append(int(parts[1]))
    out = np.repeat(np.asarray(values, dtype=np.uint8), counts)
    if expected_cols is not None and out.size != expected_cols:
        raise ValueError(f"invalid column count {out.size}, expected {expected_cols}")
    return out
