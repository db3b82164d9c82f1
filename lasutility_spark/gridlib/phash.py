"""Deterministic perceptual hash for tile images (the ``phash`` column).

Average-hash over an 8x8 block-mean downsample: 64 bits packed into a
signed int64 (bit 63 = top-left block).  Pure numpy, deterministic, and
cheap enough to vectorize over Arrow batches.  Used for exact/near-dup
equi-joins on the image table (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np


def phash64(img: np.ndarray) -> int:
    """2-D array -> signed int64 average-hash."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    # block-mean resize to 8x8 — one reshaped reduction when the dims
    # divide evenly (the 128/64 px tile hot path; 64 tiny .mean() calls
    # per tile showed up in the PIP kernel profile)
    if h % 8 == 0 and w % 8 == 0 and h >= 8 and w >= 8:
        blocks = img.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        rows = np.linspace(0, h, 9).astype(int)
        cols = np.linspace(0, w, 9).astype(int)
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                r0, r1 = rows[i], max(rows[i + 1], rows[i] + 1)
                c0, c1 = cols[j], max(cols[j + 1], cols[j] + 1)
                blocks[i, j] = img[r0:r1, c0:c1].mean()
    bits = (blocks > np.median(blocks)).ravel()
    # bits[0] -> bit 63 (MSB-first), same packing as the former shift loop
    packed = np.packbits(bits).tobytes()
    return int(np.frombuffer(packed, dtype=">u8")[0].astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
