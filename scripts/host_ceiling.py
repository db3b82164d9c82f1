#!/usr/bin/env python
"""Measure the host's own N -> 4N scaling ceiling, Spark excluded.

Three probes, each at 8 and 32 concurrent processes (multiprocessing,
zero Spark), printed as one JSON line:

- alu:    pure-Python integer loop (no memory traffic) — isolates the
          all-core turbo clock drop.
- membw:  repeated numpy passes over a 16 MB array — isolates shared
          memory-bus saturation.
- kernel: the engine's real per-tile TIN kernel (decode -> sample ->
          C Delaunay -> C rasterize -> encode) over the sf0.1 tile table.

Interpretation: NO framework can scale better than `kernel` on this
host; Spark numbers in BENCH/BASELINE.md should be read against it.
On a real cluster N -> 4N adds 4x memory buses and keeps per-core
clocks, so these ceilings do not apply there.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _alu(n):
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def _membw(n):
    import numpy as np

    a = np.arange(2_000_000, dtype=np.float64)
    s = 0.0
    for _ in range(n):
        s += float((a * 1.0001 + 2.0).sum())
    return s


_WORK = None


def _kernel(args):
    import numpy as np

    from lasutility_spark import datagen as dg
    from lasutility_spark.gridlib.bounds import RasterBounds
    from lasutility_spark.gridlib.png import dem_to_png16, png16_to_dem
    from lasutility_spark.gridlib.tin import Tin

    cap, data = args
    name, minx, miny, maxx, maxy, cs, _ = dg.parse_caption(cap)
    dem_in = png16_to_dem(data, dg.Z_MIN, dg.Z_MAX)
    x, y, z, cls = dg.sample_points_from_tile(name, dem_in, minx, miny, cs)
    b = RasterBounds(128, 128, minx, miny, maxx, maxy)
    dem = np.full((128, 128), np.nan, dtype=np.float32)
    if len(x) >= 3:
        tin = Tin(x, y, z, cls)
        tin.rasterize_dem(b, dem=dem)
    return dem_to_png16(dem, dg.Z_MIN, dg.Z_MAX) is not None


def _rate(fn, work, nproc, chunksize):
    with mp.Pool(nproc) as pool:
        pool.map(fn, work[: max(len(work) // 8, nproc)], chunksize=chunksize)
        t0 = time.time()
        pool.map(fn, work, chunksize=chunksize)
        return len(work) / (time.time() - t0)


def main() -> None:
    import pyarrow.parquet as pq

    from lasutility_spark import datagen as dg

    out = {}
    for name, fn, work, chunk in (
        ("alu", _alu, [3_000_000] * 128, 4),
        ("membw", _membw, [12] * 128, 4),
    ):
        r8 = _rate(fn, work, 8, chunk)
        r32 = _rate(fn, work, 32, chunk)
        out[name] = round(r32 / (4.0 * r8), 3)

    d = dg.ensure_images_table(0.1, n_tiles=4096)
    t = pq.read_table(f"{d}/images.parquet").to_pandas()
    work = list(zip(t["caption"].tolist(), [bytes(b) for b in t["bytes"]]))
    r8 = _rate(_kernel, work, 8, 16)
    r32 = _rate(_kernel, work, 32, 16)
    out["kernel"] = round(r32 / (4.0 * r8), 3)
    out["kernel_tiles_per_sec_8"] = round(r8)
    out["kernel_tiles_per_sec_32"] = round(r32)
    print(json.dumps({"metric": "host_scaling_ceiling_8_to_32", **out}))


if __name__ == "__main__":
    main()
