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
- pip:    the engine's real per-tile PIP classification kernel (WKB
          decode memo -> clip -> even-odd scanline raster -> PNG16
          decode -> point sample -> raster lookup) — the q2 work body,
          zero Spark, over the same tile table + feature lists bench
          --scaling uses (SPARK_GRAFT_TILES selects the table).

Interpretation: NO framework can scale better than `kernel` (q1) /
`pip` (q2) on this host; Spark numbers in BENCH/BASELINE.md should be
read against them.  `bench.py --scaling` re-runs this script INSIDE the
scaling window (BENCH/host_ceiling_samewindow.json) so the q2 quotient
and the host's own zero-Spark ceiling are measured under the same host
conditions.  On a real cluster N -> 4N adds 4x memory buses and keeps
per-core clocks, so these ceilings do not apply there.
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


_PIP_MEMO: dict = {}


def _pip_kernel(args):
    import numpy as np

    from lasutility_spark import datagen as dg
    from lasutility_spark.engine.pip_stage import _rasterize_tile_raster
    from lasutility_spark.gridlib import topodb
    from lasutility_spark.gridlib import wkb as W
    from lasutility_spark.gridlib.png import png16_to_dem

    cell, cap, data, fl = args
    cmap = {**topodb.ALL_POLYGON, **topodb.ALL_LINE}
    name, minx, miny, maxx, maxy, cs, _ = dg.parse_caption(cap)
    fls = []
    for seq, luokka, gb in fl:
        g = _PIP_MEMO.get(gb)
        if g is None:
            g = _PIP_MEMO[gb] = W.decode(gb)
        fls.append((seq, luokka, g))
    raster, _n, _env = _rasterize_tile_raster(int(cell), 128, 1000, fls, cmap)
    dem = png16_to_dem(bytes(data), dg.Z_MIN, dg.Z_MAX)
    x, y, _z, _c = dg.sample_points_from_tile(name, dem, minx, miny, cs)
    rcs = (maxx - minx) / raster.shape[1]
    row = ((y - miny) / rcs).astype(np.int64)
    col = ((x - minx) / rcs).astype(np.int64)
    uv, cnt = np.unique(raster[row, col], return_counts=True)
    return int(cnt.sum())


def _pip_work(d: str):
    """(cell_id, caption, png_bytes, [(seq, luokka, wkb), ...]) per tile —
    the exact per-row payload classify_images_joined's kernel receives,
    built driver-side with the same floor arithmetic as
    explode_feature_covers (stored GeoParquet bboxes, size_north=1000)."""
    import numpy as np
    import pyarrow.parquet as pq

    from lasutility_spark.gridlib import tilenamer as tn

    se, sn = tn._snap_sizes(1000)
    per_cell: dict[int, list] = {}
    for f in ("polygons.parquet", "lines.parquet"):
        t = pq.read_table(f"{d}/{f}").to_pandas()
        for seq, luokka, gb, minx, miny, maxx, maxy in zip(
            t["seq"], t["luokka"], t["geom_wkb"],
            t["minx"], t["miny"], t["maxx"], t["maxy"],
        ):
            gb = bytes(gb)
            c0 = int((minx - tn.ORIGIN_EAST) // se)
            c1 = int((maxx - tn.ORIGIN_EAST) // se)
            r0 = int((miny - tn.ORIGIN_NORTH) // sn)
            r1 = int((maxy - tn.ORIGIN_NORTH) // sn)
            for r in range(r0, r1 + 1):
                for c in range(c0, c1 + 1):
                    per_cell.setdefault((r << 32) + c, []).append(
                        (int(seq), int(luokka), gb)
                    )
    imgs = pq.read_table(f"{d}/images.parquet").to_pandas()
    work = []
    n_points = 0
    for cap, data, minx, miny in zip(
        imgs["caption"], imgs["bytes"], imgs["minx"], imgs["miny"]
    ):
        cell = (int((miny - tn.ORIGIN_NORTH) // sn) << 32) + int(
            (minx - tn.ORIGIN_EAST) // se
        )
        work.append((cell, cap, bytes(data), per_cell.get(cell, [])))
    return work


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

    n_tiles = int(os.environ.get("SPARK_GRAFT_TILES", "4096"))
    d = dg.ensure_images_table(0.1, n_tiles=n_tiles)
    t = pq.read_table(f"{d}/images.parquet").to_pandas()
    work = list(zip(t["caption"].tolist(), [bytes(b) for b in t["bytes"]]))
    r8 = _rate(_kernel, work, 8, 16)
    r32 = _rate(_kernel, work, 32, 16)
    out["kernel"] = round(r32 / (4.0 * r8), 3)
    out["kernel_tiles_per_sec_8"] = round(r8)
    out["kernel_tiles_per_sec_32"] = round(r32)

    pip_work = _pip_work(d)
    with mp.Pool(4) as pool:
        pts = sum(pool.map(_pip_kernel, pip_work[:512], chunksize=16))
    pts_per_tile = pts / 512.0
    p8 = _rate(_pip_kernel, pip_work, 8, 16)
    p32 = _rate(_pip_kernel, pip_work, 32, 16)
    out["pip"] = round(p32 / (4.0 * p8), 3)
    out["pip_points_per_sec_8"] = round(p8 * pts_per_tile)
    out["pip_points_per_sec_32"] = round(p32 * pts_per_tile)
    out["n_tiles"] = n_tiles
    out["measured_at"] = round(time.time(), 1)
    print(json.dumps({"metric": "host_scaling_ceiling_8_to_32", **out}))


if __name__ == "__main__":
    main()
