"""Flagship per-tile stage: points -> Delaunay TIN -> DEM raster tiles.

Spark shape (SURVEY.md §3.1):

    images -> decode_points (mapInPandas) -> cell_id column (JVM expr)
           -> repartitionByRange(cell_id) -> groupBy(cell_id)
           -> applyInPandas(tin_kernel) -> DEM tile table (png16 + caption)

The kernel body is gridlib (Delaunay + vectorized barycentric fill); the
shuffle before applyInPandas is the only data movement.  Each output row
carries per-partition lineage metrics (n_points, n_triangles, filled /
missing cell counts) — the checkpoint/resume contract (north rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import datagen
from ..gridlib import topodb
from ..gridlib.bounds import RasterBounds
from ..gridlib.phash import phash64
from ..gridlib.png import dem_to_png16
from ..gridlib.tilenamer import cell_id_envelope, cell_id_to_name
from ..gridlib.tin import Tin
from .tiling import repartition_by_cell, with_cell_id

TILE_SCHEMA = (
    "cell_id long, image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, n_points int, n_triangles int, "
    "filled_cells int, missing_cells int"
)

DSM_CLASSES = (topodb.CLS_LOW_VEGETATION, topodb.CLS_HIGH_VEGETATION)


def _tile_kernel_factory(px: int, size_north: int, ground_max_first: bool):
    """Kernel: one tile's points -> one DEM tile row.

    ground_max_first=True reproduces pipeline B (VoxelGrid A2 then A8):
    per-cell max-z of ground points wins where present; the TIN (built
    from ground points) backfills the remaining NaN cells.  False =
    pipeline A: pure TIN rasterization of all points (T9).
    """

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(key[0])
        minx, miny, maxx, maxy = (
            int(v) for v in np.array(cell_id_envelope(np.array([cell]), size_north)).ravel()
        )
        bounds = RasterBounds(px, px, minx, miny, maxx, maxy)
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        z = pdf["z"].to_numpy()
        cls = pdf["cls"].to_numpy().astype(np.uint8)

        ground = cls == topodb.CLS_GROUND
        dem = np.full((px, px), np.nan, dtype=np.float32)
        tin_pts = ground if ground_max_first else slice(None)

        if ground_max_first and ground.any():
            # A2: per-cell max(z) of ground points (VoxelGrid.cs:100-107)
            row, col = bounds.proj_to_cell(x[ground], y[ground])
            ok = (row >= 0) & (col >= 0)
            flat = row[ok].astype(np.int64) * px + col[ok].astype(np.int64)
            acc = np.full(px * px, -np.inf, dtype=np.float64)
            np.maximum.at(acc, flat, z[ground][ok])
            filled = acc > -np.inf
            dem.ravel()[filled] = acc[filled].astype(np.float32)

        n_tri = 0
        xs = x[tin_pts]
        if len(xs) >= 3:
            tin = Tin(x[tin_pts], y[tin_pts], z[tin_pts], cls[tin_pts])
            n_tri = tin.triangle_count
            if ground_max_first:
                locked = ~np.isnan(dem)  # keep A2 values, fill NaN only (A8)
                tin.rasterize_dem(bounds, dem=dem, locked=locked)
            else:
                tin.rasterize_dem(bounds, dem=dem)

        name = str(cell_id_to_name(np.array([cell]), size_north)[0])
        caption = datagen.CAPTION_FMT.format(
            name=name, minx=minx, miny=miny, maxx=maxx, maxy=maxy,
            cellsize=(maxx - minx) / px, nodata=-9999,
        )
        filled_cells = int((~np.isnan(dem)).sum())
        return pd.DataFrame(
            [
                {
                    "cell_id": cell,
                    "image_id": name,
                    "bytes": dem_to_png16(dem, datagen.Z_MIN, datagen.Z_MAX),
                    "w": px,
                    "h": px,
                    "fmt": "png16",
                    "caption": caption,
                    "phash": phash64(np.nan_to_num(dem)),
                    "n_points": len(pdf),
                    "n_triangles": n_tri,
                    "filled_cells": filled_cells,
                    "missing_cells": px * px - filled_cells,
                }
            ]
        )

    return kernel


def rasterize_tin_tiles(
    points: DataFrame,
    px: int = 128,
    size_north: int = 1000,
    ground_max_first: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """points(x, y, z, cls) -> DEM tile table (one row per tile)."""
    if "cell_id" not in points.columns:
        points = with_cell_id(points, size_north)
    points = repartition_by_cell(points, num_partitions)
    kernel = _tile_kernel_factory(px, size_north, ground_max_first)
    return points.groupBy("cell_id").applyInPandas(kernel, TILE_SCHEMA)


def rasterize_images_fused(images: DataFrame, px: int = 128,
                           partitions: int | None = None) -> DataFrame:
    """Shuffle-free flagship path: one image = one tile, and sampled
    points land in their own tile by construction, so decode -> sample ->
    Delaunay -> rasterize fuses into a single narrow mapInPandas pass —
    no exchange at all (the general :func:`rasterize_tin_tiles` keeps the
    shuffle for points that don't align with tiles).

    The input scan is one small parquet file at test scale, so without an
    explicit repartition the whole stage would run on ONE task — the
    classic small-file parallelism trap (at 10^12 scale the table has
    thousands of splits and this repartition becomes a no-op coalesce).
    """
    import pandas as pd

    from .. import datagen as dg
    from ..gridlib.png import png16_to_dem
    from ..gridlib.tilenamer import cell_id as cid_fn

    if partitions:
        images = images.repartition(partitions)

    def run(batches):
        for pdf in batches:
            rows = []
            for cap, data in zip(pdf["caption"], pdf["bytes"]):
                name, minx, miny, maxx, maxy, cs, _ = dg.parse_caption(cap)
                dem_in = png16_to_dem(bytes(data), dg.Z_MIN, dg.Z_MAX)
                x, y, z, cls = dg.sample_points_from_tile(name, dem_in, minx, miny, cs)
                bounds = RasterBounds(px, px, minx, miny, maxx, maxy)
                dem = np.full((px, px), np.nan, dtype=np.float32)
                n_tri = 0
                if len(x) >= 3:
                    tin = Tin(x, y, z, cls)
                    n_tri = tin.triangle_count
                    tin.rasterize_dem(bounds, dem=dem)
                cell = int(cid_fn(np.array([minx]), np.array([miny]), 1000)[0])
                caption = dg.CAPTION_FMT.format(
                    name=name, minx=minx, miny=miny, maxx=maxx, maxy=maxy,
                    cellsize=(maxx - minx) / px, nodata=-9999,
                )
                filled = int((~np.isnan(dem)).sum())
                rows.append(
                    {
                        "cell_id": cell,
                        "image_id": name,
                        "bytes": dem_to_png16(dem, dg.Z_MIN, dg.Z_MAX),
                        "w": px, "h": px, "fmt": "png16",
                        "caption": caption,
                        "phash": phash64(np.nan_to_num(dem)),
                        "n_points": len(x),
                        "n_triangles": n_tri,
                        "filled_cells": filled,
                        "missing_cells": px * px - filled,
                    }
                )
            cols = [c.split()[0] for c in TILE_SCHEMA.split(", ")]
            yield pd.DataFrame(rows, columns=cols)

    return images.select("caption", "bytes").mapInPandas(run, TILE_SCHEMA)


def tile_metrics(tiles: DataFrame) -> DataFrame:
    """Stage-level lineage metrics (north rule: per-partition row counts)."""
    return tiles.select(
        "cell_id", "image_id", "n_points", "n_triangles", "filled_cells",
        "missing_cells",
    )
