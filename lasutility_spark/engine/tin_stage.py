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

# a2_filled_cells: exact fill count of the A2 ground-max plane BEFORE the
# TIN backfill (pipeline B lineage metric; -1 on the pure-TIN pipeline A
# paths where no A2 plane exists).  Unlike filled_cells it is
# Delaunay-tie-independent, so it rides the DuckDB oracle.
TILE_SCHEMA = (
    "cell_id long, image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, n_points int, n_triangles int, "
    "filled_cells int, missing_cells int, a2_filled_cells int"
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
        return _tile_row(
            int(key[0]),
            pdf["x"].to_numpy(),
            pdf["y"].to_numpy(),
            pdf["z"].to_numpy(),
            pdf["cls"].to_numpy().astype(np.uint8),
            px,
            size_north,
            ground_max_first,
        )

    return kernel


def _tile_row(
    cell: int,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    cls: np.ndarray,
    px: int,
    size_north: int,
    ground_max_first: bool,
) -> pd.DataFrame:
    """One tile's point arrays -> its DEM tile row (shared by the row
    and packed shuffle kernels; point order does not matter — Delaunay
    canonicalizes via sorted dedup)."""
    minx, miny, maxx, maxy = (
        int(v) for v in np.array(cell_id_envelope(np.array([cell]), size_north)).ravel()
    )
    bounds = RasterBounds(px, px, minx, miny, maxx, maxy)

    ground = cls == topodb.CLS_GROUND
    dem = np.full((px, px), np.nan, dtype=np.float32)
    tin_pts = ground if ground_max_first else slice(None)

    a2_filled = 0 if ground_max_first else -1
    if ground_max_first and ground.any():
        # A2: per-cell max(z) of ground points (VoxelGrid.cs:100-107)
        row, col = bounds.proj_to_cell(x[ground], y[ground])
        ok = (row >= 0) & (col >= 0)
        flat = row[ok].astype(np.int64) * px + col[ok].astype(np.int64)
        acc = np.full(px * px, -np.inf, dtype=np.float64)
        np.maximum.at(acc, flat, z[ground][ok])
        filled = acc > -np.inf
        a2_filled = int(filled.sum())
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
                "n_points": len(x),
                "n_triangles": n_tri,
                "filled_cells": filled_cells,
                "missing_cells": px * px - filled_cells,
                "a2_filled_cells": a2_filled,
            }
        ]
    )


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


def rasterize_tin_tiles_packed(
    packed: DataFrame,
    px: int = 128,
    size_north: int = 1000,
    ground_max_first: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Packed-shuffle twin of :func:`rasterize_tin_tiles`: input is the
    ``engine.points.decode_points_packed`` table (one row per source
    image with uint8 row/col offsets + uint16 png quantiles), so the
    groupBy exchange moves ~4.4 bytes/point instead of a ~48-byte
    UnsafeRow/point.  The kernel reconstructs x/y/z/cls bit-exactly
    (dyadic cellsize, replayed ``png16_to_dem`` arithmetic,
    deterministic ``datagen.assign_classes``) and produces rows
    byte-identical to the row-shuffle path — pinned in
    tests/test_engine_spark.py.

    ``num_partitions`` matters MORE here than on the row path: the
    packed rows are so small that AQE's bytes-based partition
    coalescing collapses the kernel stage to a handful of tasks
    (observed 6 tasks on 32 cores at sf0.1 — the Delaunay kernel is
    CPU-bound, so bytes are the wrong signal).  An explicit
    range-partition on cell_id pins the kernel-stage parallelism and
    applyInPandas reuses that partitioning without a second
    exchange."""
    from ..gridlib.png import png_decode  # noqa: F401  (doc anchor)

    z_min, z_max = datagen.Z_MIN, datagen.Z_MAX
    scale = (z_max - z_min) / 65534.0

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(key[0])
        minx, miny, maxx, maxy = (
            int(v)
            for v in np.array(
                cell_id_envelope(np.array([cell]), size_north)
            ).ravel()
        )
        xs, ys, zs, cs_ = [], [], [], []
        for px_img, rc, qz in zip(pdf["px"], pdf["rc"], pdf["qz"]):
            n = len(rc) // 2
            rr = np.frombuffer(rc, np.uint8, count=n)
            cc = np.frombuffer(rc, np.uint8, count=n, offset=n)
            q = np.frombuffer(qz, "<u2")
            cs = (maxx - minx) / int(px_img)
            # identical float ops to datagen.sample_points_from_tile:
            # int + (int64 + 0.5) * float64, elementwise
            x = minx + (cc.astype(np.int64) + 0.5) * cs
            y = miny + (rr.astype(np.int64) + 0.5) * cs
            # replay png16_to_dem per value: f64 -> f32 -> f64 round trip
            demv = ((q.astype(np.float64) - 1.0) * scale + z_min)
            demv[q == 0] = np.nan
            z = demv.astype(np.float32).astype(np.float64)
            z, cls = datagen.assign_classes(x, y, z)
            xs.append(x)
            ys.append(y)
            zs.append(z)
            cs_.append(cls)
        if xs:
            x, y, z, cls = (
                np.concatenate(xs),
                np.concatenate(ys),
                np.concatenate(zs),
                np.concatenate(cs_),
            )
        else:  # pragma: no cover — groupBy never yields empty groups
            x = y = z = np.empty(0)
            cls = np.empty(0, np.uint8)
        return _tile_row(cell, x, y, z, cls, px, size_north, ground_max_first)

    if num_partitions:
        packed = repartition_by_cell(packed, num_partitions)
    return packed.groupBy("cell_id").applyInPandas(kernel, TILE_SCHEMA)


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
            yield _rasterize_tiles_pdf(pdf["caption"], pdf["bytes"], px)

    return images.select("caption", "bytes").mapInPandas(run, TILE_SCHEMA)


def _rasterize_tiles_pdf(caps, datas, px: int) -> "pd.DataFrame":
    """Shared per-tile loop of the fused and scan-local q1 paths:
    caption+png16 bytes -> TIN -> DEM tile rows."""
    import pandas as pd

    from .. import datagen as dg
    from ..gridlib.png import png16_to_dem
    from ..gridlib.tilenamer import cell_id as cid_fn

    rows = []
    for cap, data in zip(caps, datas):
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
                "a2_filled_cells": -1,
            }
        )
    cols = [c.split()[0] for c in TILE_SCHEMA.split(", ")]
    return pd.DataFrame(rows, columns=cols)


def rasterize_images_scanlocal(splits, px: int = 128,
                               strip: tuple[float, float] | None = None):
    """Scan-local q1: tasks read their own parquet row groups with
    pyarrow (``sources.parquet_row_group_splits``), so tile bytes never
    transit the JVM->python Arrow IPC path — see
    :func:`..engine.pip_stage.classify_images_scanlocal` for the
    measured motivation (the framing memcpy is bus-bound and caps the
    N->4N scaling quotient).  Identical output rows to
    :func:`rasterize_images_fused`."""
    from .sources import scan_row_groups

    cols = ["caption", "bytes"] + (["miny"] if strip else [])

    def run(batches):
        for pdf in scan_row_groups(batches, cols):
            if strip is not None:
                # exact shard predicate; row-group stats pruning is advisory
                pdf = pdf[(pdf["miny"] >= strip[0]) & (pdf["miny"] < strip[1])]
            yield _rasterize_tiles_pdf(pdf["caption"], pdf["bytes"], px)

    return splits.mapInPandas(run, TILE_SCHEMA)


SUB_SCHEMA = (
    "cell_id long, qr int, qc int, dem binary, n_points int, n_triangles int"
)


def rasterize_tin_tiles_skew(
    points: DataFrame,
    px: int = 128,
    size_north: int = 1000,
    dense_threshold: int = 20000,
    split: int = 2,
    halo: float = 40.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew-aware TIN rasterization (north rule: salting on dense tiles).

    The NLS grammar bottoms out at 1 km, so dense tiles are re-keyed
    BELOW the grammar: a ``split x split`` quad split of the tile, with
    points within ``halo`` meters of a sub-tile edge duplicated into the
    neighboring sub-tiles (the X5 cover-duplication trick applied to
    salting).  Each sub-kernel triangulates its points + halo and
    rasterizes only its own px/split window, so a dense tile's
    O(n log n) Delaunay cost splits across ``split^2`` tasks instead of
    straggling one; a per-tile merge kernel reassembles the full tile.
    Sparse tiles take the normal one-group path untouched.

    Heights can differ from the unsalted kernel only for cells whose
    containing triangle spans farther than ``halo`` into the sub-tile —
    pinned by a PSNR gate in tests (SURVEY §7 Delaunay-ambiguity rule).
    """
    if "cell_id" not in points.columns:
        points = with_cell_id(points, size_north)
    counts = points.groupBy("cell_id").agg(F.count("*").alias("_n"))
    dense_ids = counts.filter(F.col("_n") > dense_threshold).select("cell_id")
    points = points.join(
        F.broadcast(dense_ids.withColumn("_dense", F.lit(True))),
        "cell_id",
        "left",
    )
    sparse = points.filter(F.col("_dense").isNull()).drop("_dense")
    dense = points.filter(F.col("_dense").isNotNull()).drop("_dense")

    normal = rasterize_tin_tiles(
        sparse, px=px, size_north=size_north, num_partitions=num_partitions
    )

    # --- salted path for dense tiles ------------------------------------
    from ..gridlib import tilenamer as tn

    se, sn = (float(v) for v in tn._snap_sizes(size_north))
    sub_e, sub_n = se / split, sn / split

    tile_minx = F.col("cell_id").bitwiseAND(F.lit(0xFFFFFFFF)) * F.lit(se) + F.lit(
        float(tn.ORIGIN_EAST)
    )
    tile_miny = F.shiftright(F.col("cell_id"), 32) * F.lit(sn) + F.lit(
        float(tn.ORIGIN_NORTH)
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    d = dense.withColumn("_off", F.explode(offs))
    qc = F.floor(
        (F.col("x") + F.col("_off.dx") * F.lit(halo) - tile_minx) / F.lit(sub_e)
    ).cast("int")
    qr = F.floor(
        (F.col("y") + F.col("_off.dy") * F.lit(halo) - tile_miny) / F.lit(sub_n)
    ).cast("int")
    d = (
        d.withColumn("qc", qc)
        .withColumn("qr", qr)
        .filter(
            (F.col("qc") >= 0) & (F.col("qc") < split)
            & (F.col("qr") >= 0) & (F.col("qr") < split)
        )
        # dedup ONLY the halo-exploded copies: two offsets of the same
        # source row land in the same (qr,qc). Including z and cls keeps
        # distinct points that share (x,y) — matching the unsalted path —
        # and makes the result deterministic regardless of partition order.
        .dropDuplicates(["cell_id", "qr", "qc", "x", "y", "z", "cls"])
        .drop("_off")
    )

    if px % split != 0:
        raise ValueError(
            f"px={px} must be divisible by split={split}: sub-rasters of "
            f"{px // split} px would not tile the {px}x{px} DEM"
        )
    sub_px = px // split

    def sub_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell, kqr, kqc = int(key[0]), int(key[1]), int(key[2])
        minx, miny, _maxx, _maxy = (
            float(v)
            for v in np.array(cell_id_envelope(np.array([cell]), size_north)).ravel()
        )
        sminx = minx + kqc * sub_e
        sminy = miny + kqr * sub_n
        bounds = RasterBounds(sub_px, sub_px, sminx, sminy, sminx + sub_e, sminy + sub_n)
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        z = pdf["z"].to_numpy()
        cls = pdf["cls"].to_numpy().astype(np.uint8)
        dem = np.full((sub_px, sub_px), np.nan, dtype=np.float32)
        n_tri = 0
        if len(x) >= 3:
            tin = Tin(x, y, z, cls)
            n_tri = tin.triangle_count
            tin.rasterize_dem(bounds, dem=dem)
        # interior point count (exclude halo dups) for lineage metrics
        interior = (
            (x >= sminx) & (x < sminx + sub_e) & (y >= sminy) & (y < sminy + sub_n)
        ).sum()
        return pd.DataFrame(
            [
                {
                    "cell_id": cell,
                    "qr": kqr,
                    "qc": kqc,
                    "dem": dem.tobytes(),
                    "n_points": int(interior),
                    "n_triangles": n_tri,
                }
            ]
        )

    subs = d.repartition(num_partitions or 64, "cell_id", "qr", "qc").groupBy(
        "cell_id", "qr", "qc"
    ).applyInPandas(sub_kernel, SUB_SCHEMA)

    def merge_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(key[0])
        minx, miny, maxx, maxy = (
            int(v)
            for v in np.array(cell_id_envelope(np.array([cell]), size_north)).ravel()
        )
        dem = np.full((px, px), np.nan, dtype=np.float32)
        n_pts = n_tri = 0
        for buf, qr, qc, npts, ntri in zip(
            pdf["dem"], pdf["qr"], pdf["qc"], pdf["n_points"], pdf["n_triangles"]
        ):
            sub = np.frombuffer(buf, dtype=np.float32).reshape(sub_px, sub_px)
            r0, c0 = int(qr) * sub_px, int(qc) * sub_px
            dem[r0 : r0 + sub_px, c0 : c0 + sub_px] = sub
            n_pts += int(npts)
            n_tri += int(ntri)
        name = str(cell_id_to_name(np.array([cell]), size_north)[0])
        caption = datagen.CAPTION_FMT.format(
            name=name, minx=minx, miny=miny, maxx=maxx, maxy=maxy,
            cellsize=(maxx - minx) / px, nodata=-9999,
        )
        filled = int((~np.isnan(dem)).sum())
        return pd.DataFrame(
            [
                {
                    "cell_id": cell,
                    "image_id": name,
                    "bytes": dem_to_png16(dem, datagen.Z_MIN, datagen.Z_MAX),
                    "w": px, "h": px, "fmt": "png16",
                    "caption": caption,
                    "phash": phash64(np.nan_to_num(dem)),
                    "n_points": n_pts,
                    "n_triangles": n_tri,
                    "filled_cells": filled,
                    "missing_cells": px * px - filled,
                    "a2_filled_cells": -1,
                }
            ]
        )

    salted = subs.groupBy("cell_id").applyInPandas(merge_kernel, TILE_SCHEMA)
    return normal.unionByName(salted)


def tile_metrics(tiles: DataFrame) -> DataFrame:
    """Stage-level lineage metrics (north rule: per-partition row counts)."""
    return tiles.select(
        "cell_id", "image_id", "n_points", "n_triangles", "filled_cells",
        "missing_cells",
    )
