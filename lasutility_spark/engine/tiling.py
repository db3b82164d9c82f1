"""Spatial partitioning: cell-id columns, range partitioning, salting.

The cell id (the H3/S2 analog, reference grammar Nls/TileNamer.cs) is a
**native Spark column expression** — pure floor/mod arithmetic that stays
inside WholeStageCodegen; no Python on the partition-key hot path.  Tile
*names* (strings) are only attached to per-tile outputs via a vectorized
pandas UDF (cheap: one string per tile, not per point).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..gridlib import tilenamer as tn


def cell_id_col(x: Column, y: Column, size_north: int) -> Column:
    """Packed int64 cell id of the tile containing (x, y) at a level —
    mirrors gridlib.tilenamer.cell_id (same arithmetic, JVM-side)."""
    se, sn = tn._snap_sizes(size_north)
    col = F.floor((x - F.lit(float(tn.ORIGIN_EAST))) / F.lit(float(se))).cast("long")
    row = F.floor((y - F.lit(float(tn.ORIGIN_NORTH))) / F.lit(float(sn))).cast("long")
    return (row * F.lit(1 << 32) + col).alias("cell_id")


def local_cell_cols(
    x: Column, y: Column, cell_id: Column, size_north: int, px: int
) -> tuple[Column, Column]:
    """(row, col) of the point inside its tile's px-x-px raster — the X3
    cell assignment (RasterBounds.cs:118-133) as column exprs."""
    se, sn = tn._snap_sizes(size_north)
    cw = se / px
    ch = sn / px
    tile_minx = cell_id.bitwiseAND(F.lit(0xFFFFFFFF)) * F.lit(se) + F.lit(
        tn.ORIGIN_EAST
    )
    tile_miny = F.shiftright(cell_id, 32) * F.lit(sn) + F.lit(tn.ORIGIN_NORTH)
    col = F.floor((x - tile_minx) / F.lit(float(cw))).cast("int").alias("col")
    row = F.floor((y - tile_miny) / F.lit(float(ch))).cast("int").alias("row")
    return row, col


@F.pandas_udf(StringType())
def tile_name_1km(cid: pd.Series) -> pd.Series:
    """cell_id -> NLS tile name at the 1 km level (vectorized, memoized on
    unique ids inside gridlib)."""
    return pd.Series(tn.cell_id_to_name(cid.to_numpy(), 1000).astype(object))


def with_cell_id(
    df: DataFrame, size_north: int = 1000, x: str = "x", y: str = "y"
) -> DataFrame:
    return df.withColumn("cell_id", cell_id_col(F.col(x), F.col(y), size_north))


def cell_id_from_caption(size_north: int = 1000) -> Column:
    """cell_id of an image row parsed from its caption
    (``name;minx;miny;maxx;maxy;cellsize;nodata``) — pure JVM string/int
    exprs, so deriving the tile list from a 10^12-row table needs no
    driver collect and no Python."""
    minx = F.split(F.col("caption"), ";").getItem(1).cast("double")
    miny = F.split(F.col("caption"), ";").getItem(2).cast("double")
    return cell_id_col(minx, miny, size_north)


def repartition_by_cell(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Range-partition on cell_id so each applyInPandas group ~= one tile
    and neighboring tiles co-locate (hierarchical prefixes stay sorted)."""
    if num_partitions:
        return df.repartitionByRange(num_partitions, "cell_id")
    return df.repartitionByRange("cell_id")


def with_salted_cell(
    df: DataFrame, size_north: int, sub_size_north: int, halo: float,
    x: str = "x", y: str = "y",
) -> DataFrame:
    """Skew salting for per-tile kernels: re-key dense tiles at a finer
    NLS level (the grammar is natively hierarchical, SURVEY.md §4) and
    duplicate points within ``halo`` meters of a sub-tile edge into the
    neighboring sub-tiles, so each sub-kernel triangulates with enough
    context to match the unsalted raster in its interior window.

    Implementation is pure DataFrame ops: a 3x3 neighbor-offset explode
    filtered to the halo band — the classic spatial-join duplication step
    (X5 analog).
    """
    se, sn = tn._snap_sizes(sub_size_north)
    xs, ys = F.col(x), F.col(y)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    df = df.withColumn("_off", F.explode(offs))
    sub_x = xs + F.col("_off.dx") * F.lit(float(halo))
    sub_y = ys + F.col("_off.dy") * F.lit(float(halo))
    # the point belongs (possibly with halo shift) to this sub-cell iff the
    # shifted position lands in a different sub-cell than unshifted ==> the
    # point is within halo of that sub-cell
    own = cell_id_col(xs, ys, sub_size_north)
    shifted = cell_id_col(sub_x, sub_y, sub_size_north)
    df = (
        df.withColumn("sub_cell", shifted)
        .withColumn("_own", own)
        .filter(
            (F.col("_off.dx") == 0) & (F.col("_off.dy") == 0)
            | (F.col("sub_cell") != F.col("_own"))
        )
        .dropDuplicates(["sub_cell", x, y])
        .drop("_off", "_own")
    )
    return df.withColumn("cell_id", cell_id_col(xs, ys, size_north))
