"""Image-table -> points DataFrame (the S2 scan analog).

The reference streams LAZ points one by one (LAS/LasZipNetReader.cs:63-89);
here the point cloud is *derived from decoded pixels* of the image table
(SURVEY.md §1.5): pixel -> point at cell center, value -> z, plus a
deterministic class assignment.  Decode runs inside ``mapInPandas`` —
Arrow batches in, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import datagen
from ..gridlib.png import png16_to_dem

POINTS_SCHEMA = "x double, y double, z double, cls smallint"
# smallint, not tinyint: LAS 1.4 (point formats 6+) classification is the
# full 0-255 byte, and a tinyint column wraps 128..255 to negatives
DECODED_SCHEMA = (
    "image_id string, minx int, miny int, cellsize double, dem binary, "
    "w int, h int"
)


def _decode_points_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out_x, out_y, out_z, out_c = [], [], [], []
        for cap, data in zip(pdf["caption"], pdf["bytes"]):
            name, minx, miny, maxx, maxy, cs, _ = datagen.parse_caption(cap)
            dem = png16_to_dem(data, datagen.Z_MIN, datagen.Z_MAX)
            x, y, z, cls = datagen.sample_points_from_tile(name, dem, minx, miny, cs)
            out_x.append(x)
            out_y.append(y)
            out_z.append(z)
            out_c.append(cls)
        if not out_x:
            yield pd.DataFrame({"x": [], "y": [], "z": [], "cls": []})
            continue
        yield pd.DataFrame(
            {
                "x": np.concatenate(out_x),
                "y": np.concatenate(out_y),
                "z": np.concatenate(out_z),
                "cls": np.concatenate(out_c).astype(np.int16),
            }
        )


def decode_points(images: DataFrame) -> DataFrame:
    """images(image_id, bytes, caption, ...) -> points(x, y, z, cls).

    Column pruning matters at scale: only ``bytes`` + ``caption`` are
    read (the parquet scan prunes the rest).
    """
    return images.select("bytes", "caption").mapInPandas(
        _decode_points_batches, POINTS_SCHEMA
    )


PACKED_SCHEMA = "cell_id long, px int, rc binary, qz binary"


def decode_points_packed(images: DataFrame, size_north: int = 1000) -> DataFrame:
    """Map-side-combined decode for the general shuffle path: one output
    row per (source image, covered tile) with the tile's sampled points
    PACKED — row/col offsets as uint8 bytes and heights as the raw
    uint16 png quantile — instead of one 25-byte (x, y, z, cls) row per
    point (which Spark shuffles as a ~48-byte UnsafeRow).  ~4.4 bytes
    per point cross the shuffle; the tile kernel
    (:func:`..engine.tin_stage.rasterize_tin_tiles_packed`) reconstructs
    x/y/z/cls BIT-EXACTLY: offsets regenerate coordinates through the
    same ``minx + (c + 0.5) * cellsize`` float ops (cellsize 1000/128 =
    7.8125 is dyadic), the png quantile replays ``png16_to_dem``'s
    per-value arithmetic, and class + veg lift are deterministic in
    (x, y) (``datagen.assign_classes``).  This is the classic packed
    point-batch combine: shuffle rows = O(images x tiles covered), not
    O(points) — the design that survives 10^12 points.
    """
    from ..gridlib.png import png_decode
    from ..gridlib.tilenamer import cell_id as cid_fn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cap, data in zip(pdf["caption"], pdf["bytes"]):
                name, minx, miny, maxx, maxy, cs, _ = datagen.parse_caption(cap)
                q = png_decode(bytes(data))
                px = q.shape[0]
                if px > 256:  # r/c no longer fit uint8
                    raise ValueError(f"packed path supports px<=256, got {px}")
                cols, rws = np.meshgrid(np.arange(px), np.arange(px))
                ex = minx + (cols + 0.5) * cs
                ny = miny + (rws + 0.5) * cs
                u = datagen.hash01(
                    (ex * 100).astype(np.int64) + 7, (ny * 100).astype(np.int64)
                )
                rate = (
                    datagen.DENSE_RATE
                    if datagen.is_dense_tile(name)
                    else datagen.BASE_RATE
                )
                sel = u < rate
                r = rws[sel].ravel().astype(np.uint8)
                c = cols[sel].ravel().astype(np.uint8)
                qs = q[sel].ravel().astype("<u2")
                cell = int(
                    cid_fn(np.array([minx]), np.array([miny]), size_north)[0]
                )
                rows.append(
                    {
                        "cell_id": cell,
                        "px": px,
                        "rc": r.tobytes() + c.tobytes(),
                        "qz": qs.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=["cell_id", "px", "rc", "qz"])

    return images.select("caption", "bytes").mapInPandas(run, PACKED_SCHEMA)


def read_images(spark, images_dir: str) -> DataFrame:
    return spark.read.parquet(f"{images_dir}/images.parquet")


def synth_points_sql(table: str = "lineitem") -> str:
    """Portable SQL deriving a deterministic LIDAR-like points table from
    the driver's lineitem table — used so the DuckDB oracle and the Spark
    query compute from the *same* rows (CORRECTNESS harness; the driver's
    testdata has no image table).  Integer arithmetic only, then exact
    /64 and /1024 divisions, so both engines agree bit-for-bit.
    """
    return f"""
    SELECT
      (CAST((l_orderkey * 7919 + l_linenumber * 104729) % 512000 AS DOUBLE) / 64.0)
        + 380000.0 AS x,
      (CAST((l_partkey * 7907 + l_suppkey * 31 + l_linenumber) % 512000 AS DOUBLE) / 64.0)
        + 6666000.0 AS y,
      CAST((l_orderkey * 131 + l_partkey * 17 + l_linenumber) % 524288 AS DOUBLE) / 1024.0
        AS z,
      CAST(CASE
        WHEN (l_orderkey + l_linenumber) % 10 < 7 THEN 2
        WHEN (l_orderkey + l_linenumber) % 10 = 7 THEN 3
        WHEN (l_orderkey + l_linenumber) % 10 = 8 THEN 4
        ELSE 5 END AS INT) AS cls
    FROM {table}
    """


def synth_points(spark, sf_dir: str) -> DataFrame:
    """Spark side of :func:`synth_points_sql` over the driver's parquet."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(synth_points_sql("lineitem"))
