"""File-format sources: LAS point clouds and shapefiles -> DataFrames.

The reference's inputs are LAZ/LAS point streams (LAS/LasZipNetReader.cs)
and NLS shapefiles (Shapefile/RasteriserEvenOdd.cs:28).  Here:

- LAS files scan DISTRIBUTED: the path list becomes a one-column table
  and each task parses its files with the vectorized numpy reader
  (gridlib/las.py) inside ``mapInPandas`` — at 100 TB the tile->file
  mapping shards across executors and no point ever touches the driver.
- Shapefiles are dimension-sized (the largest NLS fixture is ~2 MB /
  7k features), so one driver-side parse feeding a broadcast-able
  DataFrame is the right physical plan; for many files, parse inside
  ``mapInPandas`` over a path table exactly like LAS.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..gridlib.las import read_las_file
from ..gridlib.laz import read_laz_file
from ..gridlib.shp import read_shapefile
from .points import POINTS_SCHEMA

FEATURE_SCHEMA = "feature_id long, geom_wkb binary, luokka long, seq long"


def read_las_points(spark: SparkSession, paths: list[str]) -> DataFrame:
    """LAS/LAZ files -> points(x, y, z, cls), one scan task per file.

    Compressed .laz files route through the pure-Python LASzip
    decompressor (gridlib/laz.py); at scale each LAZ *chunk* is an
    independently decodable unit, so a large file shards by chunk-table
    offsets the same way this shards by file."""
    path_df = spark.createDataFrame([(p,) for p in paths], "path string")
    path_df = path_df.repartition(max(1, min(len(paths), 256)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                reader = read_laz_file if p.endswith(".laz") else read_las_file
                _h, x, y, z, cls = reader(p)
                yield pd.DataFrame(
                    {"x": x, "y": y, "z": z, "cls": cls.astype("int16")}
                )

    return path_df.mapInPandas(run, POINTS_SCHEMA)


def read_shapefile_features(
    spark: SparkSession, path: str, seq_offset: int = 0
) -> DataFrame:
    """One shapefile -> features(feature_id, geom_wkb, luokka, seq).

    ``seq_offset`` shifts the scan-order ranks so several files keep the
    reference's file-by-file overlay order (RasteriserEvenOdd.Tests.cs:
    45-46 sorts filenames because overlap order matters)."""
    pdf = read_shapefile(path)
    if seq_offset:
        pdf = pdf.assign(seq=pdf["seq"] + seq_offset)
    rows = [
        (int(r.feature_id), bytes(r.geom_wkb), int(r.luokka), int(r.seq))
        for r in pdf.itertuples()
    ]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def read_laz_points_chunked(spark: SparkSession, path: str) -> DataFrame:
    """One LAZ file -> points(x, y, z, cls), ONE SPARK TASK PER CHUNK.

    The driver parses only the header + chunk table (a few KB) to build
    the split list; each task decodes its own chunk — LASzip chunks are
    independently decodable (raw first point + fresh model state), so
    they parallelize exactly like parquet row groups.  In the sandbox a
    task re-opens the local file and slices its byte range; on a cluster
    the same plan issues object-store ranged reads.
    """
    from ..gridlib.laz import decode_laz_chunk, laz_chunk_plan

    with open(path, "rb") as f:
        data = f.read()
    header, vlr, chunks = laz_chunk_plan(data)
    sx, sy, sz = header["scale"]
    ox, oy, oz = header["offset"]
    rows = [(path, int(s), int(c)) for s, c in chunks]
    plan = spark.createDataFrame(rows, "path string, start long, count long")
    plan = plan.repartition(max(1, min(len(rows), 256)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, bytes] = {}
        for pdf in batches:
            for p, s, c in zip(pdf["path"], pdf["start"], pdf["count"]):
                raw = cache.get(p)
                if raw is None:
                    with open(p, "rb") as f:
                        raw = cache[p] = f.read()
                xs, ys, zs, cls, _ret, _gps, _rgb, _extra, _wave = (
                    decode_laz_chunk(raw, vlr, int(s), int(c))
                )
                yield pd.DataFrame(
                    {
                        "x": xs * sx + ox,
                        "y": ys * sy + oy,
                        "z": zs * sz + oz,
                        "cls": cls.astype("int16"),
                    }
                )

    return plan.mapInPandas(run, POINTS_SCHEMA)


def parquet_row_group_splits(
    spark: SparkSession,
    path: str,
    strip_col: str | None = None,
    strip: tuple[float, float] | None = None,
) -> DataFrame:
    """Parquet file(s) -> one row per row group: the split table for a
    SCAN-LOCAL stage (python workers read their own row groups with
    pyarrow instead of receiving cached JVM bytes over Arrow IPC).

    Motivation (measured, BENCH/BASELINE.md): piping a cached table of
    large binary tiles JVM->python costs 4-5 memory passes over the
    bytes (cache read, Arrow serialize, socket, pandas materialize) —
    a pure-memcpy stage whose 8->32-thread quotient is the host's
    memory-bus ceiling (~0.16), dragging the whole query's scaling
    down.  Executors reading their own splits from (page-cached) files
    is one pass, and on a real cluster it is simply the normal
    node-local columnar scan.

    ``strip_col``/``strip``: row groups whose [min, max] statistics for
    that column don't intersect ``[lo, hi)`` are pruned driver-side —
    the row-group analog of parquet predicate pushdown (shard mode).
    One split = one task (repartition(n_splits)): at 16k tiles that is
    256 tasks of ~64 tiles — fine-grained enough for wave balance, and
    at 10^12 scale the listing itself would shard (Iceberg manifest
    style) instead of living on the driver.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    rows = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(strip_col) if strip_col else -1
        for i in range(md.num_row_groups):
            if strip is not None and ci >= 0:
                st = md.row_group(i).column(ci).statistics
                if st is not None and st.has_min_max and (
                    st.max < strip[0] or st.min >= strip[1]
                ):
                    continue
            rows.append((f, i))
    return spark.createDataFrame(rows, "path string, rg int").repartition(
        len(rows) or 1
    )


def scan_row_groups(
    pdf_iter: Iterator[pd.DataFrame], columns: list[str]
) -> Iterator[pd.DataFrame]:
    """Kernel-side half of the scan-local pattern: iterate a split
    table's (path, rg) rows, yield one pandas frame per row group.
    ParquetFile handles are memoized per task so a task owning several
    row groups of one file parses the footer once."""
    import pyarrow.parquet as pq

    handles: dict[str, object] = {}
    for pdf in pdf_iter:
        for p, rg in zip(pdf["path"], pdf["rg"]):
            pf = handles.get(p)
            if pf is None:
                pf = handles[p] = pq.ParquetFile(p)
            yield pf.read_row_group(
                int(rg), columns=columns, use_threads=False
            ).to_pandas()
