"""Spark-stage integration tests: end-to-end slice, PIP strategies, voxel
relational ops, partition-count invariance (local[8] == local[32] analog)."""

import re

import numpy as np
import pandas as pd
import pytest

from lasutility_spark import datagen
from lasutility_spark.engine import pip_stage, points as pts, tiling, tin_stage, voxel
from lasutility_spark.gridlib import topodb
from lasutility_spark.gridlib.bounds import RasterBounds
from lasutility_spark.gridlib.png import png16_to_dem, png_decode
from lasutility_spark.gridlib.tilenamer import tile_decode
from lasutility_spark.gridlib.tin import Tin


@pytest.fixture(scope="module")
def images_dir(tmp_path_factory):
    return datagen.ensure_images_table(0.001, base_dir="/root/repo/.cache")


def test_end_to_end_tin_slice(spark, images_dir):
    """SURVEY §7.3: the minimum end-to-end slice, asserted allclose against
    a single-process gridlib oracle on the same input."""
    images = pts.read_images(spark, images_dir)
    p = pts.decode_points(images)
    tiles = tin_stage.rasterize_tin_tiles(p, px=64, num_partitions=4)
    out = {r["image_id"]: r for r in tiles.collect()}
    assert len(out) == 9

    # single-process oracle for one tile
    import pyarrow.parquet as pq

    src = pq.read_table(f"{images_dir}/images.parquet").to_pandas()
    row = src.iloc[3]
    name, minx, miny, maxx, maxy, cs, _ = datagen.parse_caption(row["caption"])
    dem_in = png16_to_dem(row["bytes"], datagen.Z_MIN, datagen.Z_MAX)
    x, y, z, cls = datagen.sample_points_from_tile(name, dem_in, minx, miny, cs)
    bounds = RasterBounds(64, 64, minx, miny, maxx, maxy)
    oracle = Tin(x, y, z, cls).rasterize_dem(bounds)

    got = png16_to_dem(bytes(out[name]["bytes"]), datagen.Z_MIN, datagen.Z_MAX)
    both = ~np.isnan(oracle) & ~np.isnan(got)
    assert both.mean() > 0.9
    # PSNR >= 40 dB gate (BASELINE input_hint)
    mse = float(np.mean((got[both] - oracle[both]) ** 2))
    psnr = 10 * np.log10(500.0**2 / max(mse, 1e-12))
    assert psnr >= 40, psnr
    assert out[name]["caption"] == row["caption"].replace(";7.8125;", ";15.625;")
    assert out[name]["n_points"] == len(x)
    assert out[name]["n_triangles"] > 0


def test_tin_partition_invariance(spark, images_dir):
    """Same output regardless of parallelism (the north-rule determinism
    requirement: local[8] vs local[32] equality)."""
    images = pts.read_images(spark, images_dir)
    p = pts.decode_points(images)
    a = tin_stage.rasterize_tin_tiles(p, px=32, num_partitions=1).collect()
    b = tin_stage.rasterize_tin_tiles(p, px=32, num_partitions=7).collect()
    da = {r["image_id"]: (r["phash"], bytes(r["bytes"])) for r in a}
    db = {r["image_id"]: (r["phash"], bytes(r["bytes"])) for r in b}
    assert da == db  # bit-identical tiles


def test_voxel_relational_ops(spark):
    """A2/A3/A4/A5/S14 semantics on the hand-computed VoxelGrid golden
    (VoxelGrid.Tests.cs:18-135), run through the Spark operators."""
    # grid [0,10)x[100000,200000) 10x10, the reference's edge-case fixture
    rows = [
        # ground points: per-cell max
        (0.0, 100000.0, 100.0, 2),
        (10.0 - 1e-6, 200000.0 - 1e-6, 10.0, 2),
        # three non-ground in one cell -> sorted desc [10, 5, 2.5]
        (5.0, 155000.0, 2.5, 5),
        (5.0, 155000.0, 10.0, 5),
        (5.0, 155000.0, 5.0, 5),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["x", "y", "z", "cls"])
    )
    # manual cell assignment for this custom (non-NLS) grid
    from pyspark.sql import functions as F

    df = (
        df.withColumn("cell_id", F.lit(0))
        .withColumn("row", F.floor((F.col("y") - 100000.0) / 10000.0).cast("int"))
        .withColumn("col", F.floor(F.col("x") / 1.0).cast("int"))
    )
    dem = {(r["row"], r["col"]): r["dem_z"] for r in voxel.ground_dem(df).collect()}
    assert dem[(0, 0)] == 100.0
    assert dem[(9, 9)] == 10.0

    b = voxel.bins(df).collect()
    assert len(b) == 1
    zs = [p["z"] for p in b[0]["points"]]
    assert zs == [10.0, 5.0, 2.5]  # desc by z (Bin.cs:35-39)

    top = voxel.highest_in_class_range(df, 3, 5).collect()
    assert {(r["row"], r["col"]): r["surface_z"] for r in top}[(5, 5)] == 10.0

    surf = {
        (r["row"], r["col"]): r["h"]
        for r in voxel.surface_model(df, 3, 5).collect()
    }
    assert surf[(5, 5)] == 10.0  # veg wins
    assert surf[(0, 0)] == 100.0  # ground fallback
    ext = voxel.extent(df).collect()[0]
    assert (ext["minx"], ext["maxx"]) == (0, 10)


def test_neighborhood_max(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [(0, 1, 1, 5.0), (0, 1, 2, 3.0), (0, 2, 2, 4.0), (0, 5, 5, 2.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell_id", "row", "col", "z"])
    ).withColumn("cls", F.lit(5))
    res = {
        (r["row"], r["col"]): r["is_local_max"]
        for r in voxel.neighborhood_max(df, 1, 3, 5).collect()
    }
    assert res[(1, 1)] is True  # 5.0 beats neighbors 3.0, 4.0
    assert res[(1, 2)] is False
    assert res[(5, 5)] is True  # isolated cell (border clamp analog)


def test_pip_broadcast_vs_cogrouped_and_oracle(spark, images_dir):
    """V1-V8: both physical strategies produce identical rasters, and they
    match the single-process gridlib oracle."""
    images = pts.read_images(spark, images_dir)
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet").union(
        spark.read.parquet(f"{images_dir}/lines.parquet")
    )
    # build cell ids from captions (tile min corner)
    cap = images.select("caption").toPandas()["caption"]
    from lasutility_spark.gridlib.tilenamer import cell_id

    mins = np.array([datagen.parse_caption(c)[1:3] for c in cap])
    cells = cell_id(mins[:, 0], mins[:, 1], 1000)
    tile_df = spark.createDataFrame(pd.DataFrame({"cell_id": cells}))

    classmap = {**topodb.ALL_POLYGON, **topodb.ALL_LINE}
    a = pip_stage.rasterize_features_broadcast(
        spark, tile_df, feats, classmap, px=64
    ).collect()
    b = pip_stage.rasterize_features_cogrouped(
        tile_df, feats, classmap, px=64
    ).collect()
    da = {r["image_id"]: bytes(r["bytes"]) for r in a}
    db = {r["image_id"]: bytes(r["bytes"]) for r in b}
    assert da.keys() == db.keys()
    assert da == db  # identical rasters from both strategies

    # oracle: rasterize one tile single-process
    feat_rows = [
        (r["seq"], r["luokka"], bytes(r["geom_wkb"]))
        for r in feats.select("seq", "luokka", "geom_wkb").collect()
    ]
    some = a[0]
    oracle = pip_stage._rasterize_tile(
        some["cell_id"], 64, 1000, feat_rows, classmap
    )
    assert oracle["bytes"] == bytes(some["bytes"])
    assert sum(r["painted_cells"] for r in a) > 0  # something got painted


def test_pip_classify_points(spark, images_dir):
    images = pts.read_images(spark, images_dir)
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet")
    import numpy as np
    from pyspark.sql import functions as F

    from lasutility_spark.gridlib.tilenamer import cell_id

    cap = images.select("caption").toPandas()["caption"]
    mins = np.array([datagen.parse_caption(c)[1:3] for c in cap])
    tile_df = spark.createDataFrame(
        pd.DataFrame({"cell_id": cell_id(mins[:, 0], mins[:, 1], 1000)})
    )
    pip_tiles = pip_stage.rasterize_features_broadcast(
        spark, tile_df, feats, topodb.ALL_POLYGON, px=64
    )
    p = pts.decode_points(images)
    classified = pip_stage.pip_classify_points(p, pip_tiles)
    vals = classified.groupBy("value").count().collect()
    byval = {r["value"]: r["count"] for r in vals}
    assert 0 in byval  # background
    assert any(v >= 100 for v in byval if v > 0)  # some building/terrain hits
    assert -1 not in byval  # every point found its tile


def test_classify_images_fused_matches_point_rows(spark, images_dir):
    """The fused tile-level PIP (production shape: points never cross the
    shuffle) must agree, per (cell, class value), with the general
    point-rows path."""
    from pyspark.sql import functions as F

    images = pts.read_images(spark, images_dir)
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet").union(
        spark.read.parquet(f"{images_dir}/lines.parquet")
    )
    cm = {**topodb.ALL_POLYGON, **topodb.ALL_LINE}

    fused = pip_stage.classify_images_fused(images, feats, cm, px=64)
    a = {
        (r["cell_id"], r["value"]): r["n"]
        for r in fused.groupBy("cell_id", "value")
        .agg(F.sum("n_points").alias("n"))
        .collect()
    }

    tile_df = images.select(tiling.cell_id_from_caption(1000).alias("cell_id"))
    pip_tiles = pip_stage.rasterize_features_cogrouped(tile_df, feats, cm, px=64)
    p = tiling.with_cell_id(pts.decode_points(images))
    rows = pip_stage.pip_classify_points(p, pip_tiles)
    b = {
        (r["cell_id"], r["value"]): r["n"]
        for r in tiling.with_cell_id(rows)
        .groupBy("cell_id", "value")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert a == b
    assert sum(a.values()) > 0


def test_skew_salted_tin_matches_unsalted(spark, images_dir):
    """North rule: dense tiles re-keyed below the grammar (quad split +
    halo).  Mechanism gate: on non-co-circular (jittered) dense points,
    the salted raster must be PSNR>=40dB vs the unsalted kernel — only
    triangles whose circumcircle reaches past the halo may differ.
    (Grid-center points are maximally co-circular, so the sub-TIN's
    different insertion order legally flips tie diagonals everywhere —
    SURVEY §7: never compare triangle lists.)"""
    rng = np.random.RandomState(99)
    minx, miny = 380000, 6666000  # a 1 km tile
    n = 30000
    xs = rng.uniform(minx, minx + 1000, n)
    ys = rng.uniform(miny, miny + 1000, n)
    zs = np.sin(xs / 37.0) * 8 + np.cos(ys / 53.0) * 6 + 100.0
    pdf = pd.DataFrame(
        {"x": xs, "y": ys, "z": zs, "cls": np.full(n, 2, dtype=np.int8)}
    )
    p = spark.createDataFrame(pdf)

    base = tin_stage.rasterize_tin_tiles(p, px=64, num_partitions=4).collect()
    salted = tin_stage.rasterize_tin_tiles_skew(
        p, px=64, dense_threshold=20000, split=2, halo=40.0, num_partitions=4
    ).collect()
    assert len(base) == 1 and len(salted) == 1
    a = png16_to_dem(bytes(base[0]["bytes"]), datagen.Z_MIN, datagen.Z_MAX)
    c = png16_to_dem(bytes(salted[0]["bytes"]), datagen.Z_MIN, datagen.Z_MAX)
    fa = np.nan_to_num(a, nan=-1.0)
    fc = np.nan_to_num(c, nan=-1.0)
    mse = float(((fa - fc) ** 2).mean())
    psnr = 99.0 if mse == 0 else 10 * np.log10(
        (datagen.Z_MAX - datagen.Z_MIN) ** 2 / mse
    )
    assert psnr >= 40.0, f"salted PSNR {psnr:.1f} dB"
    # lineage metrics survive the split+merge: interior points sum back
    assert salted[0]["n_points"] == n
    # sparse tiles bypass salting entirely: byte-identical to normal path
    images = pts.read_images(spark, images_dir)
    pp = pts.decode_points(images)
    b2 = {r["image_id"]: bytes(r["bytes"]) for r in
          tin_stage.rasterize_tin_tiles(pp, px=64, num_partitions=4).collect()}
    s2 = {r["image_id"]: bytes(r["bytes"]) for r in
          tin_stage.rasterize_tin_tiles_skew(
              pp, px=64, dense_threshold=20000, num_partitions=4).collect()}
    assert b2 == s2


def test_classify_broadcast_matches_cogrouped(spark, images_dir):
    """Broadcast and cogrouped fused-PIP strategies (SURVEY §4
    broadcast-vs-partitioned) must produce identical per-tile class
    histograms."""
    from pyspark.sql import functions as F

    images = pts.read_images(spark, images_dir)
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet").union(
        spark.read.parquet(f"{images_dir}/lines.parquet")
    )
    cm = {**topodb.ALL_POLYGON, **topodb.ALL_LINE}
    a = {
        (r["cell_id"], r["value"]): r["n_points"]
        for r in pip_stage.classify_images_fused(images, feats, cm, px=64).collect()
    }
    b = {
        (r["cell_id"], r["value"]): r["n_points"]
        for r in pip_stage.classify_images_broadcast(
            spark, images, feats, cm, px=64
        ).collect()
    }
    assert a == b and len(a) > 0
    c = {
        (r["cell_id"], r["value"]): r["n_points"]
        for r in pip_stage.classify_images_joined(
            images, feats, cm, px=64
        ).collect()
    }
    assert a == c
    b_pc = pip_stage.per_cell_broadcast(
        spark, pip_stage.per_cell_feature_lists(feats)
    )
    d = {
        (r["cell_id"], r["value"]): r["n_points"]
        for r in pip_stage.classify_images_prebroadcast(
            images, b_pc, cm, px=64
        ).collect()
    }
    assert a == d
    from lasutility_spark.engine import sources as esources

    splits = esources.parquet_row_group_splits(
        spark, f"{images_dir}/images.parquet"
    )
    e = {
        (r["cell_id"], r["value"]): r["n_points"]
        for r in pip_stage.classify_images_scanlocal(
            splits, b_pc, cm, px=64
        ).collect()
    }
    assert a == e


def test_scanlocal_q1_matches_fused(spark, images_dir):
    """Scan-local q1 (python tasks read their own parquet row groups) is
    byte-identical to the fused cached-table path, including under a
    strip predicate (row-group stats pruning + exact kernel filter)."""
    from lasutility_spark.engine import sources as esources

    images = pts.read_images(spark, images_dir)
    splits = esources.parquet_row_group_splits(
        spark, f"{images_dir}/images.parquet"
    )
    a = {r["image_id"]: (bytes(r["bytes"]), r["n_points"]) for r in
         tin_stage.rasterize_images_fused(images, px=32).collect()}
    b = {r["image_id"]: (bytes(r["bytes"]), r["n_points"]) for r in
         tin_stage.rasterize_images_scanlocal(splits, px=32).collect()}
    assert a == b and len(a) == 9
    # strip slicing: the two shard halves partition the full output
    lo = float(datagen.ANCHOR_N)
    mid, hi = lo + 2 * datagen.TILE_M, lo + 3 * datagen.TILE_M
    parts = {}
    for s in ((lo, mid), (mid, hi)):
        sp = esources.parquet_row_group_splits(
            spark, f"{images_dir}/images.parquet", strip_col="miny", strip=s
        )
        got = {r["image_id"]: (bytes(r["bytes"]), r["n_points"]) for r in
               tin_stage.rasterize_images_scanlocal(
                   sp, px=32, strip=s
               ).collect()}
        assert not set(got) & set(parts)
        parts.update(got)
    assert parts == a


def test_packed_shuffle_matches_row_shuffle(spark, images_dir):
    """q1b packed shuffle (uint8 offsets + uint16 png quantiles through
    the exchange) is byte-identical to the row shuffle — both pipelines
    A and B, at any partition count — and moves >=2x fewer payload bytes
    per point."""
    from pyspark.sql import functions as F

    images = pts.read_images(spark, images_dir)

    def rows(df):
        return {
            r["image_id"]: (
                bytes(r["bytes"]), r["n_points"], r["n_triangles"],
                r["phash"], r["filled_cells"], r["a2_filled_cells"],
            )
            for r in df.collect()
        }

    packed = pts.decode_points_packed(images)
    a = rows(tin_stage.rasterize_tin_tiles(
        pts.decode_points(images), px=32, num_partitions=4))
    b = rows(tin_stage.rasterize_tin_tiles_packed(packed, px=32))
    assert a == b and len(a) == 9
    c = rows(tin_stage.rasterize_tin_tiles_packed(packed.repartition(7), px=32))
    assert a == c
    # pipeline B (A2 ground-max plane + TIN backfill) parity
    d = rows(tin_stage.rasterize_tin_tiles(
        pts.decode_points(images), px=32, num_partitions=3,
        ground_max_first=True))
    e = rows(tin_stage.rasterize_tin_tiles_packed(
        packed, px=32, ground_max_first=True))
    assert d == e

    # shuffle payload: raw row bytes (x,y,z doubles + cls) vs packed
    # blobs (+12 B/row key+px overhead) — the >=2x VERDICT criterion,
    # conservatively ignoring the extra per-row UnsafeRow padding the
    # row path also pays
    n_points = pts.decode_points(images).count()
    packed_bytes = packed.select(
        (F.sum(F.length("rc") + F.length("qz")) + F.count("*") * 12).alias("b")
    ).collect()[0]["b"]
    assert packed_bytes * 2 <= n_points * 25


def test_ann_topk_matmul_matches_sql(spark):
    """Scale-path brute-force ANN (Arrow matmul + per-batch local top-k)
    is row-identical to the SQL form that queries() ships — same
    quantization, exact int64 dots, same (dot DESC, vec_id ASC) ties."""
    from lasutility_spark.pipelines import similarity

    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    want = {
        tuple(r) for r in spark.sql(similarity.ann_topk_sql("spark"))
        .select("query_id", "neighbor_id", "dot", "rnk").collect()
    }
    got = {
        tuple(r) for r in similarity.ann_topk_spark(spark)
        .select("query_id", "neighbor_id", "dot", "rnk").collect()
    }
    assert got == want and len(got) == 50
    # partition-count independence: local top-k union is lossless
    emb = spark.table("embeddings").repartition(13)
    emb.createOrReplaceTempView("embeddings")
    got13 = {
        tuple(r) for r in similarity.ann_topk_spark(spark)
        .select("query_id", "neighbor_id", "dot", "rnk").collect()
    }
    assert got13 == want


def test_components_one_action_per_superstep(spark, monkeypatch):
    """The connected-components loop folds its convergence check into
    the label-update aggregate: ONE driver action (the agg that both
    materializes the new label cache and returns the changed-count) per
    superstep, plus the single initial materialization — no separate
    old-vs-new join + count job per iteration (at 10^12 edges that
    second job per superstep doubles the job count for control flow).
    Value parity vs the DuckDB RECURSIVE CTE is pinned separately in
    test_oracle_parity (dd_components)."""
    from lasutility_spark.pipelines import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents")

    # patch the CONCRETE class (pyspark 4 instances are
    # pyspark.sql.classic.dataframe.DataFrame, a subclass of the public
    # pyspark.sql.DataFrame — patching the base doesn't intercept)
    DataFrame = type(docs)
    calls = {"n": 0}
    orig_collect, orig_count = DataFrame.collect, DataFrame.count

    def counting_collect(self):
        calls["n"] += 1
        return orig_collect(self)

    def counting_count(self):
        calls["n"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "count", counting_count)
    stats: dict = {}
    labels = dedup.components_spark(spark, stats=stats)
    actions = calls["n"]
    monkeypatch.undo()

    assert stats["supersteps"] >= 1
    assert actions == 1 + stats["supersteps"], (
        f"{actions} driver actions for {stats['supersteps']} supersteps — "
        "expected exactly one per superstep plus the initial count"
    )
    assert labels.count() == docs.count()  # one label row per document


def _exchange_bytes_since(spark, n0: int) -> float:
    """Sum 'shuffle bytes written' across SQL executions with index >= n0
    (SQLAppStatusStore; values are UI-formatted like '59.0 B' / '1.2 KiB')."""
    units = {"B": 1, "KB": 2**10, "KiB": 2**10, "MB": 2**20, "MiB": 2**20,
             "GB": 2**30, "GiB": 2**30}
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    total = 0.0
    for i in range(n0, execs.size()):
        ex = execs.apply(i)
        names = {}
        sit = ex.metrics().iterator()
        while sit.hasNext():
            m = sit.next()
            names[m.accumulatorId()] = m.name()
        eit = store.executionMetrics(ex.executionId()).iterator()
        while eit.hasNext():
            e = eit.next()
            if names.get(e._1()) == "shuffle bytes written":
                # plain ('51.0 KiB') or stats ('total (min, med, max …):\n51.0 KiB (…)')
                m = re.search(r"([\d.]+)\s+(B|KiB|KB|MiB|MB|GiB|GB)", str(e._2()))
                assert m, f"unparseable metric value: {e._2()!r}"
                total += float(m.group(1)) * units[m.group(2)]
    return total


def _n_execs(spark) -> int:
    return spark._jsparkSession.sharedState().statusStore().executionsList().size()


def test_minhash_slim_vs_fat_shuffle_bytes(spark, monkeypatch):
    """Round-5 band-table slimming: each band row carries only its
    EARLIER bands' keys (fixed nullable pk columns, avg 1.5 live
    int64s) instead of the full K=8-slot mh signature through the band
    equi-join exchange.  Raw UnsafeRow width drops 120 -> 56 B/row
    (2.1x, asserted below from the schema); the measured wire bytes
    (post-lz4) drop ~1.4x — compression already squeezes the
    low-entropy mh arrays, so the on-the-wire ratio is smaller than
    the raw ratio.  With broadcast disabled (fixture tables broadcast
    otherwise, hiding the exchange) the slim payload must measurably
    shrink the exchange and produce the identical pair set."""
    from lasutility_spark.pipelines import dedup

    def unsafe_row_bytes(df):
        """UnsafeRow fixed-layout width: 8B null-bitset word (<=64
        cols), 8B per fixed-width field, and for array<bigint> fields
        the variable part (8B header + 8B null bits + 8B/element,
        K_MINHASH elements)."""
        w = 8
        for f in df.schema.fields:
            w += 8
            if f.dataType.simpleString() == "array<bigint>":
                w += 16 + 8 * dedup.K_MINHASH
        return w

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("documents")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        monkeypatch.setenv("SPARK_GRAFT_Q4_FAT", "1")
        spark.catalog.clearCache()
        n0 = _n_execs(spark)
        fat_rows = sorted(tuple(r) for r in dedup.minhash_pairs_spark(spark).collect())
        fat_bytes = _exchange_bytes_since(spark, n0)

        monkeypatch.setenv("SPARK_GRAFT_Q4_FAT", "0")
        spark.catalog.clearCache()
        n0 = _n_execs(spark)
        slim_rows = sorted(tuple(r) for r in dedup.minhash_pairs_spark(spark).collect())
        slim_bytes = _exchange_bytes_since(spark, n0)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.catalog.clearCache()

    assert slim_rows == fat_rows and len(slim_rows) > 0
    assert fat_bytes > 0 and slim_bytes > 0
    assert slim_bytes <= 0.75 * fat_bytes, (
        f"slim exchange {slim_bytes:.0f} B vs fat {fat_bytes:.0f} B — "
        "expected a measurable (>=1.33x) compressed-wire reduction"
    )
    fat_raw = unsafe_row_bytes(
        dedup.minhash_bands_spark(spark, keep_sig=True, keep_prior_keys=False)
    )
    slim_raw = unsafe_row_bytes(
        dedup.minhash_bands_spark(spark, keep_prior_keys=True)
    )
    assert slim_raw * 2 <= fat_raw, (
        f"raw row width {slim_raw} vs {fat_raw} — expected >=2x reduction"
    )


def test_packed_shuffle_measured_exchange_bytes(spark, images_dir):
    """Measured (SQL-metrics) 'shuffle bytes written' for the q1b packed
    path vs the row path: the packed groupBy exchange must move <= half
    the bytes end-to-end.  Complements the schema-math assertion in
    test_packed_shuffle_matches_row_shuffle with the engine's own
    runtime metrics (VERDICT r04 ask #3)."""
    from lasutility_spark.engine import points as pts
    from lasutility_spark.engine import tin_stage

    images = pts.read_images(spark, images_dir)

    n0 = _n_execs(spark)
    n_row = tin_stage.rasterize_tin_tiles(
        pts.decode_points(images), px=32, num_partitions=4
    ).count()
    row_bytes = _exchange_bytes_since(spark, n0)

    n0 = _n_execs(spark)
    n_packed = tin_stage.rasterize_tin_tiles_packed(
        pts.decode_points_packed(images), px=32
    ).count()
    packed_bytes = _exchange_bytes_since(spark, n0)

    assert n_row == n_packed == 9
    assert row_bytes > 0 and packed_bytes > 0
    assert packed_bytes * 2 <= row_bytes, (
        f"packed exchange {packed_bytes:.0f} B vs row {row_bytes:.0f} B — "
        "expected >=2x measured reduction"
    )


def test_components_empty_documents_terminates(spark):
    """Empty documents table: F.sum over zero rows is NULL — the folded
    convergence check must coerce it to 0 and terminate on the first
    superstep instead of spinning to max_iters and raising."""
    from lasutility_spark.pipelines import dedup

    spark.createDataFrame([], "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    stats: dict = {}
    labels = dedup.components_spark(spark, stats=stats)
    assert labels.count() == 0
    assert stats["supersteps"] == 1
    # restore the real view for any later test in the session
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("documents")
