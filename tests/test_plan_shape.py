"""Physical-plan shape gates: the scale claims in SURVEY/README must be
visible in .explain() output, not just asserted in prose."""

import pytest
from pyspark.sql import functions as F

from lasutility_spark import datagen
from lasutility_spark.engine import pip_stage, points as epoints, tin_stage
from lasutility_spark.engine.tiling import cell_id_from_caption


@pytest.fixture(scope="module")
def images_dir():
    return datagen.ensure_images_table(0.001)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spatial_predicate_pushes_to_parquet_scan(spark, images_dir):
    """Tile-anchor range predicates reach the scan as PushedFilters —
    the row-group pruning that makes strip shards read 1/m of the data."""
    df = epoints.read_images(spark, images_dir).filter(
        (F.col("miny") >= 6666000) & (F.col("miny") < 6668000)
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(miny,6666000)" in plan.replace(" ", "")


def test_feature_bbox_filter_pushes_to_scan(spark, images_dir):
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet").filter(
        F.col("maxy") >= 6666500.0
    )
    plan = _plan(feats)
    assert "PushedFilters" in plan and "maxy" in plan


def test_fused_tin_pass_has_no_exchange(spark, images_dir):
    """q1's fused path over a pre-partitioned cached input: zero
    exchanges at query time (the headline no-shuffle claim)."""
    images = (
        epoints.read_images(spark, images_dir)
        .withColumn("cell_id", cell_id_from_caption(1000))
        .withColumn("parent_id", pip_stage.parent_cell_col(3))
        .repartition(4, "parent_id")
        .cache()
    )
    images.count()
    plan = _plan(tin_stage.rasterize_images_fused(images, px=32))
    body = plan.split("+- == Initial Plan ==")[0]  # cache-build subplan
    assert "InMemoryTableScan" in body
    assert body.count("Exchange") <= body.count("REPARTITION_BY_NUM")
    images.unpersist()


def test_cogroup_reuses_image_side_partitioning(spark, images_dir):
    """classify_images_fused over an input cached as repartition(N,
    parent_id): the heavy image side feeds the cogroup via
    InMemoryTableScan + Sort with NO exchange above it."""
    images = (
        epoints.read_images(spark, images_dir)
        .withColumn("cell_id", cell_id_from_caption(1000))
        .withColumn("parent_id", pip_stage.parent_cell_col(3))
        .repartition(4, "parent_id")
        .cache()
    )
    images.count()
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet")
    from lasutility_spark.gridlib import topodb

    df = pip_stage.classify_images_fused(images, feats, topodb.ALL_POLYGON, px=32)
    plan = _plan(df)
    # the image side of FlatMapCoGroupsInPandas is the first child; it
    # must read the cache directly (Sort over InMemoryTableScan)
    cogroup_at = plan.index("FlatMapCoGroupsInPandas")
    img_side = plan[cogroup_at : plan.index("InMemoryTableScan", cogroup_at)]
    assert "Exchange" not in img_side
    images.unpersist()


def test_joined_classify_never_exchanges_images(spark, images_dir):
    """classify_images_joined: the heavy image side must reach the
    mapInPandas kernel through a BROADCAST hash join — zero Exchange
    anywhere on the image path (only the small per-cell feature-list
    side broadcasts)."""
    images = epoints.read_images(spark, images_dir).withColumn(
        "cell_id", cell_id_from_caption(1000)
    )
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet")
    from lasutility_spark.gridlib import topodb

    df = pip_stage.classify_images_joined(images, feats, topodb.ALL_POLYGON, px=32)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the streamed (image) subtree is printed between the join node and
    # the build side's BroadcastExchange: no shuffle Exchange allowed
    # there (the feature side may shuffle — it is tiny by construction)
    join_at = plan.index("BroadcastHashJoin")
    img_branch = plan[join_at : plan.index("BroadcastExchange", join_at)]
    assert "Exchange hashpartitioning" not in img_branch, img_branch


def test_ivf_learned_centroid_joins_are_broadcast(spark):
    """The learned-centroid IVF re-assignment claims the ~K*DIM-row
    centroid tables ride broadcast joins while only the O(N) vec_id
    joins shuffle — assert that shape in the physical plan: no
    shuffled-hash joins, at most one sort-merge join (the N x N
    vec_id attach, which a billion-vector input cannot broadcast),
    and the dim-index/cnorm joins broadcast."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["sim_ivf_assign_learned"](
        spark, "/root/testdata/sf0.001"
    )
    df.count()  # let AQE finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ShuffledHashJoin") == 0
    assert plan.count("SortMergeJoin") <= 1
    assert plan.count("BroadcastHashJoin") >= 3


def test_minhash_pairs_plan_no_cartesian_no_pairset_exchange(spark):
    """q4 min-band minhash: the ONLY exchange is the band equi-join over
    the (docs x BANDS) table — never a cartesian product, and never an
    exchange over the candidate-pair set itself (the round-3 DISTINCT
    that this plan replaced would show as an extra Exchange above the
    join)."""
    from lasutility_spark.pipelines import dedup

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("documents")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = dedup.minhash_pairs_spark(spark)
        df.count()
        plan = _plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.catalog.clearCache()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # the join's OUTPUT (doc_a, doc_b pairs) flows to the result with no
    # further exchange: every Exchange in the plan keys on the band
    # table's (band, band_key), none on doc_a/doc_b
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "doc_a" not in keys and "doc_b" not in keys, keys


def test_registry_caps_and_flagships_first():
    """Driver-harness contract: the correctness sweep checks the FIRST
    50 queries() entries in insertion order (VERDICT r04), so the
    registry must stay <=50 with the kernel flagships leading and every
    query carrying an oracle."""
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert len(q) <= 50
    assert list(q)[:6] == [
        "t9_tin_rasterize", "t9_tin_rasterize_skew", "b_voxel_tin_backfill",
        "v5_pip_rasterize", "v9_raster_extents", "s10_triangle_features",
    ]
    assert set(q) == set(o)  # zero rows-only queries
