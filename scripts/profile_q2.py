"""Decompose q2's Spark-layer overhead at a given parallelism.

Times, over the SAME cached 16384-tile image table bench uses:
  noop    — mapInPandas that drains the Arrow stream, returns counts
            (framing floor: JVM->Arrow->pandas of ~450 MB tile bytes)
  decode  — noop + png16 decode + point sampling (python compute, no
            feature work)
  full    — classify_images_prebroadcast (the q2 kernel)
Each timed with the bench warm protocol (1 untimed + best of 2).
Also prints per-task durations of the full run's last attempt to show
the straggler tail (max/median task time).

Usage: SPARK_GRAFT_CPUS=32 python scripts/profile_q2.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lasutility_spark import datagen  # noqa: E402
from lasutility_spark.engine import pip_stage  # noqa: E402
from lasutility_spark.engine.session import get_spark  # noqa: E402
from lasutility_spark.gridlib import topodb  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TILES = int(os.environ.get("SPARK_GRAFT_TILES", "16384"))


def main() -> None:
    spark = get_spark(CPUS, app=f"profile_q2_c{CPUS}")
    sf = float(os.environ.get("SPARK_GRAFT_SF", "0.1"))
    images_dir = datagen.ensure_images_table(sf, n_tiles=N_TILES)
    from lasutility_spark.engine import points as epoints

    images = epoints.read_images(spark, images_dir)
    from lasutility_spark.engine.tiling import cell_id_from_caption

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    images = (
        images.withColumn("cell_id", cell_id_from_caption(1000))
        .withColumn("parent_id", pip_stage.parent_cell_col(3))
        .repartition(n_shuffle, "parent_id")
        .cache()
    )
    n = images.count()
    print(f"cpus={CPUS} tiles={n} partitions={images.rdd.getNumPartitions()}")

    feats = spark.read.parquet(f"{images_dir}/polygons.parquet").union(
        spark.read.parquet(f"{images_dir}/lines.parquet")
    )
    classmap = {**topodb.ALL_POLYGON, **topodb.ALL_LINE}
    b_pc = pip_stage.per_cell_broadcast(
        spark, pip_stage.per_cell_feature_lists(feats)
    )

    def timed(key, thunk, action):
        action(thunk())
        best = None
        for _ in range(2):
            t0 = time.time()
            action(thunk())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{key}: {best:.3f} s")
        return best

    def noop():
        def run(batches):
            tot = 0
            for pdf in batches:
                tot += sum(len(b) for b in pdf["bytes"])
            yield pd.DataFrame({"n": [tot]})

        return images.select("cell_id", "caption", "bytes").mapInPandas(
            run, "n long"
        )

    def decode_only():
        from lasutility_spark import datagen as dg
        from lasutility_spark.gridlib.png import png16_to_dem

        def run(batches):
            tot = 0
            for pdf in batches:
                for cap, data in zip(pdf["caption"], pdf["bytes"]):
                    name, minx, miny, maxx, maxy, cs, _ = dg.parse_caption(cap)
                    dem = png16_to_dem(bytes(data), dg.Z_MIN, dg.Z_MAX)
                    x, y, _z, _c = dg.sample_points_from_tile(
                        name, dem, minx, miny, cs
                    )
                    tot += len(x)
            yield pd.DataFrame({"n": [tot]})

        return images.select("caption", "bytes").mapInPandas(run, "n long")

    def full():
        return pip_stage.classify_images_prebroadcast(
            images, b_pc, classmap, px=128
        )

    s = lambda df: df.agg(F.sum(df.columns[-1])).collect()[0][0]  # noqa: E731
    t_noop = timed("noop_arrow_drain", noop, s)
    t_dec = timed("decode_sample", decode_only, s)

    # instrument task times of the full query via the status tracker
    sc = spark.sparkContext
    full_df = full()
    s(full_df)  # warm
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup() or [])
    t0 = time.time()
    s(full_df)
    t_full = time.time() - t0
    print(f"full_prebc: {t_full:.3f} s")
    print(
        f"breakdown: framing {t_noop:.2f}, +decode {t_dec - t_noop:.2f}, "
        f"+features {t_full - t_dec:.2f}"
    )


if __name__ == "__main__":
    main()
