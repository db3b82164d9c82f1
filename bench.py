#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries once on local[$SPARK_GRAFT_CPUS] over
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...}, "sf": ...} plus throughput fields.

--scaling: run the same input at local[8] (N) and local[32] (4N) in
fresh JVMs (subprocesses), compute scaling efficiency
throughput(4N) / (4 x throughput(N)), and write BENCH/BASELINE.md —
the sandbox evidence for the north rule's two-cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else 0.1


def run_once() -> dict:
    import numpy as np
    import pandas as pd

    from lasutility_spark import datagen
    from lasutility_spark.engine import pip_stage, points as epoints, tin_stage
    from lasutility_spark.engine.session import get_spark
    from lasutility_spark.gridlib import topodb
    from lasutility_spark.gridlib.tilenamer import cell_id as cid_fn
    from lasutility_spark.pipelines import dedup, similarity

    sf = _sf_of(SF_DIR)
    spark = get_spark(CPUS, app=f"bench_c{CPUS}")
    n_override = os.environ.get("SPARK_GRAFT_TILES")
    images_dir = datagen.ensure_images_table(
        sf, n_tiles=int(n_override) if n_override else None
    )
    warm = os.environ.get("SPARK_GRAFT_BENCH_WARM") == "1"
    images = epoints.read_images(spark, images_dir).cache()
    n_tiles = images.count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(key, thunk, action=lambda df: df.count()):
        """time a query; in warm mode run twice and keep the steady-state
        (2nd) run — JVM JIT + python-worker spawn amortize away on a real
        long-lived cluster."""
        if warm:
            action(thunk())
        t0 = time.time()
        n = action(thunk())
        timings[key] = time.time() - t0
        return n

    # --- q1: TIN rasterization (tiles/sec headline) ----------------------
    # fused narrow path: one image = one tile -> no shuffle; explicit
    # repartition defeats the small-file single-task trap
    n_out = timed(
        "q1_tin_rasterize",
        lambda: tin_stage.rasterize_images_fused(images, px=128, partitions=4 * CPUS),
    )
    extras["tiles_per_sec"] = n_out / timings["q1_tin_rasterize"]
    extras["n_tiles"] = n_out

    # --- q1b: general shuffle path (points from anywhere -> tiles) --------
    timed(
        "q1b_tin_shuffle_path",
        lambda: tin_stage.rasterize_tin_tiles(
            epoints.decode_points(images.repartition(4 * CPUS)),
            px=128,
            num_partitions=4 * CPUS,
        ),
    )

    # --- q2: PIP join (points/sec headline) ------------------------------
    feats = spark.read.parquet(f"{images_dir}/polygons.parquet").union(
        spark.read.parquet(f"{images_dir}/lines.parquet")
    )
    caps = images.select("caption").toPandas()["caption"]
    mins = np.array([datagen.parse_caption(c)[1:3] for c in caps])
    tile_df = spark.createDataFrame(
        pd.DataFrame({"cell_id": cid_fn(mins[:, 0], mins[:, 1], 1000)})
    )
    classmap = {**topodb.ALL_POLYGON, **topodb.ALL_LINE}

    def q2():
        pip_tiles = pip_stage.rasterize_features_cogrouped(
            tile_df, feats, classmap, px=128
        )
        return pip_stage.pip_classify_points(
            epoints.decode_points(images.repartition(4 * CPUS)), pip_tiles
        )

    n_points = timed("q2_pip_join", q2)
    extras["pip_points_per_sec"] = n_points / timings["q2_pip_join"]
    extras["n_points"] = n_points

    # --- q3-q5: relational headline queries -------------------------------
    import __spark_entry__ as m

    q = m.queries()
    timed("q3_surface_model", lambda: q["s14_surface_model"](spark, SF_DIR))
    timed("q4_minhash_dedup", lambda: q["dd_minhash_pairs"](spark, SF_DIR))
    timed("q5_ann_topk", lambda: q["sim_ann_topk"](spark, SF_DIR))

    spark.stop()
    total = sum(timings.values())
    return {
        "metric": "tin_pip_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": CPUS,
        **{k: round(float(v), 3) for k, v in extras.items()},
    }


def run_scaling() -> None:
    """Two-parallelism evidence run -> BENCH/BASELINE.md.

    Uses a larger dedicated tile table (default 1024 tiles) and
    steady-state (warm, 2nd-run) timing so the fixed JVM/session startup
    — which a long-lived cluster amortizes — doesn't masquerade as poor
    scaling at sandbox data sizes.
    """
    results = {}
    scaling_tiles = os.environ.get("SPARK_GRAFT_SCALING_TILES", "1024")
    for cpus in (8, 32):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_SF_DIR=SF_DIR,
            SPARK_GRAFT_TILES=scaling_tiles,
            SPARK_GRAFT_BENCH_WARM="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)

    r8, r32 = results[8], results[32]
    eff = {}
    for key in ("tiles_per_sec", "pip_points_per_sec"):
        eff[key] = r32[key] / (4.0 * r8[key])
    qeff = {
        k: r8["queries"][k] / (4.0 * r32["queries"][k])
        for k in r8["queries"]
    }

    lines = [
        "# BENCH — measured baseline + scaling evidence",
        "",
        f"Input: `{SF_DIR}` (sf={r8['sf']}), synthetic image table: "
        f"{int(r8['n_tiles'])} tiles x 128x128 px, {int(r8['n_points'])} PIP points.",
        "Same deterministic input at both parallelism levels; outputs are",
        "bit-identical across partition counts (tests/test_engine_spark.py).",
        "",
        "| metric | local[8] (N) | local[32] (4N) | efficiency 4N/(4xN) |",
        "|---|---|---|---|",
        f"| TIN rasterization (tiles/sec) | {r8['tiles_per_sec']:.2f} | "
        f"{r32['tiles_per_sec']:.2f} | **{eff['tiles_per_sec']:.2f}** |",
        f"| PIP join (points/sec) | {r8['pip_points_per_sec']:.0f} | "
        f"{r32['pip_points_per_sec']:.0f} | **{eff['pip_points_per_sec']:.2f}** |",
        "",
        "Per-query wall seconds:",
        "",
        "| query | local[8] | local[32] | speedup-eff |",
        "|---|---|---|---|",
    ]
    for k in r8["queries"]:
        lines.append(
            f"| {k} | {r8['queries'][k]:.2f} | {r32['queries'][k]:.2f} | "
            f"{qeff[k]:.2f} |"
        )
    lines += [
        "",
        "North-rule criterion: scaling efficiency >= 0.8 from N to 4N.",
        "Sandbox note: evidenced with local[8] vs local[32] on one machine",
        "(per driver instructions); Spark job wall time includes fixed",
        "driver/planning overhead that penalizes the 4N run, so these",
        "numbers are a lower bound on cluster scaling.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r8),
        json.dumps(r32),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": eff, "local8": r8, "local32": r32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_once()))
