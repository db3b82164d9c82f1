"""Checkpoint-resumable stage tables with per-partition lineage + metrics.

The reference checkpoints a whole VoxelGrid as one MessagePack blob with
an atomic .tmp rename (S11, VoxelGrid/VoxelGrid.cs:347-366).  The engine
equivalent (north rule): each stage writes its output as a Parquet table
partitioned by a bucket of the cell id, plus a JSON manifest recording

- lineage: stage name, input paths, parameter hash,
- per-partition row counts and cell-id ranges (the A8-style
  before/after metrics roll up here),
- a _SUCCESS marker written last (atomic completion point).

Resume = anti-join the pending cell ids against the manifest's completed
set — only missing tiles are recomputed.  On a real cluster the same
layout maps 1:1 onto an Iceberg table + snapshot metadata; plain
Parquet-plus-manifest keeps the sandbox dependency-free.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"
SUCCESS = "_SUCCESS_STAGE"


def _params_hash(params: dict) -> str:
    return hashlib.sha256(
        json.dumps(params, sort_keys=True).encode()
    ).hexdigest()[:16]


def write_stage(
    df: DataFrame,
    path: str,
    stage: str,
    inputs: list[str],
    params: dict | None = None,
    key: str = "cell_id",
) -> dict:
    """Write a stage table + manifest; returns the manifest dict."""
    params = params or {}
    tmp_marker = os.path.join(path, SUCCESS)
    df.write.mode("overwrite").parquet(path)

    spark = df.sparkSession
    out = spark.read.parquet(path)
    per_part = (
        out.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count("*").alias("rows"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
        )
        .collect()
    )
    keys = [r[key] for r in out.select(key).distinct().collect()]
    manifest = {
        "stage": stage,
        "inputs": inputs,
        "params": params,
        "params_hash": _params_hash(params),
        "written_at": time.time(),
        "row_count": int(out.count()),
        "completed_keys": sorted(int(k) for k in keys),
        "partitions": [
            {
                "pid": int(r["pid"]),
                "rows": int(r["rows"]),
                "min_key": int(r["min_key"]),
                "max_key": int(r["max_key"]),
            }
            for r in per_part
        ],
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f)
    open(tmp_marker, "w").close()  # atomic completion point (S11 analog)
    return manifest


def load_manifest(path: str) -> dict | None:
    if not os.path.exists(os.path.join(path, SUCCESS)):
        return None
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def pending_keys(
    spark: SparkSession, wanted: DataFrame, path: str, params: dict | None = None,
    key: str = "cell_id",
) -> DataFrame:
    """Resume support: which of ``wanted``'s keys still need computing?

    Anti-join against the manifest's completed set; a parameter-hash
    mismatch invalidates the checkpoint entirely (recompute all).
    """
    m = load_manifest(path)
    if m is None or (params is not None and m["params_hash"] != _params_hash(params)):
        return wanted
    done = spark.createDataFrame(
        [(int(k),) for k in m["completed_keys"]], f"{key} long"
    )
    return wanted.join(done, key, "left_anti")


def resume_stage(
    spark: SparkSession,
    wanted: DataFrame,
    path: str,
    compute,
    stage: str,
    inputs: list[str],
    params: dict | None = None,
    key: str = "cell_id",
) -> DataFrame:
    """Compute-or-reuse: run ``compute(pending)`` only for missing keys,
    union with the checkpointed rows, rewrite the stage table."""
    todo = pending_keys(spark, wanted, path, params, key)
    m = load_manifest(path)
    if m is not None and todo.isEmpty():
        return spark.read.parquet(path)
    fresh = compute(todo)
    if m is not None:
        old = spark.read.parquet(path)
        fresh = old.unionByName(fresh)
    write_stage(fresh, path + ".next", stage, inputs, params, key)
    # atomic swap: rename .next over the old path
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(path + ".next", path)
    return spark.read.parquet(path)
