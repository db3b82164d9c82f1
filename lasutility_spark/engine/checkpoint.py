"""Checkpoint-resumable stage tables with per-partition lineage + metrics.

The reference checkpoints a whole VoxelGrid as one MessagePack blob with
an atomic .tmp rename (S11, VoxelGrid/VoxelGrid.cs:347-366).  The engine
equivalent (north rule): each stage writes its output as a Parquet table
plus two Parquet SIDE TABLES and a small JSON manifest:

- ``_keys/``     completed key set (one row per cell id) — written and
  consumed entirely by Spark jobs; at the 100 TB / ~10^9-tile target the
  key set alone is GBs, so it must never materialize on the driver
  (neither as a collect() nor as a JSON array),
- ``_lineage/``  per-partition row counts and key ranges (the A8-style
  before/after metrics roll up here),
- ``_manifest.json``  lineage header only: stage name, input paths,
  parameter hash, aggregate counts — O(1) regardless of scale,
- a _SUCCESS marker written last (atomic completion point).

Resume = Spark anti-join of the wanted keys against ``_keys/`` — only
missing tiles are recomputed, no driver-side key materialization.  On a
real cluster the same layout maps 1:1 onto an Iceberg table + snapshot
metadata; plain Parquet-plus-manifest keeps the sandbox dependency-free.
(Subdirectories starting with ``_`` are ignored by Spark's parquet scan
of the stage path, so the side tables never pollute the data read.)
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
KEYS_DIR = "_keys"
LINEAGE_DIR = "_lineage"


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
    """Write a stage table + side tables + manifest; returns the manifest."""
    params = params or {}
    df.write.mode("overwrite").parquet(path)

    spark = df.sparkSession
    out = spark.read.parquet(path)
    lineage = out.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.count("*").alias("rows"),
        F.min(key).alias("min_key"),
        F.max(key).alias("max_key"),
    )
    lineage.write.mode("overwrite").parquet(os.path.join(path, LINEAGE_DIR))
    out.select(key).distinct().write.mode("overwrite").parquet(
        os.path.join(path, KEYS_DIR)
    )
    manifest = {
        "stage": stage,
        "inputs": inputs,
        "params": params,
        "params_hash": _params_hash(params),
        "written_at": time.time(),
        "row_count": int(out.count()),
        "n_completed_keys": int(
            spark.read.parquet(os.path.join(path, KEYS_DIR)).count()
        ),
        "n_partitions": int(
            spark.read.parquet(os.path.join(path, LINEAGE_DIR)).count()
        ),
        "keys_table": KEYS_DIR,
        "lineage_table": LINEAGE_DIR,
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f)
    open(os.path.join(path, SUCCESS), "w").close()  # atomic completion (S11)
    return manifest


def load_manifest(path: str) -> dict | None:
    if not os.path.exists(os.path.join(path, SUCCESS)):
        return None
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def completed_keys(spark: SparkSession, path: str) -> DataFrame:
    """The checkpoint's completed key set as a DataFrame (never collected)."""
    return spark.read.parquet(os.path.join(path, KEYS_DIR))


def lineage(spark: SparkSession, path: str) -> DataFrame:
    """Per-partition lineage metrics (pid, rows, min_key, max_key)."""
    return spark.read.parquet(os.path.join(path, LINEAGE_DIR))


def pending_keys(
    spark: SparkSession, wanted: DataFrame, path: str, params: dict | None = None,
    key: str = "cell_id",
) -> DataFrame:
    """Resume support: which of ``wanted``'s keys still need computing?

    Anti-join against the ``_keys/`` side table — a pure Spark plan, so
    a 10^9-key checkpoint resumes without the key set ever touching the
    driver.  A parameter-hash mismatch invalidates the checkpoint
    entirely (recompute all).
    """
    m = load_manifest(path)
    if m is None or (params is not None and m["params_hash"] != _params_hash(params)):
        return wanted
    return wanted.join(completed_keys(spark, path), key, "left_anti")


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
