"""SparkSession factory with the engine's physical-design defaults.

Tuned for the sandbox (local[N], single JVM) but every setting is the
one you'd ship to a 1000-executor cluster: AQE on (runtime re-plan +
skew-join splitting), Arrow transport for the pandas kernels, shuffle
partition count sized to cores, small-dim broadcast threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | None = None,
    app: str = "lasutility_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        # throughput GC: the default G1 burns whole cores compacting the
        # humongous byte[]s of image tiles (measured: q1 1428 -> 2182
        # tiles/s at local[32] from this flag alone); on a cluster this
        # goes in spark.executor.extraJavaOptions
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:+UseParallelGC -XX:ParallelGCThreads={min(cpus, 8)}",
        )
        .config("spark.ui.enabled", "false")
    )
    # shuffle spill dir on the fastest local medium available — RAM-backed
    # tmpfs here, node-local NVMe on a real cluster (same knob). Gated on
    # capacity: containers commonly cap /dev/shm at 64 MB, where any real
    # spill dies with ENOSPC, and spilling to tmpfs defeats
    # spill-under-memory-pressure — require headroom or opt out entirely
    # with LSU_NO_SHM_SPILL=1.
    if (
        os.environ.get("LSU_NO_SHM_SPILL") != "1"
        and os.path.isdir("/dev/shm")
        and os.access("/dev/shm", os.W_OK)
    ):
        try:
            sv = os.statvfs("/dev/shm")
            avail = sv.f_bavail * sv.f_frsize
        except OSError:
            avail = 0
        if avail >= 8 * 1024**3:
            builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    return builder.getOrCreate()
