"""Checkpoint/resume contract + Structured Streaming parity with batch."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lasutility_spark.engine import checkpoint, streaming


def test_checkpoint_write_and_resume(spark, tmp_path):
    path = str(tmp_path / "stage1")
    df = spark.createDataFrame(
        pd.DataFrame({"cell_id": [1, 2, 3], "v": [10, 20, 30]})
    )
    m = checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})
    assert m["row_count"] == 3
    assert m["n_completed_keys"] == 3
    keys = checkpoint.completed_keys(spark, path)
    assert sorted(r["cell_id"] for r in keys.collect()) == [1, 2, 3]
    lin = checkpoint.lineage(spark, path)
    assert all(r["rows"] >= 1 for r in lin.collect())
    assert m["n_partitions"] == lin.count()
    assert os.path.exists(os.path.join(path, checkpoint.SUCCESS))
    # the _keys/_lineage side tables must NOT pollute the data read
    assert set(spark.read.parquet(path).columns) == {"cell_id", "v"}

    wanted = spark.createDataFrame(pd.DataFrame({"cell_id": [1, 2, 3, 4, 5]}))
    todo = checkpoint.pending_keys(spark, wanted, path, {"px": 64})
    assert sorted(r["cell_id"] for r in todo.collect()) == [4, 5]
    # parameter change invalidates the checkpoint
    todo_all = checkpoint.pending_keys(spark, wanted, path, {"px": 128})
    assert todo_all.count() == 5

    calls = []

    def compute(pending):
        keys = [r["cell_id"] for r in pending.collect()]
        calls.append(sorted(keys))
        return spark.createDataFrame(
            pd.DataFrame({"cell_id": keys, "v": [k * 10 for k in keys]})
        )

    out = checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 64}
    )
    assert calls == [[4, 5]]  # only missing tiles recomputed
    assert sorted(r["cell_id"] for r in out.collect()) == [1, 2, 3, 4, 5]
    # second resume: nothing pending, no recompute
    out2 = checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 64}
    )
    assert calls == [[4, 5]]
    assert out2.count() == 5


def test_checkpoint_resume_scales_without_driver_keys(spark, tmp_path):
    """10^6-key checkpoint resumes through a pure Spark anti-join plan —
    the manifest JSON stays O(1) and no key list crosses the driver."""
    path = str(tmp_path / "big_stage")
    n = 1_000_000
    df = spark.range(n).select(
        F.col("id").alias("cell_id"), (F.col("id") * 2).alias("v")
    )
    m = checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})
    assert m["n_completed_keys"] == n
    assert os.path.getsize(os.path.join(path, checkpoint.MANIFEST)) < 4096
    wanted = spark.range(n + 10).select(F.col("id").alias("cell_id"))
    todo = checkpoint.pending_keys(spark, wanted, path, {"px": 64})
    plan = todo._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan  # resume is a join, not a collected key list
    assert sorted(r["cell_id"] for r in todo.collect()) == list(range(n, n + 10))


def _stage_bytes(path):
    """Total size + file set of the stage's data files and _keys files."""
    total, names = 0, set()
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
            names.add(os.path.relpath(os.path.join(root, f), path))
    return total, names


def test_checkpoint_resume_is_o_new_work(spark, tmp_path):
    """Resuming a 1M-row stage with 1% pending keys appends ~1% of the
    bytes — the old data files are untouched, never rewritten."""
    path = str(tmp_path / "incr_stage")
    n = 1_000_000
    df = spark.range(n).select(
        F.col("id").alias("cell_id"), (F.col("id") * 2).alias("v")
    )
    checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})
    size0, files0 = _stage_bytes(path)

    wanted = spark.range(n + n // 100).select(F.col("id").alias("cell_id"))

    def compute(pending):
        return pending.select("cell_id", (F.col("cell_id") * 2).alias("v"))

    out = checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 64}
    )
    assert out.count() == n + n // 100
    size1, files1 = _stage_bytes(path)
    # every original data file survives byte-identical paths (no rewrite)
    kept = {f for f in files0 if not f.startswith("_") and "/" not in f}
    assert kept <= files1
    # appended bytes are a small fraction of the original table
    # (1% of rows; parquet per-file overhead allows some slack)
    assert size1 - size0 < 0.25 * size0
    # manifest gained an append snapshot and stayed O(1)
    m = checkpoint.load_manifest(path)
    assert len(m["snapshots"]) == 2
    assert m["snapshots"][1]["n_keys"] == n // 100
    assert m["row_count"] == n + n // 100
    assert m["n_completed_keys"] == n + n // 100
    assert os.path.getsize(os.path.join(path, checkpoint.MANIFEST)) < 8192
    # a further resume with the same wanted set is a no-op
    out2 = checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 64}
    )
    assert out2.count() == n + n // 100
    assert len(checkpoint.load_manifest(path)["snapshots"]) == 2


def test_resume_params_mismatch_rewrites_not_appends(spark, tmp_path):
    """Resume with different params must take the full rewrite path:
    no duplicate keys, no stale-params rows kept, manifest params_hash
    refreshed (round-3 ADVICE: the append path was taken instead)."""
    path = str(tmp_path / "params_stage")
    df = spark.createDataFrame(
        pd.DataFrame({"cell_id": [1, 2, 3], "v": [10, 20, 30]})
    )
    checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})
    wanted = spark.createDataFrame(pd.DataFrame({"cell_id": [1, 2, 3]}))

    def compute(pending):
        return pending.select(
            "cell_id", (F.col("cell_id") * 100).alias("v")
        )

    out = checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 128}
    )
    rows = {r["cell_id"]: r["v"] for r in out.collect()}
    assert rows == {1: 100, 2: 200, 3: 300}  # no stale px=64 rows
    assert out.count() == 3  # no duplicated keys
    m = checkpoint.load_manifest(path)
    assert m["params_hash"] == checkpoint._params_hash({"px": 128})
    assert m["row_count"] == 3 and m["n_completed_keys"] == 3
    # a same-params re-resume is now a no-op against the NEW table
    out2 = checkpoint.resume_stage(
        spark, wanted, path,
        lambda p: (_ for _ in ()).throw(AssertionError("recompute")),
        "tin", ["in.parquet"], {"px": 128},
    )
    assert out2.count() == 3


def test_resume_empty_delta_keeps_checkpoint_intact(spark, tmp_path):
    """compute(todo) returning zero rows is an empty-but-valid append:
    the SUCCESS marker is restored and nothing tears (round-3 ADVICE)."""
    path = str(tmp_path / "empty_stage")
    df = spark.createDataFrame(
        pd.DataFrame({"cell_id": [1, 2], "v": [10, 20]})
    )
    checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})
    wanted = spark.createDataFrame(pd.DataFrame({"cell_id": [1, 2, 3]}))

    def compute(pending):
        # every pending key filtered out upstream -> zero-row delta
        return pending.select(
            "cell_id", (F.col("cell_id") * 2).alias("v")
        ).filter(F.lit(False))

    out = checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 64}
    )
    assert sorted(r["cell_id"] for r in out.collect()) == [1, 2]
    assert os.path.exists(os.path.join(path, checkpoint.SUCCESS))
    # checkpoint still valid: a further resume sees only key 3 pending
    todo = checkpoint.pending_keys(spark, wanted, path, {"px": 64})
    assert sorted(r["cell_id"] for r in todo.collect()) == [3]


def test_resume_side_table_compaction_bounds_files(spark, tmp_path):
    """Many sequential 1-key resumes keep the _keys/ file fan-out bounded
    (side tables are compacted every ``compact_after`` snapshots; data
    files are never rewritten) and resume semantics stay identical."""
    path = str(tmp_path / "compact_stage")
    df = spark.createDataFrame(pd.DataFrame({"cell_id": [0], "v": [0]}))
    checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})

    def compute(pending):
        return pending.select("cell_id", (F.col("cell_id") * 2).alias("v"))

    n_resumes = 12
    for k in range(1, n_resumes + 1):
        wanted = spark.createDataFrame(
            pd.DataFrame({"cell_id": list(range(k + 1))})
        )
        checkpoint.resume_stage(
            spark, wanted, path, compute, "tin", ["in.parquet"],
            {"px": 64}, compact_after=5,
        )
    keys_files = [
        f for f in os.listdir(os.path.join(path, checkpoint.KEYS_DIR))
        if f.endswith(".parquet")
    ]
    # without compaction this would be >= 13 delta files (1 + 12 appends)
    assert len(keys_files) <= 8
    keys = checkpoint.completed_keys(spark, path)
    assert sorted(r["cell_id"] for r in keys.collect()) == list(
        range(n_resumes + 1)
    )
    out = spark.read.parquet(path)
    assert {r["cell_id"]: r["v"] for r in out.collect()} == {
        k: k * 2 if k else 0 for k in range(n_resumes + 1)
    }
    m = checkpoint.load_manifest(path)
    assert m["n_completed_keys"] == n_resumes + 1
    assert any(s.get("compacted_side_tables") for s in m["snapshots"])


def test_torn_checkpoint_is_flagged(spark, tmp_path, caplog):
    """A checkpoint missing its _SUCCESS_STAGE marker (torn write) is
    recomputed AND logged as invalidated — never a silent discard."""
    import logging

    path = str(tmp_path / "torn_stage")
    df = spark.createDataFrame(pd.DataFrame({"cell_id": [1, 2], "v": [1, 2]}))
    checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})
    os.remove(os.path.join(path, checkpoint.SUCCESS))  # simulate the crash
    wanted = spark.createDataFrame(pd.DataFrame({"cell_id": [1, 2, 3]}))
    with caplog.at_level(logging.WARNING, logger="lasutility_spark.engine.checkpoint"):
        todo = checkpoint.pending_keys(spark, wanted, path, {"px": 64})
    assert todo.count() == 3  # everything recomputed (correct)
    assert any("checkpoint invalidated" in r.message for r in caplog.records)


def test_streaming_matches_batch(spark, tmp_path):
    # the file stream source requires a directory; stage the single
    # parquet file into one
    import shutil

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet",
        os.path.join(events_dir, "part-0.parquet"),
    )
    stream = streaming.events_hourly_stream(spark, events_dir)
    rows = streaming.run_stream_once(stream, str(tmp_path / "ckpt"))
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_x1000"])
        for r in rows
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("s"),
        )
        .collect()
    )
    want = {(r["hour"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == want  # stream (availableNow) == batch, exactly


def test_tiles_stream_matches_batch(spark, tmp_path):
    """Streaming tile ingest == batch rasterization row-for-row (the
    foreachBatch sink reuses the batch kernel), and the stream
    checkpoint makes a second drain a no-op (exactly-once)."""
    from lasutility_spark import datagen
    from lasutility_spark.engine import streaming, tin_stage

    import shutil

    images_dir = datagen.ensure_images_table(0.001)
    src = str(tmp_path / "images_in")  # file source requires a directory
    os.makedirs(src)
    shutil.copy(
        os.path.join(images_dir, "images.parquet"),
        os.path.join(src, "part-0.parquet"),
    )
    out = str(tmp_path / "tiles_out")
    ckpt = str(tmp_path / "tiles_ckpt")
    q = streaming.tiles_stream(spark, src, out, ckpt, px=32)
    q.awaitTermination()
    got = {
        (r["cell_id"], r["phash"], r["n_points"], r["filled_cells"])
        for r in spark.read.parquet(out).collect()
    }
    batch = tin_stage.rasterize_images_fused(
        spark.read.parquet(f"{images_dir}/images.parquet"), px=32
    )
    want = {
        (r["cell_id"], r["phash"], r["n_points"], r["filled_cells"])
        for r in batch.collect()
    }
    assert got == want and len(got) == 9
    # restart with the same checkpoint: no new source files -> no new rows
    q2 = streaming.tiles_stream(spark, src, out, ckpt, px=32)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == 9


def test_sessions_stream_matches_batch(spark, tmp_path):
    """Stateful streaming sessionization (session_window + watermark,
    availableNow) == the same session_window aggregation run as batch."""
    import shutil

    from pyspark.sql import functions as F
    from lasutility_spark.engine import streaming

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet",
        os.path.join(events_dir, "part-0.parquet"),
    )
    stream = streaming.events_sessions_stream(spark, events_dir)
    rows = streaming.run_stream_once(stream, str(tmp_path / "sess_ckpt"))
    got = {
        (r["user_id"], r["session_start"], r["session_end"]):
        (r["n_events"], r["sum_value_x1000"])
        for r in rows
    }
    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("s"),
        )
        .collect()
    )
    want = {
        (r["user_id"], r["win"]["start"], r["win"]["end"]): (r["n"], r["s"])
        for r in batch
    }
    assert got == want and len(got) > 15


def test_stateful_user_totals_stream(spark, tmp_path):
    """applyInPandasWithState running totals: after draining the source,
    each user's LAST emitted row equals the batch aggregate (state
    persisted across micro-batches)."""
    import shutil

    from pyspark.sql import functions as F
    from lasutility_spark.engine import streaming

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    # several source files => several micro-batches (maxFilesPerTrigger=2)
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.repartition(6).write.parquet(events_dir, mode="overwrite")

    stream = streaming.user_totals_stream(spark, events_dir)
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path / "ut_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM user_totals").collect()
    # update mode appends one row per (user, micro-batch); the running
    # totals are monotone, so the max per user is the final state
    got = {}
    for r in rows:
        cur = got.get(r["user_id"], (0, 0))
        got[r["user_id"]] = max(cur, (r["n_events"], r["sum_value_x1000"]))
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("s"),
        )
        .collect()
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch}
    assert got == want


def test_media_stream_matches_batch(spark, tmp_path):
    """Streaming audio ingest == batch m4 stats row-for-row (foreachBatch
    reuses the batch WAV-decode kernel); second drain with the same
    checkpoint is a no-op (exactly-once)."""
    import shutil

    from lasutility_spark import datagen
    from lasutility_spark.engine import streaming
    from lasutility_spark.pipelines import multimodal

    images_dir = datagen.ensure_images_table(0.001)
    src = str(tmp_path / "audio_in")
    os.makedirs(src)
    shutil.copy(
        os.path.join(images_dir, "audio.parquet"),
        os.path.join(src, "part-0.parquet"),
    )
    out = str(tmp_path / "stats_out")
    ckpt = str(tmp_path / "stats_ckpt")
    q = streaming.media_stream(spark, src, out, ckpt)
    q.awaitTermination()
    batch = multimodal.audio_decode_stats(
        spark.read.parquet(f"{images_dir}/audio.parquet")
    )
    cols = batch.columns  # sink adds a batch_id partition column on top
    got = {tuple(r) for r in spark.read.parquet(out).select(*cols).collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) == 9
    q2 = streaming.media_stream(spark, src, out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == 9


def test_idempotent_sink_crash_replay(spark, tmp_path):
    """Crash-replay semantics of the foreachBatch sink: foreachBatch
    replays a micro-batch with the SAME batch_id if the process dies
    after the data write but before the offsets commit.  The
    batch_id-keyed dynamic-overwrite sink must absorb the replay
    (no duplicate rows) while still appending genuinely new batches."""
    from lasutility_spark.engine import streaming

    out = str(tmp_path / "sink_out")
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    streaming.write_batch_idempotent(df0, out, batch_id=0)
    assert spark.read.parquet(out).count() == 2
    # simulated crash-replay: same batch re-delivered with batch_id=0
    streaming.write_batch_idempotent(df0, out, batch_id=0)
    assert spark.read.parquet(out).count() == 2  # overwrote, not appended
    # a new batch still lands additively
    df1 = spark.createDataFrame([(3, "c")], "k int, v string")
    streaming.write_batch_idempotent(df1, out, batch_id=1)
    got = {(r["k"], r["v"], r["batch_id"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a", 0), (2, "b", 0), (3, "c", 1)}


def test_compaction_crash_window_recovers(spark, tmp_path):
    """Crash injected in _compact_side_table's rewrite window (after
    ``rmtree(_keys)``, before ``rename(_keys.next, _keys)``): the marker
    is already removed, so the checkpoint is torn — detected on the next
    resume, fully recomputed, and healthy afterwards.  Recovery cost is
    O(stage), never silent wrongness (VERDICT r04 #8)."""
    import shutil

    path = str(tmp_path / "crash_stage")
    df = spark.createDataFrame(pd.DataFrame({"cell_id": [0, 1], "v": [0, 2]}))
    checkpoint.write_stage(df, path, "tin", ["in.parquet"], {"px": 64})

    def compute(pending):
        return pending.select("cell_id", (F.col("cell_id") * 2).alias("v"))

    wanted = spark.createDataFrame(pd.DataFrame({"cell_id": [0, 1, 2, 3]}))
    checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 64}
    )

    # fabricate the exact mid-compaction crash state: marker removed
    # (mutation window), _keys rewritten to _keys.next, _keys deleted,
    # rename never happened
    keys_dir = os.path.join(path, checkpoint.KEYS_DIR)
    os.remove(os.path.join(path, checkpoint.SUCCESS))
    shutil.copytree(keys_dir, keys_dir + ".next")
    shutil.rmtree(keys_dir)

    # torn: the manifest loader refuses it, pending = ALL keys
    assert checkpoint.load_manifest(path) is None
    todo = checkpoint.pending_keys(spark, wanted, path, {"px": 64})
    assert todo.count() == 4

    # next resume recomputes the full stage and leaves a healthy
    # checkpoint: marker back, side tables readable, values correct
    out = checkpoint.resume_stage(
        spark, wanted, path, compute, "tin", ["in.parquet"], {"px": 64}
    )
    assert {r["cell_id"]: r["v"] for r in out.collect()} == {
        0: 0, 1: 2, 2: 4, 3: 6
    }
    assert os.path.exists(os.path.join(path, checkpoint.SUCCESS))
    keys = checkpoint.completed_keys(spark, path)
    assert sorted(r["cell_id"] for r in keys.collect()) == [0, 1, 2, 3]
    assert not os.path.exists(keys_dir + ".next")  # wreckage swept
    m = checkpoint.load_manifest(path)
    assert m is not None and m["n_completed_keys"] == 4
