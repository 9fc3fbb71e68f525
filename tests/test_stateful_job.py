"""Stateful streaming (applyInPandasWithState) and the end-to-end
ingest job (reference main() equivalent) under bounded file-source
replays."""

import json
import os

from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table
from api_kakfa_spark_airflow_s3_athena_spark.streaming.job import build_job, resolve_config
from api_kakfa_spark_airflow_s3_athena_spark.streaming.stateful import (
    running_user_stats,
    sessionize_with_state,
)


def test_sessionize_with_state_timeout_closes_idle_session(spark, tmp_path):
    """Three files fed one per micro-batch (maxFilesPerTrigger=1):
    user 1's burst in file A must be closed by the EVENT-TIME TIMEOUT
    once later files advance the watermark past burst_end + gap —
    not by an in-batch gap (user 1 never appears again). Bounds,
    count, and exact-cents sum are all asserted."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        path = str(tmp_path / "src" / name)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        # pin mtime on the part files: the file source orders by it
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))
        return path

    src_root = str(tmp_path / "src")
    # file A: user 1 burst (3 events, 1 min apart), user 2 heartbeat
    write_file(
        "a",
        [
            (1, t0, 10.25),
            (1, t0 + dt.timedelta(minutes=1), 0.50),
            (1, t0 + dt.timedelta(minutes=2), 1.75),
            (2, t0, 1.0),
        ],
        1_000,
    )
    # file B: user 2 an hour later — advances max event time to t0+60m
    write_file("b", [(2, t0 + dt.timedelta(minutes=60), 1.0)], 2_000)
    # file C: user 2 later still — watermark after B's batch is
    # t0+60m-1m = t0+59m > (t0+2m)+30m, so user 1's timeout fires here
    write_file("c", [(2, t0 + dt.timedelta(minutes=120), 1.0)], 3_000)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_root + "/*")
    )
    emitted = []  # (epoch, row)
    def sink(batch_df, epoch_id):
        emitted.extend((epoch_id, r) for r in batch_df.collect())

    q = (
        sessionize_with_state(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    user1 = [(e, r) for e, r in emitted if r.user_id == 1]
    assert len(user1) == 1
    epoch, sess = user1[0]
    assert epoch >= 2  # closed by timeout after a later batch, not in batch 0
    assert sess.session_start == t0
    assert sess.session_end == t0 + dt.timedelta(minutes=2)
    assert sess.n_events == 3
    assert sess.sum_value == 12.50  # exact cents: 1025 + 50 + 175
    # user 2's 30-min-gapped singletons: the first two close on arrival
    # of the next event, the last closes by timeout or stays open
    user2_ends = {r.session_end for e, r in emitted if r.user_id == 2}
    assert t0 in user2_ends and t0 + dt.timedelta(minutes=60) in user2_ends


def test_running_user_stats_accumulates_across_batches(spark, sf_dir, tmp_path):
    """Feed the events table through the stateful operator in TWO
    bounded runs; state must carry over the checkpoint so the second
    run's totals equal the batch ground truth of both halves."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    half1.write.mode("overwrite").parquet(src)

    def run_once():
        # foreachBatch sink: supports checkpoint recovery (memory sink
        # doesn't) and update-mode output to files
        def sink(batch_df, epoch_id):
            batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            running_user_stats(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # latest emitted counters per user
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.col("epoch").desc())
        latest = (
            spark.read.parquet(out)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        return {r.user_id: r for r in latest.collect()}

    got1 = run_once()
    truth1 = {
        r.user_id: r
        for r in half1.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tot"))
        .collect()
    }
    for uid, row in truth1.items():
        assert got1[uid].n_events == row.n
        assert abs(got1[uid].total_value - row.tot) < 1e-6

    # append the second half as new files; state must RESUME, not reset
    half2.write.mode("append").parquet(src)
    got2 = run_once()
    truth_all = {
        r.user_id: r
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tot"))
        .collect()
    }
    for uid, row in truth_all.items():
        assert got2[uid].n_events == row.n, f"user {uid} lost state across restart"
        assert abs(got2[uid].total_value - row.tot) < 1e-5


def test_ingest_job_files_mode_end_to_end(spark, tmp_path):
    """The full job wiring (resolve_config -> build_job) in files mode:
    ndjson in, date-partitioned parquet out, bounded."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "batch0.json"), "w") as f:
        for i in range(25):
            f.write(
                json.dumps(
                    {
                        "name": f"Mr. U {i}",
                        "gender": "male",
                        "address": f"{i}, X St",
                        "city": "Berlin",
                        "nation": "Germany",
                        "zip": str(i),
                        "latitude": 52.5,
                        "longitude": 13.4,
                        "email": f"u{i}@example.com",
                    }
                )
                + "\n"
            )

    cfg = resolve_config(
        {
            "SOURCE_MODE": "files",
            "SOURCE_PATH": src,
            "SINK_PATH": str(tmp_path / "out"),
            "CHECKPOINT_PATH": str(tmp_path / "ckpt"),
            "BOUNDED": "1",
        }
    )
    q = build_job(spark, cfg)
    q.awaitTermination()

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 25
    assert "ingest_date" in out.columns
    assert any(d.startswith("ingest_date=") for d in os.listdir(str(tmp_path / "out")))


def test_resolve_config_requires_sink(monkeypatch):
    import pytest

    with pytest.raises(RuntimeError, match="S3_BUCKET"):
        resolve_config({})
    cfg = resolve_config({"S3_BUCKET": "b"})
    assert cfg["sink_path"] == "s3a://b/names"
    assert cfg["checkpoint_path"] == "s3a://b/checkpoints/names"


def test_quality_dedup_sessionize_chain_restores_exactly_once(spark, tmp_path):
    """Composed funnel (quality gate -> dropDuplicatesWithinWatermark ->
    applyInPandasWithState sessionize) over an at-least-once source:
    every file is delivered twice, one event fails the quality gate.
    The emitted session must count each surviving event ONCE — the
    exactly-once restore happens before any stateful aggregate. Also
    exercises chaining two stateful operators under a single watermark
    (sessionize_with_state(watermark_delay=None))."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1 burst: three good events + one junk (gate drops it)
        (101, 1, t0, 10.25),
        (102, 1, t0 + dt.timedelta(minutes=1), 0.50),
        (103, 1, t0 + dt.timedelta(minutes=2), 20.00),
        (104, 1, t0 + dt.timedelta(minutes=1, seconds=30), 999.0),
        # sentinel user drives the watermark far past user 1's timeout
        (201, 9, t0 + dt.timedelta(minutes=120), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    src = str(tmp_path / "src")
    df.write.mode("append").parquet(src)
    df.write.mode("append").parquet(src)  # redelivery: every event twice
    assert spark.read.parquet(src).count() == 2 * len(rows)

    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, value double"
    ).parquet(src)
    gated = stream.filter(F.col("value") <= F.lit(400.0))
    deduped = gated.withWatermark("ts", "1 minute").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sessions = sessionize_with_state(deduped, gap_seconds=1800, watermark_delay=None)

    emitted = []

    def sink(batch_df, _epoch):
        emitted.extend(batch_df.collect())

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    by_user = {r.user_id: r for r in emitted}
    # sentinel's session is still open (never emitted); user 1 closed by timeout
    assert set(by_user) == {1}
    sess = by_user[1]
    assert sess.n_events == 3  # 6 delivered, 3 distinct survivors of the gate
    assert sess.session_start == t0
    assert sess.session_end == t0 + dt.timedelta(minutes=2)
    assert sess.sum_value == 30.75  # exact cents: 10.25 + 0.50 + 20.00
