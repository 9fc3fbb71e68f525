"""Stateful streaming (applyInPandasWithState) and the end-to-end
ingest job (reference main() equivalent) under bounded file-source
replays."""

import json
import os

from pyspark.sql import functions as F

from api_kakfa_spark_airflow_s3_athena_spark.sources.tables import load_table
from api_kakfa_spark_airflow_s3_athena_spark.streaming.job import build_job, resolve_config
from api_kakfa_spark_airflow_s3_athena_spark.streaming.stateful import running_user_stats


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
