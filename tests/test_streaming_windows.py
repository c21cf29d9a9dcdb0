"""Streaming windows: watermark drop, streaming dedup, custom stateful op."""

import os
import tempfile

import pyspark.sql.functions as F

from akka_graph_db_spark.streaming import windows as sw


def _stream_from_rows(spark, rows, tmp):
    from datetime import datetime

    rows = [
        (r[0], datetime.fromisoformat(r[1]), *r[2:]) for r in rows
    ]
    log_dir = os.path.join(tmp, "in")
    spark.createDataFrame(rows, sw.EVENTS_SCHEMA).coalesce(1).write.json(
        log_dir
    )
    return spark.readStream.schema(sw.EVENTS_SCHEMA).json(log_dir)


ROWS = [
    (1, "2024-01-01 00:05:00", 1, "click", 1.0, None),
    (2, "2024-01-01 00:20:00", 1, "click", 2.0, None),
    (3, "2024-01-01 01:10:00", 2, "click", 3.0, None),
    (2, "2024-01-01 00:20:00", 1, "click", 2.0, None),  # duplicate event_id
]


def test_streaming_tumbling_with_watermark(spark):
    tmp = tempfile.mkdtemp(prefix="sws_")
    stream = _stream_from_rows(spark, ROWS, tmp)
    agg = sw.tumbling_counts_stream(stream, "1 hour", "10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbled")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        str(r["window_start"]): r["n_events"]
        for r in spark.table("tumbled").collect()
    }
    # hour-0 window closed by the watermark passing 01:10 -> emitted
    assert rows.get("2024-01-01 00:00:00") == 3


def test_streaming_dedup(spark):
    tmp = tempfile.mkdtemp(prefix="swd_")
    stream = _stream_from_rows(spark, ROWS, tmp)
    q = (
        sw.dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("deduped").select("event_id").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2, 3]


def test_stateful_running_totals(spark):
    tmp = tempfile.mkdtemp(prefix="swt_")
    stream = _stream_from_rows(spark, ROWS, tmp)
    out = sw.running_user_totals(stream)
    sw.run_to_memory_sink(out, "running", os.path.join(tmp, "ck"))
    rows = {r["user_id"]: r for r in spark.table("running").collect()}
    assert rows[1]["lifetime_events"] == 3  # dup NOT removed here: raw count
    assert rows[1]["lifetime_value"] == 5.0
    assert rows[2]["lifetime_events"] == 1
