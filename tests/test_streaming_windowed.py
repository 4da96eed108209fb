"""Watermarked event-time windows: closed windows emit exactly once in
append mode; events later than the watermark are dropped."""

from datetime import datetime

from pdf2pdfocr_spark.streaming.windowed import windowed_page_throughput

EVENT_SCHEMA = "ts timestamp, doc_id string, offset int"


def _t(minute, second=0):
    return datetime(2024, 1, 1, 10, minute, second)


def test_windowed_throughput_with_late_data(spark, tmp_path):
    indir = str(tmp_path / "events")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain(rows):
        # one drain per file drop → deterministic watermark advancement
        # (files inside one availableNow run have no guaranteed order)
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(indir)
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(indir)
        q = (
            windowed_page_throughput(
                stream, window="5 minutes", watermark="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # drain 1: three on-time events in two 5-min windows → watermark 9:57,
    # nothing closes yet
    drain([
        (_t(0, 30), "doc-a", 0),
        (_t(4, 0), "doc-a", 1),
        (_t(7, 0), "doc-b", 0),
    ])
    # drain 2: event time 10:30 → watermark 10:20 closes (emits) both
    # earlier windows
    drain([(_t(30), "doc-c", 0)])
    # drain 3: a straggler at 10:01 — BEHIND the 10:20 watermark → dropped
    drain([(_t(1), "doc-z", 99)])

    got = {
        r["window_start"].minute: (r["n_pages"], r["n_docs_approx"])
        for r in spark.read.parquet(outdir).collect()
    }
    # [10:00,10:05): the 2 on-time doc-a pages; the 10:01 straggler dropped.
    assert got[0] == (2, 1)
    # [10:05,10:10): doc-b's page.
    assert got[5] == (1, 1)
    # [10:30,10:35) still open (watermark < window end) → withheld
    assert 30 not in got
