"""Stateful streaming reassembly: documents whose pages arrive across
micro-batches emit exactly once, complete, in page order."""

from pdf2pdfocr_spark.schema import PagePayload  # noqa: F401 (package ship)
from pdf2pdfocr_spark.streaming.stateful import (
    PAGE_EVENT_SCHEMA,
    streaming_reassemble,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, PAGE_EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_reassemble_across_batches(spark, tmp_path):
    indir = str(tmp_path / "pages")
    # doc-a has 3 pages split across two file drops, arriving out of order;
    # doc-b completes in the first drop; doc-c never completes
    _write_batch(spark, indir, [
        ("doc-a", 2, 3, "third\n"),
        ("doc-a", 0, 3, "first\n"),
        ("doc-b", 0, 1, "only\n"),
        ("doc-c", 0, 2, "half\n"),
    ])
    _write_batch(spark, indir, [
        ("doc-a", 1, 3, "second\n"),
        ("doc-a", 1, 3, "second\n"),  # duplicate re-delivery, must be ignored
    ])

    stream = (
        spark.readStream.schema(PAGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")  # force multi-batch processing
        .parquet(indir)
    )
    q = (
        streaming_reassemble(stream)
        .writeStream.format("memory")
        .queryName("reassembled")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM reassembled").collect()}
    assert set(got) == {"doc-a", "doc-b"}  # doc-c incomplete → not emitted
    assert got["doc-a"]["doc_text"] == "first\nsecond\nthird\n"
    assert got["doc-a"]["n_pages"] == 3
    assert got["doc-b"]["doc_text"] == "only\n"
    assert all(r["status"] == "complete" for r in got.values())


def test_streaming_state_timeout_evicts_partial_doc(spark, tmp_path):
    """Round-3 verdict #4: a document whose remaining pages never arrive
    must not hold state forever (the slow OOM at stream scale). With
    state_timeout_ms set, the incomplete doc is evicted on processing-time
    timeout and emits as status='timeout_partial' (the streaming mirror of
    the batch timeout→quarantine, reference doc abort + batch-continues,
    pdf2pdfocr.py:1511-1533), while in-flight and completing docs are
    untouched."""
    import time

    indir = str(tmp_path / "pages")
    # drop 1 BEFORE the query starts (the file source needs the dir):
    # doc-x gets 1 of its 2 pages (stalls); doc-y completes
    _write_batch(spark, indir, [
        ("doc-x", 1, 2, "late-half\n"),
        ("doc-y", 0, 1, "whole\n"),
    ])

    # one long-lived query (ProcessingTimeTimeout + availableNow never
    # terminates, and the memory sink can't recover a checkpoint across
    # restarts — so this mirrors a real continuously-running stream)
    q = (
        streaming_reassemble(
            spark.readStream.schema(PAGE_EVENT_SCHEMA).parquet(indir),
            state_timeout_ms=500,
        )
        .writeStream.format("memory")
        .queryName("evicted")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )

    def rows_by_doc(deadline_s=90, want=None):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            rows = spark.sql("SELECT * FROM evicted").collect()
            got = {r["doc_id"]: r for r in rows}
            if want is None or want <= set(got):
                return got, rows
            time.sleep(0.2)
        raise AssertionError(f"deadline: only saw {set(got)}, wanted {want}")

    try:
        got, _ = rows_by_doc(want={"doc-y"})
        # idle past the inactivity budget, then fresh data for a DIFFERENT
        # doc arrives — the next micro-batch must evict doc-x as partial
        time.sleep(1.2)
        _write_batch(spark, indir, [("doc-z", 0, 1, "fresh\n")])
        got, _ = rows_by_doc(want={"doc-x", "doc-y", "doc-z"})
        assert got["doc-x"]["status"] == "timeout_partial"
        assert got["doc-x"]["doc_text"] == "late-half\n"
        assert got["doc-x"]["n_pages"] == 1  # pages actually collected
        assert got["doc-z"]["status"] == "complete"

        # state is DROPPED, not re-armed: after another doc flows through,
        # doc-x has not been re-emitted
        _write_batch(spark, indir, [("doc-w", 0, 1, "w\n")])
        got, rows = rows_by_doc(want={"doc-w"})
        assert len(rows) == 4  # y, z, w, and exactly ONE doc-x eviction
    finally:
        q.stop()
