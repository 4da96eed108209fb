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
