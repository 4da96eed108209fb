"""Micro-batch streaming ingest for the extraction pipeline.

``readStream`` over a documents directory → ``foreachBatch`` → the same
batch pipeline + checkpointed lineage write. The lineage resume filter makes
the sink idempotent (re-delivered micro-batches skip already-done docs), so
end-to-end semantics are exactly-once at document granularity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pdf2pdfocr_spark.jobs import run_extraction_job
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.schema import DOCUMENTS_META_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_path: str,
    run_prefix: str = "stream",
    config: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Start (and with ``trigger_once`` drain synchronously) a streaming
    extraction over parquet files landing in ``input_dir``."""
    config = config or PipelineConfig()
    stream = (
        spark.readStream.schema(DOCUMENTS_META_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(input_dir)
    )

    def handle_batch(batch_df, epoch_id: int) -> None:
        run_extraction_job(
            spark, batch_df, out_path, run_id=f"{run_prefix}-{epoch_id:06d}",
            config=config,
        )

    writer = stream.writeStream.foreachBatch(handle_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if trigger_once:
        query.awaitTermination()
    return query
