"""Event-time windowed throughput metrics with late-data handling.

The streaming analog of the reference's polling progress counters
(pdf2pdfocr.py:985-991) for a pipeline fed by a page-event queue: tumbling
event-time windows of page counts per stage, with a watermark bounding both
state and how late a straggler page may arrive. Append mode emits a window
exactly once, when the watermark passes its end — late events beyond the
watermark are dropped (they were already counted as lost by the timeout/
quarantine path upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_page_throughput(
    pages: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """page-event stream (ts, doc_id, offset, ...) → one row per closed
    tumbling window: (window_start, window_end, n_pages, n_docs_approx).

    ``n_docs_approx`` uses approx_count_distinct — exact distinct is not
    incrementally computable in append mode, and at 10^12 docs an HLL sketch
    is the right answer anyway."""
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.approx_count_distinct("doc_id").alias("n_docs_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_pages",
            "n_docs_approx",
        )
    )
