"""Job entry point — the spark-submit surface (north_rule packaging).

    spark-submit --py-files pdf2pdfocr_spark.zip -m pdf2pdfocr_spark.jobs \
        --input /path/corpus --output /path/out --run-id run-42 [flags]

Flags mirror the reference CLI (pdf2pdfocr.py:1413-1491): -t/--check-text,
-a/--avoid-encrypted, -b/--min-kbytes, -p/--max-pages, -c/--engine,
-l/--lang, -d/--deskew, -f/--force-rebuild, --ignore-existing-text,
-r/--dpi (image_resolution, 1465-1467), -m/--psm (tess_psm, 1472-1474),
-x/--extra-ocr-flags (extra_ocr_flag, 1476-1477), --timeout (whole-document
budget, 1478-1479 + 1511-1528), -s/--safe-mode (output-exists skip,
1161-1167). (--page-timeout is a Spark-side extension: the per-page wall
that keeps one stuck page from holding a whole Arrow batch.)

The job composes resume → extract → checkpointed write, so a re-submission
after a mid-run kill continues where the previous run stopped (never
double-appends) — the reference's safe-mode/continue-on-error semantics
(pdf2pdfocr.py:1161-1167, 1531-1533) at cluster scale.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

from pdf2pdfocr_spark import lineage
from pdf2pdfocr_spark.ocr_engine import OcrConfig
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.pipeline import StageProgress, build_spark, extract


def run_extraction_job(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    run_id: str,
    config: PipelineConfig | None = None,
) -> dict:
    """resume-filter → extract → checkpointed write; returns run metrics."""
    import dataclasses

    config = config or PipelineConfig()
    # the checkpointed write consumes BOTH branches (spans + quarantine) —
    # persist the assembled frame so the OCR stage runs exactly once
    config = dataclasses.replace(config, cache_assembled=True)
    done_docs = None
    if config.safe_mode:
        # -s safe mode (pdf2pdfocr.py:1161-1167): already-done docs stay in
        # the batch and quarantine with reason 'output_exists' (visible in
        # the ledger), instead of being silently anti-joined away
        remaining = docs
        done_docs = lineage.done_doc_ids(spark, out_path)
    else:
        remaining = lineage.resume_filter(docs, out_path)
    progress = StageProgress(spark)  # O5 live per-stage page counts
    processed, quarantine = extract(
        remaining, config, done_docs=done_docs, progress=progress
    )
    lineage.write_checkpointed(processed, quarantine, out_path, run_id)
    lineage.write_metrics(spark, out_path, run_id, progress.snapshot())
    # release the assembled-frame cache: a long-lived session running many
    # extraction jobs must not accumulate dataset-sized persisted frames
    cached = getattr(processed, "_persisted_parent", None)
    if cached is not None:
        cached.unpersist()
    lin = lineage.read_lineage(spark, out_path).filter(f"run_id = '{run_id}'")
    from pyspark.sql import functions as F

    row = lin.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("docs"),
        F.coalesce(F.sum("n_spans"), F.lit(0)).alias("spans"),
    ).collect()[0]
    return {
        "run_id": run_id,
        "n_docs": row["docs"],
        "n_spans": row["spans"],
        "progress": progress.snapshot(),
    }


def _parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="pdf2pdfocr_spark")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("-t", "--check-text", action="store_true")
    p.add_argument("-a", "--avoid-encrypted", action="store_true")
    p.add_argument("-b", "--min-kbytes", type=int, default=0)
    p.add_argument("-p", "--max-pages", type=int, default=None)
    p.add_argument("-c", "--engine", default="tesseract")
    p.add_argument("-l", "--lang", default="eng")
    p.add_argument("-d", "--deskew", type=float, default=0.0)
    p.add_argument("-g", "--convert-params", default="smart")
    p.add_argument("--autorotate", action="store_true")
    p.add_argument("-f", "--force-rebuild", action="store_true")
    p.add_argument("--ignore-existing-text", action="store_true")
    p.add_argument("-r", "--dpi", type=int, default=300)
    p.add_argument("-m", "--psm", type=int, default=None)
    # reference -x takes ONE string of engine flags; split on whitespace
    p.add_argument("-x", "--extra-ocr-flags", default="")
    p.add_argument("--timeout", type=float, default=None)       # per document
    p.add_argument("--page-timeout", type=float, default=None)  # per page
    p.add_argument("-s", "--safe-mode", action="store_true")
    p.add_argument("--salt-buckets", type=int, default=8)
    return p.parse_args(argv)


def config_from_args(args: argparse.Namespace) -> "PipelineConfig":
    """argparse namespace → PipelineConfig (split out so tests can assert
    every CLI flag actually reaches the config)."""
    return PipelineConfig(
        ocr=OcrConfig(
            engine=args.engine,
            lang=args.lang,
            psm=args.psm,
            dpi=args.dpi,
            extra_flags=tuple(args.extra_ocr_flags.split()),
            page_timeout_s=args.page_timeout,
            doc_timeout_s=args.timeout,
        ),
        min_kbytes=args.min_kbytes,
        max_pages=args.max_pages,
        check_text_mode=args.check_text,
        avoid_encrypted=args.avoid_encrypted,
        safe_mode=args.safe_mode,
        ignore_existing_text=args.ignore_existing_text,
        deskew_threshold=args.deskew,
        convert_params=args.convert_params,
        autorotate=args.autorotate,
        force_rebuild=args.force_rebuild,
        salt_buckets=args.salt_buckets,
    )


def main(argv=None) -> None:
    args = _parse_args(argv)
    config = config_from_args(args)
    spark = build_spark(app=f"pdf2pdfocr_spark-{args.run_id}")
    docs = spark.read.parquet(args.input)
    metrics = run_extraction_job(spark, docs, args.output, args.run_id, config)
    print(metrics)


if __name__ == "__main__":
    main()
