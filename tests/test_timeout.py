"""X5: a page exceeding the wall-clock limit quarantines its document; the
batch and job continue (reference doc-level timeout, pdf2pdfocr.py:1511-1528
+ continue-on-error 1531-1533)."""

from pyspark.sql import functions as F

from pdf2pdfocr_spark import corpus
from pdf2pdfocr_spark.ocr_engine import OcrConfig
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.pipeline import extract


def test_page_timeout_quarantines_doc(spark):
    docs = corpus.synth_documents(6, classes=("image_only",))
    config = PipelineConfig(
        ocr=OcrConfig(extra_flags=("--sim-sleep=5",), page_timeout_s=0.2)
    )
    processed, quarantine = extract(corpus.corpus_df(spark, docs), config)
    q = quarantine.collect()
    assert processed.count() == 0
    assert len(q) == 6
    assert all("TimeoutError" in r["skip_reason"] for r in q)


def test_no_timeout_when_fast(spark):
    docs = corpus.synth_documents(4, classes=("image_only",))
    config = PipelineConfig(ocr=OcrConfig(page_timeout_s=30.0))
    processed, quarantine = extract(corpus.corpus_df(spark, docs), config)
    assert quarantine.count() == 0
    assert processed.count() == 4
