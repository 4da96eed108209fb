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


def test_doc_timeout_budget_quarantines_cumulative(spark):
    """Reference --timeout bounds the DOCUMENT (pdf2pdfocr.py:1511-1528):
    pages that individually pass the page wall can still sum past the doc
    budget. A multi-page doc of 0.2s pages exceeds a 0.5s doc budget and
    quarantines; a 1-page doc under it is unaffected."""
    big = corpus.synth_document("doc-big", "image_only", seed=1, n_pages=5)
    small = corpus.synth_document("doc-small", "image_only", seed=2, n_pages=1)
    config = PipelineConfig(
        ocr=OcrConfig(
            extra_flags=("--sim-sleep=0.2",),
            page_timeout_s=30.0,       # every page individually passes
            doc_timeout_s=0.5,         # but 5 × 0.2s exceeds the doc budget
        )
    )
    processed, quarantine = extract(corpus.corpus_df(spark, [big, small]), config)
    q = {r["doc_id"]: r["skip_reason"] for r in quarantine.collect()}
    p = [r["doc_id"] for r in processed.collect()]
    assert p == ["doc-small"]
    assert set(q) == {"doc-big"} and q["doc-big"].startswith("doc_timeout")


def test_no_timeout_when_fast(spark):
    docs = corpus.synth_documents(4, classes=("image_only",))
    config = PipelineConfig(ocr=OcrConfig(page_timeout_s=30.0))
    processed, quarantine = extract(corpus.corpus_df(spark, docs), config)
    assert quarantine.count() == 0
    assert processed.count() == 4
