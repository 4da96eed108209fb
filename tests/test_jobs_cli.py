"""spark-submit job surface: flag parsing mirrors the reference CLI and the
job composes resume → extract → checkpointed write idempotently."""

from pdf2pdfocr_spark import corpus, lineage
from pdf2pdfocr_spark.jobs import _parse_args, run_extraction_job
from pdf2pdfocr_spark.ocr_engine import OcrConfig
from pdf2pdfocr_spark.oracle import PipelineConfig


def test_parse_args_reference_flags():
    a = _parse_args(
        "--input i --output o --run-id r -t -a -b 5 -p 100 -c cuneiform "
        "-l por -d 0.5 -f --ignore-existing-text --salt-buckets 32".split()
    )
    assert a.check_text and a.avoid_encrypted and a.force_rebuild
    assert a.min_kbytes == 5 and a.max_pages == 100
    assert a.engine == "cuneiform" and a.lang == "por"
    assert a.deskew == 0.5 and a.salt_buckets == 32
    assert a.ignore_existing_text


def test_job_idempotent_and_counts(spark, tmp_path):
    out = str(tmp_path / "out")
    docs = corpus.corpus_df(spark, corpus.synth_documents(13))
    config = PipelineConfig(ocr=OcrConfig(engine="tesseract"))
    m1 = run_extraction_job(spark, docs, out, "r1", config)
    m2 = run_extraction_job(spark, docs, out, "r2", config)
    assert m1["n_docs"] == 12  # one corrupt-class doc quarantines
    assert m2["n_docs"] == 0   # resume: nothing left to do
    outdf = lineage.read_output(spark, out)
    assert outdf.count() == 12
    assert outdf.select("doc_id").distinct().count() == 12
