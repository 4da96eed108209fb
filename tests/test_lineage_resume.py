"""Kill/resume semantics (SURVEY.md §5 item 4): a partial run followed by a
resumed run must equal a single full run — no duplicate spans, no re-OCR."""

from pyspark.sql import functions as F

from pdf2pdfocr_spark import corpus, lineage
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.pipeline import extract


def _run(spark, docs, out_path, run_id):
    df = corpus.corpus_df(spark, docs)
    df = lineage.resume_filter(df, out_path)
    processed, quarantine = extract(df, PipelineConfig())
    lineage.write_checkpointed(processed, quarantine, out_path, run_id)


def test_resume_produces_identical_table(spark, tmp_path):
    docs = corpus.synth_documents(26)
    part, full = str(tmp_path / "part"), str(tmp_path / "full")

    # "killed" run: only the first half landed
    _run(spark, docs[:13], part, run_id="run-001")
    # resume over the whole corpus
    _run(spark, docs, part, run_id="run-002")
    # uninterrupted single run
    _run(spark, docs, full, run_id="run-solo")

    a = {r["doc_id"]: r["spans"] for r in lineage.read_output(spark, part).collect()}
    b = {r["doc_id"]: r["spans"] for r in lineage.read_output(spark, full).collect()}
    assert a == b

    # no duplicates: every doc_id appears exactly once
    dup = (
        lineage.read_output(spark, part)
        .groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0

    # resume run only processed the second half (minus quarantined docs)
    second = (
        lineage.read_output(spark, part)
        .filter(F.col("run_id") == "run-002").count()
    )
    assert second == len(docs) - 13 - 1  # one 'corrupt' doc in docs[13:]


def test_lineage_metrics_match_output(spark, tmp_path):
    docs = corpus.synth_documents(20)
    out = str(tmp_path / "out")
    _run(spark, docs, out, run_id="run-x")
    lin = lineage.read_lineage(spark, out)
    total = lin.agg(F.sum("n_docs"), F.sum("n_spans")).collect()[0]
    outdf = lineage.read_output(spark, out)
    assert total[0] == outdf.count()
    assert total[1] == outdf.agg(F.sum(F.size("spans"))).collect()[0][0]
    assert lin.filter(F.col("status") != "committed").count() == 0


def test_quarantine_ledger_written(spark, tmp_path):
    docs = corpus.synth_documents(26)
    out = str(tmp_path / "out")
    _run(spark, docs, out, run_id="run-q")
    q = spark.read.parquet(f"{out}/quarantine")
    assert q.filter(F.col("skip_reason") == "corrupt").count() == 2
