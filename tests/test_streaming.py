"""Micro-batch streaming ingest: files landing in a directory flow through
the same extraction pipeline with exactly-once document semantics."""

from pyspark.sql import functions as F

from pdf2pdfocr_spark import corpus, lineage, oracle
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.streaming import stream_extract


def test_stream_extract_availablenow(spark, tmp_path):
    indir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = corpus.synth_documents(13)
    corpus.corpus_df(spark, docs, partitions=2).write.parquet(indir)

    stream_extract(spark, indir, out, checkpoint_dir=ckpt, trigger_once=True)

    got = {r["doc_id"]: r["spans"] for r in lineage.read_output(spark, out).collect()}
    want = oracle.extract_corpus(docs, PipelineConfig())
    expected = {k for k, v in want.items() if v["skip_reason"] is None}
    assert set(got) == expected
    for doc_id in expected:
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got[doc_id]
        ] == oracle.span_tuples(want[doc_id]["spans"])

    # second batch of new files → only new docs processed, old not re-done
    more = corpus.synth_documents(20)[13:]
    corpus.corpus_df(spark, more, partitions=1).write.mode("append").parquet(indir)
    stream_extract(spark, indir, out, checkpoint_dir=ckpt, trigger_once=True)

    outdf = lineage.read_output(spark, out)
    assert outdf.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    want2 = oracle.extract_corpus(more, PipelineConfig())
    expected2 = expected | {k for k, v in want2.items() if v["skip_reason"] is None}
    assert {r["doc_id"] for r in outdf.select("doc_id").collect()} == expected2
