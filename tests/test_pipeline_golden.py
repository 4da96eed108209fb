"""Golden span-sequence equality: distributed pipeline vs pure-Python oracle.

The per-row invariant from BASELINE.json input_hint — span-sequence equality
(kind, text, media_ref, order) — checked for every document of every corpus
class, plus partition-invariance (the result must not depend on how pages
were salted/shuffled)."""

import pytest
from pyspark.sql import functions as F

from pdf2pdfocr_spark import corpus, oracle
from pdf2pdfocr_spark.ocr_engine import OcrConfig
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.pipeline import extract


def _spark_results(spark, docs, config, done=None):
    df = corpus.corpus_df(spark, docs, partitions=5)
    done_df = (
        spark.createDataFrame([(d,) for d in done], "doc_id string") if done else None
    )
    processed, quarantine = extract(df, config, done_docs=done_df)
    out = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in processed.collect()
    }
    qreasons = {r["doc_id"]: r["skip_reason"] for r in quarantine.collect()}
    texts = {r["doc_id"]: r["doc_text"] for r in processed.collect()}
    return out, qreasons, texts


def _oracle_results(docs, config, done=frozenset()):
    res = oracle.extract_corpus(docs, config, done)
    out = {
        k: oracle.span_tuples(v["spans"])
        for k, v in res.items()
        if v["skip_reason"] is None
    }
    q = {k: v["skip_reason"] for k, v in res.items() if v["skip_reason"]}
    texts = {k: v["doc_text"] for k, v in res.items() if v["skip_reason"] is None}
    return out, q, texts


@pytest.fixture(scope="module")
def tiny_corpus():
    return corpus.synth_documents(39)  # 3 docs per class


def test_golden_default_config(spark, tiny_corpus):
    config = PipelineConfig()
    got, got_q, got_texts = _spark_results(spark, tiny_corpus, config)
    want, want_q, want_texts = _oracle_results(tiny_corpus, config)
    assert got_q == want_q
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == want[doc_id], f"span mismatch for {doc_id}"
        assert got_texts[doc_id] == want_texts[doc_id]


def test_golden_gated_config(spark, tiny_corpus):
    config = PipelineConfig(
        check_text_mode=True, avoid_encrypted=True, max_pages=4, min_kbytes=1,
    )
    got, got_q, _ = _spark_results(spark, tiny_corpus, config)
    want, want_q, _ = _oracle_results(tiny_corpus, config)
    assert got_q == want_q
    assert got == want


def test_golden_safe_mode(spark, tiny_corpus):
    done = frozenset(d["doc_id"] for d in tiny_corpus[::4])
    config = PipelineConfig(safe_mode=True)
    got, got_q, _ = _spark_results(spark, tiny_corpus, config, done=done)
    want, want_q, _ = _oracle_results(tiny_corpus, config, done=done)
    assert got_q == want_q
    assert got == want


def test_golden_ignore_existing_text(spark, tiny_corpus):
    config = PipelineConfig(ignore_existing_text=True)
    got, _, _ = _spark_results(spark, tiny_corpus, config)
    want, _, _ = _oracle_results(tiny_corpus, config)
    assert got == want


def test_golden_no_ocr(spark, tiny_corpus):
    config = PipelineConfig(ocr=OcrConfig(engine="no_ocr"))
    got, _, _ = _spark_results(spark, tiny_corpus, config)
    want, _, _ = _oracle_results(tiny_corpus, config)
    assert got == want


def test_golden_cuneiform(spark, tiny_corpus):
    config = PipelineConfig(ocr=OcrConfig(engine="cuneiform"))
    got, _, _ = _spark_results(spark, tiny_corpus, config)
    want, _, _ = _oracle_results(tiny_corpus, config)
    assert got == want


def test_partition_invariance(spark, tiny_corpus):
    """Same corpus, radically different partitioning/salting → identical
    span sequences (determinism 'hard part', SURVEY.md §7)."""
    config_a = PipelineConfig(salt_buckets=1)
    config_b = PipelineConfig(salt_buckets=64)
    df1 = corpus.corpus_df(spark, tiny_corpus, partitions=1)
    df2 = corpus.corpus_df(spark, tiny_corpus, partitions=16)
    a, _ = extract(df1, config_a, num_partitions=2)
    b, _ = extract(df2, config_b, num_partitions=32)
    ra = {r["doc_id"]: r["spans"] for r in a.collect()}
    rb = {r["doc_id"]: r["spans"] for r in b.collect()}
    assert ra == rb


def test_huge_doc_skew(spark):
    """One 300-page doc among 1-pagers: must not error, spans must match the
    oracle (the page-count power-law axis, FIXTURES.md huge_doc)."""
    docs = corpus.synth_documents(12, classes=("tiny",), huge_doc_every=6,
                                  huge_doc_pages=300)
    config = PipelineConfig(salt_buckets=16)
    got, _, _ = _spark_results(spark, docs, config)
    want, _, _ = _oracle_results(docs, config)
    assert got == want


def test_preset_and_producer_meta_match_oracle(spark, tiny_corpus):
    """R6 smart preset + R8 producer metadata merge (engine-side columns)."""
    dirty = corpus.synth_document("doc-dirty", "image_only", seed=3)
    dirty["meta"] = {"producer": "Scanner v1", "title": "café ☃ report"}
    grey = corpus.synth_document("doc-grey", "image_only", seed=4)
    for s in grey["spans"]:
        s["media_ref"] = s["media_ref"].replace(
            f"colors={corpus.PagePayload.from_ref(s['media_ref']).n_colors}",
            "colors=2",
        )
    docs = tiny_corpus + [dirty, grey]
    config = PipelineConfig()
    processed, _ = extract(corpus.corpus_df(spark, docs), config)
    got = {
        r["doc_id"]: (r["preset"], dict(r["meta_out"])) for r in processed.collect()
    }
    want = {
        k: (v["preset"], v["meta_out"])
        for k, v in oracle.extract_corpus(docs, config).items()
        if v["skip_reason"] is None
    }
    assert got == want
    assert got["doc-grey"][0] == "best"
    assert got["doc-dirty"][1]["producer"] == "Scanner v1; pdf2pdfocr_spark 0.1.0"
    assert got["doc-dirty"][1]["title"] == "caf  report"


def test_duplicate_offsets_quarantined_not_abort(spark):
    """A doc with duplicate span offsets must quarantine as corrupt, never
    abort the job (it would otherwise hit DUPLICATE_MAP_KEY in reassembly)."""
    bad = corpus.synth_document("doc-dup", "image_only", seed=1, n_pages=3)
    bad["spans"][2]["offset"] = bad["spans"][1]["offset"]
    good = corpus.synth_document("doc-good", "image_only", seed=2)
    config = PipelineConfig()
    got, got_q, _ = _spark_results(spark, [bad, good], config)
    want, want_q, _ = _oracle_results([bad, good], config)
    assert got_q == want_q == {"doc-dup": "corrupt"}
    assert got == want and "doc-good" in got


def test_quarantine_has_reasons_not_abort(spark, tiny_corpus):
    processed, quarantine = extract(
        corpus.corpus_df(spark, tiny_corpus), PipelineConfig()
    )
    q = quarantine.collect()
    assert all(r["skip_reason"] == "corrupt" for r in q)
    assert len(q) == 3  # the three 'corrupt' docs
    assert processed.count() == len(tiny_corpus) - 3
