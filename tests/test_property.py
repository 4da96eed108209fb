"""Property-based spot checks (SURVEY.md §5 item 5, hypothesis-driven):
random seeded documents → oracle invariants hold and the distributed
pipeline agrees with the oracle."""

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf2pdfocr_spark import corpus, oracle
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.pipeline import extract


def random_docs(seed: int, n: int) -> list:
    rng = random.Random(seed)
    return [
        corpus.synth_document(
            f"doc-{seed}-{i:04d}",
            rng.choice(corpus.CLASSES),
            seed=rng.randrange(10_000),
            n_pages=rng.randrange(1, 7),
        )
        for i in range(n)
    ]


@given(seed=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_oracle_invariants(seed):
    for doc in random_docs(seed, 3):
        r = oracle.extract_document(doc, PipelineConfig())
        if r["skip_reason"] is not None:
            assert r["spans"] is None
            continue
        spans = r["spans"]
        # offsets strictly increasing 0..n-1
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        # text spans never carry media, image spans never carry text
        for s in spans:
            if s["kind"] == "text":
                assert s["media_ref"] == ""
            else:
                assert s["text"] == ""
        # every input image span survives, modulo the DOCUMENTED R5 rewrite
        # (hypothesis-found seed 4308: an encrypted doc takes the rebuild
        # branch, and a Group4 preset re-renders non-blank pages to bilevel
        # — colors→2 — exactly as rebuild_and_merge's preset table does,
        # pdf2pdfocr.py:834-838; the old invariant demanded byte-equality)
        import re

        def expected_ref(m):
            if (
                r["rebuild"]
                and r["preset"] in oracle.GROUP4_PRESETS
                and "colors=1;" not in m
            ):
                return re.sub(r"colors=\d+", "colors=2", m)
            return m

        in_imgs = [
            expected_ref(s["media_ref"])
            for s in sorted(doc["spans"], key=lambda s: s["offset"])
            if s["kind"] == "image"
        ]
        out_imgs = [s["media_ref"] for s in spans if s["kind"] == "image"]
        assert out_imgs == in_imgs or sorted(out_imgs) == sorted(in_imgs)
        # determinism
        again = oracle.extract_document(doc, PipelineConfig())
        assert oracle.span_tuples(again["spans"]) == oracle.span_tuples(spans)


@given(seed=st.integers(min_value=0, max_value=1_000))
@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
def test_pipeline_matches_oracle_on_random_corpus(spark, seed):
    docs = random_docs(seed, 8)
    config = PipelineConfig()
    processed, quarantine = extract(corpus.corpus_df(spark, docs, partitions=3), config)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in processed.collect()
    }
    want_all = oracle.extract_corpus(docs, config)
    want = {
        k: oracle.span_tuples(v["spans"])
        for k, v in want_all.items() if v["skip_reason"] is None
    }
    assert got == want
    assert {r["doc_id"] for r in quarantine.collect()} == {
        k for k, v in want_all.items() if v["skip_reason"]
    }
