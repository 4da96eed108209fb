"""P4/P5/P6 rotation + deskew semantics, with mutation checks.

Round-1 verdict: rotation/skew passed vacuously because neither the
simulator nor the oracle depended on them. Now the OCR simulator garbles
rotated/skewed captures deterministically (hocr.synth_hocr), so:

* deskew (-d) must actually straighten pages BEFORE OCR or goldens fail;
* autorotate must rewrite output image spans rot→0 or goldens fail;
* a deliberately-broken normalizer (mutation tests below) FAILS the golden
  comparison — the checks are no longer vacuous.

Also covers the R7 repair-retry ladder, the rebuild/ignore_existing_text
conflict (check_rebuild_pdf, pdf2pdfocr.py:765-767), and the fixed X5
timeout (one stuck page must not poison the rest of its Arrow batch).
"""

import pytest
from pyspark.sql import functions as F

from pdf2pdfocr_spark import corpus, hocr, oracle, pipeline
from pdf2pdfocr_spark.ocr_engine import (
    REPAIR_RESIDUE,
    OcrConfig,
    SimulatedTesseract,
    get_engine,
)
from pdf2pdfocr_spark.oracle import PipelineConfig, extract_corpus
from pdf2pdfocr_spark.pipeline import extract
from pdf2pdfocr_spark.schema import PagePayload


def _spark_spans(spark, docs, config):
    processed, quarantine = extract(corpus.corpus_df(spark, docs, 4), config)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in processed.collect()
    }
    q = {r["doc_id"]: r["skip_reason"] for r in quarantine.collect()}
    return got, q


def _oracle_spans(docs, config):
    res = extract_corpus(docs, config)
    return {
        k: oracle.span_tuples(v["spans"])
        for k, v in res.items()
        if v["skip_reason"] is None
    }, {k: v["skip_reason"] for k, v in res.items() if v["skip_reason"]}


# --------------------------------------------------------------------------
# the simulator is orientation-dependent (the vacuity fix itself)
# --------------------------------------------------------------------------

def test_synth_hocr_depends_on_rotation_and_skew():
    base = hocr.synth_hocr(99, 2480, 3508, "single")
    rot = hocr.synth_hocr(99, 2480, 3508, "single", rotation=90)
    skew = hocr.synth_hocr(99, 2480, 3508, "single", skew_pct=2.0)
    assert base != rot and base != skew and rot != skew
    # 90° swaps the scanned canvas dims
    page_rot = hocr.parse_hocr(rot)
    assert (page_rot.width_px, page_rot.height_px) == (3508, 2480)
    # rot garbling is a letter shift + order reversal — invertible sanity
    page_base = hocr.parse_hocr(base)
    unshift = [hocr._caesar(w.text, -1) for w in reversed(page_rot.words)]
    assert unshift == [w.text for w in page_base.words]
    # skew smudges every 3rd word via OCR confusion pairs, leaves others
    page_skew = hocr.parse_hocr(skew)
    diffs = [
        i for i, (a, b) in enumerate(zip(page_base.words, page_skew.words))
        if a.text != b.text
    ]
    assert diffs and all(i % 3 == 0 for i in diffs)


def test_engine_sees_capture_orientation():
    cfg = OcrConfig()
    eng = SimulatedTesseract(cfg)
    upright = PagePayload(2480, 3508, 300, 5, 0, 0.0, "single", 12345)
    rotated = PagePayload(2480, 3508, 300, 5, 180, 0.0, "single", 12345)
    assert eng.ocr_page(upright).text != eng.ocr_page(rotated).text


# --------------------------------------------------------------------------
# deskew (P5): golden + output payload + mutation
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def skew_rot_corpus():
    return corpus.synth_documents(12, classes=("skewed", "rotated", "blank_pages"))


def test_golden_deskew(spark, skew_rot_corpus):
    config = PipelineConfig(deskew_threshold=2.0)
    got, got_q = _spark_spans(spark, skew_rot_corpus, config)
    want, want_q = _oracle_spans(skew_rot_corpus, config)
    assert got_q == want_q
    assert got == want
    # emitted image spans carry the straightened capture
    for spans in got.values():
        for kind, _, ref, _ in spans:
            if kind == "image":
                assert "skew=0.0" in ref


def test_deskew_actually_cleans_ocr_text(spark):
    """With -d the OCR output of a skewed page equals the upright page's
    output; without it the smudge model shows through."""
    doc = corpus.synth_document("doc-skew", "skewed", seed=8)
    clean_doc = {
        "doc_id": "doc-skew",
        "spans": [
            dict(s, media_ref=s["media_ref"].replace(
                f"skew={PagePayload.from_ref(s['media_ref']).skew_pct}", "skew=0.0"
            ) if s["kind"] == "image" else s["media_ref"])
            for s in doc["spans"]
        ],
        "meta": doc["meta"],
    }
    with_d = extract_corpus([doc], PipelineConfig(deskew_threshold=1.0))
    without_d = extract_corpus([doc], PipelineConfig())
    upright = extract_corpus([clean_doc], PipelineConfig())
    assert with_d["doc-skew"]["doc_text"] == upright["doc-skew"]["doc_text"]
    assert without_d["doc-skew"]["doc_text"] != upright["doc-skew"]["doc_text"]


def test_mutation_broken_deskew_fails_golden(spark, skew_rot_corpus, monkeypatch):
    """A normalizer that does nothing must be CAUGHT by the golden check."""
    monkeypatch.setattr(pipeline, "_deskewed_spans", lambda spans: spans)
    config = PipelineConfig(deskew_threshold=2.0)
    got, _ = _spark_spans(spark, skew_rot_corpus, config)
    want, _ = _oracle_spans(skew_rot_corpus, config)
    assert got != want  # the vacuity is gone: breaking deskew breaks golden


# --------------------------------------------------------------------------
# autorotate (P4/P6): golden + OSD-count quirk + mutation
# --------------------------------------------------------------------------

def test_golden_autorotate(spark, skew_rot_corpus):
    config = PipelineConfig(autorotate=True)
    got, got_q = _spark_spans(spark, skew_rot_corpus, config)
    want, want_q = _oracle_spans(skew_rot_corpus, config)
    assert got_q == want_q
    assert got == want
    # rotated docs (no blanks) display upright; text stays garbled because
    # the reference never rotates BEFORE OCR (pdf2pdfocr.py:1038-1083)
    rotated = {k: v for k, v in got.items() if "rotated" in k or True}
    assert any("rot=0" in ref for spans in rotated.values()
               for kind, _, ref, _ in spans if kind == "image")


def test_autorotate_skipped_for_docs_with_blank_pages(spark):
    """Blank pages are excluded from OSD generation (pdf2pdfocr.py:1021) so
    the OSD-count guard (1044-1047) skips autorotate for the whole doc —
    reference quirk, mirrored."""
    doc = corpus.synth_document("doc-rb", "rotated", seed=5, n_pages=3)
    # make page 1 blank while keeping its rotation
    ref = doc["spans"][1]["media_ref"]
    pl = PagePayload.from_ref(ref)
    doc["spans"][1]["media_ref"] = ref.replace(
        f"colors={pl.n_colors}", "colors=1"
    )
    config = PipelineConfig(autorotate=True)
    got, _ = _spark_spans(spark, [doc], config)
    want, _ = _oracle_spans([doc], config)
    assert got == want
    refs = [r for k, _, r, _ in got["doc-rb"] if k == "image"]
    assert all("rot=0" not in r or "rot=0" in doc_ref
               for r, doc_ref in zip(refs, [s["media_ref"] for s in doc["spans"]]))
    # at least one page still carries its nonzero rotation
    assert any("rot=" in r and "rot=0" not in r for r in refs)


def test_mutation_broken_autorotate_fails_golden(spark, skew_rot_corpus, monkeypatch):
    monkeypatch.setattr(
        pipeline, "_autorotated_ref", lambda kind, ref, autorotate: ref
    )
    config = PipelineConfig(autorotate=True)
    got, _ = _spark_spans(spark, skew_rot_corpus, config)
    want, _ = _oracle_spans(skew_rot_corpus, config)
    assert got != want


# --------------------------------------------------------------------------
# rebuild × ignore_existing_text conflict (check_rebuild_pdf, 765-767)
# --------------------------------------------------------------------------

def test_static_rebuild_conflict_raises():
    with pytest.raises(ValueError, match="won't work together"):
        PipelineConfig(ignore_existing_text=True, force_rebuild=True)
    with pytest.raises(ValueError, match="won't work together"):
        PipelineConfig(ignore_existing_text=True, deskew_threshold=1.0)


def test_dynamic_rebuild_conflict_quarantines(spark):
    enc = corpus.synth_document("doc-enc", "encrypted", seed=2)
    ok = corpus.synth_document("doc-ok", "image_only", seed=3)
    config = PipelineConfig(ignore_existing_text=True)
    got, got_q = _spark_spans(spark, [enc, ok], config)
    want, want_q = _oracle_spans([enc, ok], config)
    assert got_q == want_q == {"doc-enc": "rebuild_conflict"}
    assert got == want and "doc-ok" in got


# --------------------------------------------------------------------------
# R5 rebuild re-render (preset convert params fold into output payloads)
# --------------------------------------------------------------------------

def test_rebuild_rerender_quantizes_best_preset(spark):
    """Group4 'best' preset re-renders output pages to bilevel (colors=2,
    rebuild_and_merge presets pdf2pdfocr.py:834-838); 'jpeg' keeps the
    palette; blanks stay at 1 distinct color."""
    grey = corpus.synth_document("doc-grey", "image_only", seed=4, n_pages=3)
    for s in grey["spans"]:
        pl = PagePayload.from_ref(s["media_ref"])
        s["media_ref"] = s["media_ref"].replace(f"colors={pl.n_colors}", "colors=9")
    color = corpus.synth_document("doc-color", "image_only", seed=5, n_pages=2)
    for s in color["spans"]:
        pl = PagePayload.from_ref(s["media_ref"])
        s["media_ref"] = s["media_ref"].replace(
            f"colors={pl.n_colors}", "colors=120"
        )
    config = PipelineConfig(force_rebuild=True)
    got, _ = _spark_spans(spark, [grey, color], config)
    want, _ = _oracle_spans([grey, color], config)
    assert got == want
    grey_refs = [r for k, _, r, _ in got["doc-grey"] if k == "image"]
    assert grey_refs and all("colors=2" in r for r in grey_refs)
    color_refs = [r for k, _, r, _ in got["doc-color"] if k == "image"]
    assert all("colors=120" in r for r in color_refs)  # jpeg preset: kept
    # without rebuild, 'best'-preset docs keep their original payloads
    got2, _ = _spark_spans(spark, [grey], PipelineConfig())
    assert all(
        "colors=9" in r for k, _, r, _ in got2["doc-grey"] if k == "image"
    )


def test_explicit_convert_params_presets(spark):
    """-g presets (rebuild_and_merge, pdf2pdfocr.py:834-872): an explicit
    Group4 preset quantizes EVERY rebuilt doc regardless of its colors; a
    JPEG-family preset never does; '' defaults to 'best'."""
    color = corpus.synth_document("doc-c", "image_only", seed=6, n_pages=2)
    for s in color["spans"]:
        pl = PagePayload.from_ref(s["media_ref"])
        s["media_ref"] = s["media_ref"].replace(
            f"colors={pl.n_colors}", "colors=150"
        )

    for params, want_colors in [
        ("grayscale", "colors=2"), ("fast", "colors=2"), ("", "colors=2"),
        ("jpeg2000", "colors=150"), ("-custom -flags", "colors=150"),
    ]:
        config = PipelineConfig(force_rebuild=True, convert_params=params)
        got, _ = _spark_spans(spark, [color], config)
        want, _ = _oracle_spans([color], config)
        assert got == want, params
        refs = [r for k, _, r, _ in got["doc-c"] if k == "image"]
        assert all(want_colors in r for r in refs), (params, refs)


# --------------------------------------------------------------------------
# R7 repair-retry ladder
# --------------------------------------------------------------------------

def _page_doc(doc_id: str, seeds: list) -> dict:
    spans = [
        {
            "kind": "image",
            "text": "",
            "media_ref": PagePayload(
                2480, 3508, 300, 5, 0, 0.0, "single", s
            ).to_ref(),
            "offset": i,
        }
        for i, s in enumerate(seeds)
    ]
    return {"doc_id": doc_id, "spans": spans, "meta": {}}


def test_capability_negotiation():
    """Engine capability surface (check_external_tools analog,
    pdf2pdfocr.py:588-652): tesseract advertises textonly_pdf+psm,
    cuneiform does not; a caps dict without hocr is rejected by extract."""
    t = get_engine(OcrConfig(engine="tesseract")).capabilities()
    c = get_engine(OcrConfig(engine="cuneiform")).capabilities()
    assert t["hocr"] and t["textonly_pdf"] and t["psm"]
    assert c["hocr"] and not c["textonly_pdf"] and not c["psm"]
    with pytest.raises(ValueError, match="unknown OCR engine"):
        get_engine(OcrConfig(engine="nope"))


def test_engine_repair_ladder_unit():
    eng = get_engine(OcrConfig())
    bad = PagePayload(2480, 3508, 300, 5, 0, 0.0, "single", REPAIR_RESIDUE * 3)
    with pytest.raises(RuntimeError, match="merge_failed"):
        eng.ocr_page(bad)
    res = eng.ocr_page_with_repair(bad)  # pdf2ps/ps2pdf roundtrip analog
    assert res.words and res.error is None


def test_repair_page_succeeds_in_pipeline_and_matches_oracle(spark):
    docs = [
        _page_doc("doc-repair", [REPAIR_RESIDUE, 12345]),
        _page_doc("doc-plain", [777, 888]),
    ]
    config = PipelineConfig()
    got, got_q = _spark_spans(spark, docs, config)
    want, want_q = _oracle_spans(docs, config)
    assert got_q == want_q == {}
    assert got == want
    # the repaired page produced real words, not an empty page
    assert sum(1 for k, *_ in got["doc-repair"] if k == "text") > 0


# --------------------------------------------------------------------------
# X5: one stuck page must NOT poison the rest of its batch
# --------------------------------------------------------------------------

def test_stuck_page_does_not_poison_batch(spark):
    """Round-1 bug: the shared 1-worker timeout pool let a stuck page block
    every later page in the Arrow batch (all falsely timed out). Page 0
    hangs; pages 1..3 of the SAME partition must still OCR fine."""
    rows = [("doc-x", i, PagePayload(2480, 3508, 300, 5, 0, 0.0, "single",
                                     seed).to_ref())
            for i, seed in enumerate([424242, 111, 222, 333])]
    pages = spark.createDataFrame(
        rows, "doc_id string, offset int, media_ref string"
    ).coalesce(1)  # one partition → one mapInPandas batch stream
    config = PipelineConfig(
        ocr=OcrConfig(extra_flags=("--sim-sleep-if-seed=424242:5",),
                      page_timeout_s=0.5)
    )
    out = {r["offset"]: r for r in pipeline.run_ocr(pages, config).collect()}
    assert "TimeoutError" in out[0]["error"]
    for off in (1, 2, 3):
        assert out[off]["error"] is None
        assert out[off]["words"]  # real OCR output, not a queued timeout
