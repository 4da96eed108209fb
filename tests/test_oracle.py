"""Oracle behavior per corpus class (SURVEY.md §5 items 1 & 3)."""

import pytest

from pdf2pdfocr_spark import corpus, oracle
from pdf2pdfocr_spark.ocr_engine import OcrConfig
from pdf2pdfocr_spark.oracle import PipelineConfig, extract_document


def doc(cls, i=0, **kw):
    return corpus.synth_document(f"doc-{i:09d}", cls, seed=42, **kw)


def test_image_only_emits_interleaved_spans():
    d = doc("image_only")
    r = extract_document(d, PipelineConfig())
    assert r["skip_reason"] is None
    kinds = [s["kind"] for s in r["spans"]]
    # every image span followed by ≥1 text spans
    assert kinds[0] == "image" and "text" in kinds
    offsets = [s["offset"] for s in r["spans"]]
    assert offsets == list(range(len(offsets)))
    # text spans never carry media bytes (textonly_pdf lesson, 116-118)
    assert all(s["media_ref"] == "" for s in r["spans"] if s["kind"] == "text")
    assert all(s["text"] == "" for s in r["spans"] if s["kind"] == "image")


def test_native_text_passthrough():
    d = doc("native_text")
    r = extract_document(d, PipelineConfig())
    assert [s["kind"] for s in r["spans"]] == ["text"] * len(d["spans"])
    assert [s["text"] for s in r["spans"]] == [s["text"] for s in d["spans"]]
    assert r["doc_text"] == ""  # no OCR pages


def test_check_text_mode_gate():
    d = doc("mixed")
    r = extract_document(d, PipelineConfig(check_text_mode=True))
    assert r["skip_reason"] == "has_text"


def test_encrypted_gate_and_rebuild():
    d = doc("encrypted")
    assert extract_document(d, PipelineConfig(avoid_encrypted=True))[
        "skip_reason"
    ] == "encrypted"
    r = extract_document(d, PipelineConfig())
    assert r["skip_reason"] is None and r["rebuild"] is True


def test_min_size_gate():
    d = doc("tiny")
    assert extract_document(d, PipelineConfig(min_kbytes=10_000))[
        "skip_reason"
    ] == "min_size"


def test_max_pages_gate():
    d = doc("image_only")
    assert extract_document(d, PipelineConfig(max_pages=0))["skip_reason"] == "max_pages"


def test_corrupt_quarantine():
    d = doc("corrupt")
    assert extract_document(d, PipelineConfig())["skip_reason"] == "corrupt"


def test_safe_mode_output_exists():
    d = doc("tiny")
    r = extract_document(
        d, PipelineConfig(safe_mode=True), done_doc_ids=frozenset({d["doc_id"]})
    )
    assert r["skip_reason"] == "output_exists"


def test_blank_pages_no_text():
    d = doc("blank_pages", n_pages=4)
    r = extract_document(d, PipelineConfig())
    blanks = [s for s in d["spans"] if "colors=1;" in s["media_ref"]]
    assert blanks, "fixture must contain blank pages"
    out_images = [s for s in r["spans"] if s["kind"] == "image"]
    assert len(out_images) == 4  # blanks re-inserted (993-997)
    # a blank page's image span is followed by another image span or EOF
    for i, s in enumerate(r["spans"]):
        if s["media_ref"] in {b["media_ref"] for b in blanks}:
            nxt = r["spans"][i + 1] if i + 1 < len(r["spans"]) else None
            assert nxt is None or nxt["kind"] == "image"


def test_no_ocr_passthrough():
    d = doc("image_only")
    r = extract_document(d, PipelineConfig(ocr=OcrConfig(engine="no_ocr")))
    assert oracle.span_tuples(r["spans"]) == oracle.span_tuples(
        sorted(d["spans"], key=lambda s: s["offset"])
    )


def test_ignore_existing_text_drops_native():
    d = doc("mixed")
    r = extract_document(d, PipelineConfig(ignore_existing_text=True))
    native = [s["text"] for s in d["spans"] if s["kind"] == "text"]
    out_texts = [s["text"] for s in r["spans"] if s["kind"] == "text"]
    assert not set(native) & set(out_texts)


def test_cuneiform_empty_fallback():
    d = doc("image_only")
    # force a seed divisible by 997 on the first page
    d["spans"][0]["media_ref"] = d["spans"][0]["media_ref"].rsplit("seed=", 1)[0] + "seed=997"
    r = extract_document(d, PipelineConfig(ocr=OcrConfig(engine="cuneiform")))
    assert r["skip_reason"] is None  # fallback, not failure (pdf2pdfocr.py:200)


def test_deskew_triggers_rebuild():
    d = doc("skewed")
    r = extract_document(d, PipelineConfig(deskew_threshold=0.5))
    assert r["rebuild"] is True
    assert extract_document(d, PipelineConfig())["rebuild"] is False


def test_doc_text_page_order():
    d = doc("image_only", n_pages=3)
    r = extract_document(d, PipelineConfig())
    # doc_text = concat of page texts in offset order (928-940)
    assert r["doc_text"].count("\n") == 3


def test_determinism_across_runs():
    a = extract_document(doc("multi_column"), PipelineConfig())
    b = extract_document(doc("multi_column"), PipelineConfig())
    assert oracle.span_tuples(a["spans"]) == oracle.span_tuples(b["spans"])


@pytest.mark.parametrize("cls", corpus.CLASSES)
def test_all_classes_terminate(cls):
    r = extract_document(doc(cls), PipelineConfig())
    assert (r["spans"] is not None) != (r["skip_reason"] is not None)
