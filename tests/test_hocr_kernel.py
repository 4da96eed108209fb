"""Unit tests for the hOCR synth/parse kernel (SURVEY.md §5 item 3)."""

import pytest

from pdf2pdfocr_spark import hocr as H


def test_parse_basic_words_order():
    doc = H.synth_hocr(seed=7, width_px=2480, height_px=3508, layout="single")
    page = H.parse_hocr(doc)
    assert page.width_px == 2480 and page.height_px == 3508
    assert len(page.words) > 0
    # deterministic: same seed → identical result
    again = H.parse_hocr(H.synth_hocr(7, 2480, 3508, "single"))
    assert again == page


def test_namespaced_hocr_parses():
    # reference handles the xmlns via a namespace regex (pdf2pdfocr.py:294-297)
    doc = H.synth_hocr(seed=3, width_px=100, height_px=200)
    assert 'xmlns="http://www.w3.org/1999/xhtml"' in doc
    page = H.parse_hocr(doc)
    assert page.width_px == 100


def test_missing_page_div_raises_but_missing_bbox_defaults():
    # reference aborts only when there is NO ocr_page div (pdf2pdfocr.py:
    # 299-309); a bbox-less div defaults to Rect(0,0,0,0) exactly like
    # element_coordinates (336-347)
    with pytest.raises(ValueError):
        H.parse_hocr("<html><body><p>no page div</p></body></html>")
    page = H.parse_hocr(
        "<html><body><div class='ocr_page'>"
        "<span class='ocrx_word'>plain</span>"
        "<span class='ocrx_word' title='bbox 1 2 3 4'>boxed</span>"
        "</div></body></html>"
    )
    assert page.width_px == 0 and page.height_px == 0
    # bbox-less word included with the (0,0,0,0) default, not skipped
    assert [(w.text, w.x1, w.y1, w.x2, w.y2) for w in page.words] == [
        ("plain", 0, 0, 0, 0),
        ("boxed", 1, 2, 3, 4),
    ]


def test_ligature_normalization():
    doc = H.synth_hocr(seed=11, width_px=1000, height_px=1000, layout="ligatures")
    page = H.parse_hocr(doc)
    joined = " ".join(w.text for w in page.words)
    assert "ﬂ" not in joined and "ﬁ" not in joined
    assert "fl" in joined or "fi" in joined


def test_empty_word_skip():
    # whitespace-only spans skipped (pdf2pdfocr.py:410-413)
    doc = H.synth_hocr(seed=13, width_px=1000, height_px=1000, layout="empty_words")
    page = H.parse_hocr(doc)
    assert all(w.text.rstrip() for w in page.words)
    assert "empty" not in [w.text for w in page.words]  # sanity


def test_line_fallback():
    # no ocrx_word → use ocr_line (pdf2pdfocr.py:398-402)
    doc = H.synth_hocr(seed=17, width_px=1000, height_px=1000, layout="line_fallback")
    assert "ocrx_word" not in doc and "ocr_line" in doc
    page = H.parse_hocr(doc)
    assert len(page.words) > 0


def test_multi_column_order_is_document_order():
    doc = H.synth_hocr(seed=19, width_px=3000, height_px=3000, layout="multi_column")
    page = H.parse_hocr(doc)
    # H5 invariant: reading order = hOCR document order; with columns the
    # x-coordinates are NOT monotone but the sequence is the emission order.
    xs = [w.x1 for w in page.words]
    assert len(page.words) >= 8
    assert xs != sorted(xs)  # geometry disagrees with document order


def test_empty_page_fallback():
    # cuneiform fallback emits a bare ocr_page div (pdf2pdfocr.py:200)
    page = H.parse_hocr(H.synth_empty_page_hocr(2480, 3508))
    assert page.words == () and page.width_px == 2480


def test_px_to_pt():
    # px / dpi * 72 (pdf2pdfocr.py:349-354)
    assert H.px_to_pt(300, 300) == 72.0
    assert H.px_to_pt(2480, 300) == pytest.approx(595.2)
