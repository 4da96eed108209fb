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


def test_hand_written_fixture_literal_spans():
    """Round-2 verdict #9 (flagship-golden independence hardening): a
    LITERAL hOCR document — written by hand, never produced by synth_hocr —
    with hand-computed expected word tuples. Covers in one fixture:
    namespaced tags, ocrx_word extraction with nested markup (strong/em
    text+tail concat), ligature normalization, empty-after-rstrip skip,
    missing-bbox default (0,0,0,0), and document order. If the shared
    parse kernel regresses, this fails independently of any generator."""
    doc = """<?xml version="1.0" encoding="UTF-8"?>
<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">
 <body>
  <div class="ocr_page" id="page_1"
       title="image page.png; bbox 0 0 2480 3508; ppageno 0">
   <div class="ocr_carea" title="bbox 100 100 2380 3408">
    <p class="ocr_par">
     <span class="ocr_line" title="bbox 120 150 900 210">
      <span class="ocrx_word" title="bbox 120 150 300 210">The</span>
      <span class="ocrx_word" title="bbox 320 150 560 210"><strong>qu</strong>ick</span>
      <span class="ocrx_word" title="bbox 580 150 900 210">ﬂow</span>
     </span>
     <span class="ocr_line" title="bbox 120 250 900 310">
      <span class="ocrx_word" title="bbox 120 250 200 310">   </span>
      <span class="ocrx_word">nobox</span>
      <span class="ocrx_word" title="bbox 400 250 700 310">ﬁn<em>al</em>e </span>
     </span>
    </p>
   </div>
  </div>
 </body>
</html>"""
    page = H.parse_hocr(doc)
    assert (page.width_px, page.height_px) == (2480, 3508)
    assert [
        (w.text, w.x1, w.y1, w.x2, w.y2) for w in page.words
    ] == [
        ("The", 120, 150, 300, 210),
        # nested <strong> text + tail concatenated recursively
        ("quick", 320, 150, 560, 210),
        # ﬂ ligature normalized
        ("flow", 580, 150, 900, 210),
        # whitespace-only word skipped (empty after rstrip)
        # missing title → bbox defaults to (0,0,0,0)
        ("nobox", 0, 0, 0, 0),
        # ﬁ ligature + nested <em> + trailing space rstripped
        ("finale", 400, 250, 700, 310),
    ]
    assert H.hocr_plain_text(page) == "The quick flow nobox finale\n"


def test_hand_written_fixture_line_fallback_and_no_page():
    """Literal fixtures for the two remaining kernel branches: ocr_line
    fallback when no ocrx_word exists, and the no-ocr_page hard error."""
    line_only = """<html xmlns="http://www.w3.org/1999/xhtml"><body>
  <div class="ocr_page" title="bbox 0 0 1000 800">
   <span class="ocr_line" title="bbox 10 20 400 60">whole line text</span>
   <span class="ocr_line" title="bbox 10 80 400 120">second ﬂine</span>
  </div></body></html>"""
    page = H.parse_hocr(line_only)
    assert [(w.text, w.x1, w.y1, w.x2, w.y2) for w in page.words] == [
        ("whole line text", 10, 20, 400, 60),
        ("second fline", 10, 80, 400, 120),
    ]

    with pytest.raises(ValueError, match="no ocr_page"):
        H.parse_hocr("<html><body><p>not hocr</p></body></html>")
