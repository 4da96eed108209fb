"""hOCR synthesis + parsing kernel (pure Python, no Spark).

Parsing reimplements the extraction semantics of the reference's
``HocrTransform`` (pdf2pdfocr.py:278-437) — the part whose output must
match bit-for-bit (SURVEY.md §2.5):

* namespace-aware parse (pdf2pdfocr.py:294-297)
* page dims from the first ``div.ocr_page`` bbox; error if absent (299-309)
* bbox regex ``bbox((\\s+\\d+){4})`` on the ``title`` attr (290, 336-347)
* recursive text+tail concatenation (323-334)
* use ``ocrx_word`` spans if any exist, else ``ocr_line`` (398-402)
* reading order = hOCR document order (398-430)
* skip spans empty after rstrip (410-413)
* ligature normalization ``ﬂ→fl``, ``ﬁ→fi`` (356-366)
* px→pt scale ``c / dpi * 72`` (349-354)

Synthesis is the deterministic OCR *simulator* payload generator: given a
seed + page geometry it produces a known hOCR document (the sandbox has no
tesseract; real engines plug in at cluster deploy time, SURVEY.md §7).
"""

from __future__ import annotations

import random
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

INCH_PT = 72.0

# reference: regex on the hOCR title attribute (pdf2pdfocr.py:290)
BBOX_RE = re.compile(r"bbox((\s+\d+){4})")

# reference: replace_unsupported_chars (pdf2pdfocr.py:356-366)
LIGATURES = {"ﬂ": "fl", "ﬁ": "fi"}  # ﬂ, ﬁ


def normalize_ligatures(text: str) -> str:
    for lig, repl in LIGATURES.items():
        text = text.replace(lig, repl)
    return text


def px_to_pt(px: float, dpi: int) -> float:
    """pixel → PDF point (pdf2pdfocr.py:349-354)."""
    return px / dpi * INCH_PT


@dataclass(frozen=True)
class WordBox:
    text: str
    x1: int
    y1: int
    x2: int
    y2: int


@dataclass(frozen=True)
class HocrPage:
    width_px: int
    height_px: int
    words: tuple  # tuple[WordBox, ...] in hOCR document order (post-filter)


def _element_text(element: ET.Element) -> str:
    """Recursive text+tail concat (pdf2pdfocr.py:323-334)."""
    # leaf fast path (the overwhelmingly common hOCR word span: text only,
    # no children, no tail) — same result as the general recursion below
    if len(element) == 0 and element.tail is None:
        return element.text or ""
    text = ""
    if element.text is not None:
        text += element.text
    for child in element:
        text += _element_text(child)
    if element.tail is not None:
        text += element.tail
    return text


def _bbox_of(element: ET.Element):
    title = element.attrib.get("title", "")
    m = BBOX_RE.search(title)
    if m is None:
        return None
    return tuple(map(int, m.group(1).split()))


def parse_hocr(hocr: str) -> HocrPage:
    """Parse one hOCR page into ordered word boxes.

    Mirrors HocrTransform.__init__ + to_pdf span iteration
    (pdf2pdfocr.py:287-309, 398-430): namespace-stripped tag matching,
    ocrx_word-else-ocr_line class fallback, document order, empty-skip,
    ligature normalization. Missing bboxes default to (0,0,0,0) exactly like
    the reference's ``element_coordinates`` (pdf2pdfocr.py:336-347, which
    initializes ``out = Rect._make([0, 0, 0, 0])`` and only overwrites it
    when the bbox regex matches); the only hard error is a document with no
    ``ocr_page`` div at all (pdf2pdfocr.py:299-309).
    """
    root = ET.fromstring(hocr)
    # namespace-aware: reference regexes '{ns}html' (pdf2pdfocr.py:294-297);
    # ElementTree prefixes every tag with '{ns}' — strip by matching suffix.
    # ONE document walk collects the page div, word spans and line spans
    # together (the classes are mutually exclusive, so the same elements are
    # selected as the three separate root.iter() passes used to pick).
    page_dims = None
    words_elems: list = []
    line_elems: list = []
    for el in root.iter():
        cls = el.attrib.get("class", "")
        if cls == "ocrx_word":
            words_elems.append(el)
        elif cls == "ocr_line":
            line_elems.append(el)
        elif page_dims is None and cls == "ocr_page" and el.tag.endswith("div"):
            bbox = _bbox_of(el)
            # bbox-less page div → (0,0,0,0) like element_coordinates
            page_dims = (bbox[2], bbox[3]) if bbox is not None else (0, 0)
    if page_dims is None:
        # reference aborts only when there is no ocr_page div (308-309)
        raise ValueError("hocr: no ocr_page div found")

    # fallback to lines when no word spans exist (pdf2pdfocr.py:398-402)
    elems = words_elems if words_elems else line_elems

    out = []
    for el in elems:
        raw = _element_text(el).rstrip()
        if len(raw) == 0:  # empty-after-rstrip skip (pdf2pdfocr.py:410-413)
            continue
        bbox = _bbox_of(el) or (0, 0, 0, 0)  # element_coordinates default
        out.append(WordBox(normalize_ligatures(raw), *bbox))
    return HocrPage(page_dims[0], page_dims[1], tuple(out))


def hocr_plain_text(page: HocrPage) -> str:
    """The per-page ``.txt`` sidecar: word texts joined by spaces + trailing
    newline (tesseract txt output shape; reference byte-concats these files
    in page order, pdf2pdfocr.py:928-940)."""
    return " ".join(w.text for w in page.words) + "\n"


# --------------------------------------------------------------------------
# Deterministic hOCR synthesis (the simulator's "page content")
# --------------------------------------------------------------------------

_VOCAB = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "dolore magna aliqua enim minim veniam quis nostrud exercitation "
    "ullamco laboris nisi aliquip commodo consequat duis aute irure"
).split()

_LIGATURE_WORDS = ("ﬂow", "conﬁg", "ﬁeld", "bafﬂe")  # ﬂow confﬁg…

LAYOUTS = ("single", "multi_column", "line_fallback", "ligatures", "empty_words")

# Deterministic models of what a real OCR engine does to a page that was NOT
# normalized before recognition:
#
# * skewed page → classic OCR confusion-pair substitutions ("smudge") on
#   every 3rd word (the reference removes skew with `mogrify -deskew` BEFORE
#   OCR, pdf2pdfocr.py:94-101, 1085-1098 — so clean output requires the
#   deskew transform to actually run);
# * rotated page → letters Caesar-shifted by rotation/90 and word order
#   reversed; 90/270 additionally swap the page canvas dims (the scanner saw
#   a landscape image). The reference never rotates before OCR — it only
#   rotates the FINAL page for display (autorotate_final_output,
#   pdf2pdfocr.py:1038-1083) — so rotated-page OCR text is garbled there too.
_SMUDGE = str.maketrans({"e": "c", "o": "a", "i": "l", "n": "m"})


def _caesar(word: str, shift: int) -> str:
    return "".join(
        chr((ord(c) - 97 + shift) % 26 + 97) if "a" <= c <= "z" else c
        for c in word
    )


def synth_hocr(
    seed: int,
    width_px: int,
    height_px: int,
    layout: str = "single",
    rotation: int = 0,
    skew_pct: float = 0.0,
) -> str:
    """Deterministically generate one hOCR page — the OCR output for the
    page *as captured*.

    ``layout`` exercises the reference's parse branches (FIXTURES.md §A):
    multi_column (reading order = document order, not geometry),
    line_fallback (ocr_line only, no ocrx_word), ligatures, empty_words.
    ``rotation``/``skew_pct`` garble the output deterministically (see the
    module comment above) — a pipeline that fails to deskew upstream, or an
    oracle that disagrees about normalization, produces DIFFERENT spans, so
    golden tests can no longer pass vacuously. Bit-stable for a given
    (seed, dims, layout, rotation, skew) — no wall clock, no global RNG.
    """
    rng = random.Random(seed)
    n_cols = rng.choice((2, 3)) if layout == "multi_column" else 1
    # realistic page density: a 300-dpi A4 text page carries ~150-450 words;
    # keeping the simulator honest here also keeps per-page OCR cost in a
    # regime where parallelism (not fixed overhead) dominates benchmarks
    n_words = 150 + rng.randrange(300)

    words = []
    for i in range(n_words):
        if layout == "ligatures" and i % 5 == 2:
            words.append(rng.choice(_LIGATURE_WORDS))
        elif layout == "empty_words" and i % 6 == 3:
            words.append(rng.choice(("", " ", "  ", "\t ")))
        else:
            words.append(rng.choice(_VOCAB))

    if skew_pct > 0:  # smudged recognition of a skewed page
        words = [w.translate(_SMUDGE) if i % 3 == 0 else w
                 for i, w in enumerate(words)]
    if rotation:  # garbled recognition of a rotated page
        shift = (rotation // 90) % 26
        words = [_caesar(w, shift) for w in reversed(words)]
        if rotation in (90, 270):
            width_px, height_px = height_px, width_px

    col_w = width_px // n_cols
    spans = []
    per_col = (n_words + n_cols - 1) // n_cols
    for i, w in enumerate(words):
        col = i // per_col if per_col else 0
        row = i % per_col if per_col else 0
        x1 = col * col_w + 40 + (rng.randrange(20))
        y1 = 60 + row * 34
        x2 = min(x1 + 18 * max(1, len(w)), (col + 1) * col_w - 10)
        y2 = y1 + 28
        cls = "ocr_line" if layout == "line_fallback" else "ocrx_word"
        tag = "span"
        conf = rng.randrange(55, 100)
        spans.append(
            f'<{tag} class="{cls}" id="w_{i}" '
            f'title="bbox {x1} {y1} {x2} {y2}; x_wconf {conf}">{w}</{tag}>'
        )

    # 2-3 column layouts: one ocr_par per column; document order == column
    # order (the H5 invariant) — geometry intentionally disagrees with it.
    pars = []
    if n_cols == 1:
        pars.append('<p class="ocr_par">' + "".join(spans) + "</p>")
    else:
        for c in range(n_cols):
            chunk = spans[c * per_col:(c + 1) * per_col]
            pars.append('<p class="ocr_par">' + "".join(chunk) + "</p>")

    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml">'
        "<head><title></title></head><body>"
        f'<div class="ocr_page" id="page_1" '
        f'title="image; bbox 0 0 {width_px} {height_px}; ppageno 0">'
        f'<div class="ocr_carea">{"".join(pars)}</div>'
        "</div></body></html>"
    )


def synth_empty_page_hocr(width_px: int, height_px: int) -> str:
    """Empty page hOCR, analog of cuneiform's missing-output fallback where
    the reference hard-codes an A4 empty ocr_page div (pdf2pdfocr.py:200)."""
    return (
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        f'<div class="ocr_page" title="bbox 0 0 {width_px} {height_px}">'
        "</div></body></html>"
    )
