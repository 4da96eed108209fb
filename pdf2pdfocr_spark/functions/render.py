"""H7 invisible-text render geometry (pdf2pdfocr.py:419-430).

The reference draws each hOCR word as invisible text (render mode 3) in
Helvetica, with

* ``fontsize`` = bbox height in points (``pt.y2 - pt.y1``, line 421), and
* ``horizontal scale`` = ``100 * (pt.x2 - pt.x1) / stringWidth(text,
  'Helvetica', fontsize)`` (line 427) — stretching the glyphs to exactly
  fill the bbox width.

``stringWidth`` uses the Adobe Helvetica AFM metrics (public domain-ish
Adobe core-14 font metrics, the same table reportlab ships): width(text) =
sum(per-mille glyph widths) × fontsize / 1000. The table below covers
printable ASCII; unknown glyphs fall back to 556/1000 em (the Helvetica
lowercase average) — a documented approximation where the reference would
raise a KeyError.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INCH_PT = 72.0
DEFAULT_GLYPH_WIDTH = 556

# Adobe Helvetica AFM widths (per 1000 units of fontsize), printable ASCII.
HELVETICA_WIDTHS = {
    " ": 278, "!": 278, '"': 355, "#": 556, "$": 556, "%": 889, "&": 667,
    "'": 191, "(": 333, ")": 333, "*": 389, "+": 584, ",": 278, "-": 333,
    ".": 278, "/": 278,
    "0": 556, "1": 556, "2": 556, "3": 556, "4": 556, "5": 556, "6": 556,
    "7": 556, "8": 556, "9": 556,
    ":": 278, ";": 278, "<": 584, "=": 584, ">": 584, "?": 556, "@": 1015,
    "A": 667, "B": 667, "C": 722, "D": 722, "E": 667, "F": 611, "G": 778,
    "H": 722, "I": 278, "J": 500, "K": 667, "L": 556, "M": 833, "N": 722,
    "O": 778, "P": 667, "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722,
    "V": 667, "W": 944, "X": 667, "Y": 667, "Z": 611,
    "[": 278, "\\": 278, "]": 278, "^": 469, "_": 556, "`": 333,
    "a": 556, "b": 556, "c": 500, "d": 556, "e": 556, "f": 278, "g": 556,
    "h": 556, "i": 222, "j": 222, "k": 500, "l": 222, "m": 833, "n": 556,
    "o": 556, "p": 556, "q": 556, "r": 333, "s": 500, "t": 278, "u": 556,
    "v": 500, "w": 722, "x": 500, "y": 500, "z": 500,
    "{": 334, "|": 260, "}": 334, "~": 584,
}


# --- pure-Python kernel (used inside the Arrow OCR stage + oracle tests) ----

def string_width_pt(text: str, fontsize_pt: float) -> float:
    """reportlab pdf.stringWidth(text, 'Helvetica', fontsize) equivalent."""
    units = sum(HELVETICA_WIDTHS.get(c, DEFAULT_GLYPH_WIDTH) for c in text)
    return units * fontsize_pt / 1000.0


def word_render_geometry(
    text: str, x1: int, y1: int, x2: int, y2: int, dpi: int
) -> tuple:
    """(fontsize_pt, h_scale) for one word bbox (px) — the two values the
    reference computes before text.textLine (pdf2pdfocr.py:419-430).
    h_scale is None for degenerate boxes (fontsize 0 → stringWidth 0, where
    the reference would divide by zero)."""
    fontsize = (y2 - y1) / dpi * INCH_PT
    width_pt = (x2 - x1) / dpi * INCH_PT
    sw = string_width_pt(text, fontsize)
    h_scale = 100.0 * width_pt / sw if sw else None
    return fontsize, h_scale


# --- Spark column expressions (JVM-side twin for SQL-checkable queries) ------

def _width_map() -> Column:
    pairs: list = []
    for ch, w in HELVETICA_WIDTHS.items():
        pairs.append(F.lit(ch))
        pairs.append(F.lit(w))
    return F.create_map(*pairs)


def char_width_sum(text: Column) -> Column:
    """Sum of per-mille glyph widths over a string column — codegen'd
    aggregate over the split-to-chars array, no UDF."""
    chars = F.filter(F.split(text, ""), lambda c: F.length(c) > 0)
    m = _width_map()
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: acc
        + F.coalesce(F.element_at(m, c), F.lit(DEFAULT_GLYPH_WIDTH)).cast("long"),
    )
