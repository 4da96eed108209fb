from pdf2pdfocr_spark.functions.merge import multibackground_merge_plan
from pdf2pdfocr_spark.functions.render import (
    HELVETICA_WIDTHS,
    char_width_sum,
    string_width_pt,
    word_render_geometry,
)

__all__ = [
    "HELVETICA_WIDTHS",
    "char_width_sum",
    "string_width_pt",
    "word_render_geometry",
    "multibackground_merge_plan",
]
