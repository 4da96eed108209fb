"""R4 multibackground merge math as vectorized column expressions.

The reference's qpdf-less fallback merges the image page under the text
page per page (/root/reference/pdf2pdfocr_multibackground.py:34-94):

* rotated image pages (90/270) swap x/y before scaling (lines 56-60);
* scale factors = text dims / (rotation-corrected) image dims (62-63);
* scaling is skipped when both factors are within ``tolerance`` (0.001) of
  1 (67-69, "try to avoid unnecessary scale operation");
* merge is plain for angle 0/360, else rotate-translate with the tested
  translation constants: 90 → (y/2, y/2), 180 → (x/2, y/2),
  270 → (x/2, x/2), rotation = -angle (71-88).

Here the whole decision table is a codegen'd projection over page-geometry
columns — no per-row Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE_TOLERANCE = 0.001


def multibackground_merge_plan(
    df: DataFrame,
    img_w: Column,
    img_h: Column,
    txt_w: Column,
    txt_h: Column,
    angle: Column,
    tolerance: float = SCALE_TOLERANCE,
) -> DataFrame:
    """Append the merge-decision columns: (factor_x, factor_y, needs_scale,
    merge_mode, rotate_by, translate_x, translate_y)."""
    swapped = angle.isin(90, 270)
    eff_x = F.when(swapped, img_h.cast("double")).otherwise(img_w.cast("double"))
    eff_y = F.when(swapped, img_w.cast("double")).otherwise(img_h.cast("double"))
    factor_x = txt_w.cast("double") / eff_x
    factor_y = txt_h.cast("double") / eff_y
    needs_scale = (
        (F.abs(factor_x - F.lit(1.0)) > F.lit(tolerance))
        | (F.abs(factor_y - F.lit(1.0)) > F.lit(tolerance))
    )
    simple = (F.pmod(angle, F.lit(360)) == 0)
    merge_mode = F.when(simple, F.lit("simple")).otherwise(F.lit("rotated"))
    rotate_by = F.when(simple, F.lit(0)).otherwise(-angle)
    tx = (
        F.when(simple, F.lit(0.0))
        .when(angle == 90, eff_y / 2)
        .when(angle == 180, eff_x / 2)
        .when(angle == 270, eff_x / 2)
    )
    ty = (
        F.when(simple, F.lit(0.0))
        .when(angle == 90, eff_y / 2)
        .when(angle == 180, eff_y / 2)
        .when(angle == 270, eff_x / 2)
    )
    return df.select(
        "*",
        # factors exported as exact ppm integers via floor: both engines
        # compute bit-identical IEEE doubles, so floor() agrees everywhere —
        # round(x, 6) does NOT (ties like 641/640 = 1.0015625 round HALF_UP
        # in Spark but half-even in DuckDB)
        F.floor(factor_x * F.lit(1_000_000.0)).cast("long").alias("factor_x_ppm"),
        F.floor(factor_y * F.lit(1_000_000.0)).cast("long").alias("factor_y_ppm"),
        needs_scale.alias("needs_scale"),
        merge_mode.alias("merge_mode"),
        rotate_by.cast("int").alias("rotate_by"),
        # translations are exact halves of integers — no rounding needed
        tx.alias("translate_x"),
        ty.alias("translate_y"),
    )
