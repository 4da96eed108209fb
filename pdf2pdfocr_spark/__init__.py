"""pdf2pdfocr_spark — a brand-new PySpark-native document-extraction engine.

Reimplements the per-document semantics of LeoFCardoso/pdf2pdfocr
(reference at /root/reference, read-only) over an Iceberg-style table of
interleaved text+media documents:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Design stance (SURVEY.md §7): one lazy DataFrame plan, Arrow-vectorized
pandas UDFs for the OCR/hOCR kernels (never per-row Python), zero custom
Catalyst rules, deterministic OCR-engine adapter (real engines are
cluster-deploy-time plugins; the sandbox uses a bit-stable simulator).
"""

__version__ = "0.1.0"

from pdf2pdfocr_spark.schema import DOCUMENTS_SCHEMA, SPAN_STRUCT  # noqa: F401
