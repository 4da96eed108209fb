"""Deterministic synthetic corpus of interleaved documents (FIXTURES.md §A).

The reference ships no test corpus (SURVEY.md §5), so fixtures are
synthesized: seeded, no wall clock, bit-stable across runs and partitionings.
Corpus classes mirror the reference's behavior branches — image_only, mixed,
native_text, multi_column, blank_pages, rotated, skewed, ligatures,
empty_words, line_fallback, huge_doc, tiny, corrupt, encrypted.

Two construction paths:

* ``synth_documents`` — pure-Python row generation (unit/golden tests and
  the bench corpus; driver-side, then parallelized via createDataFrame).
* ``documents_from_testdata`` — derives an interleaved spans table from the
  driver-provided flat ``documents.parquet`` entirely with JVM-side column
  expressions (no Python row loop), for ``__spark_entry__`` queries.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf2pdfocr_spark.schema import DOCUMENTS_META_SCHEMA, PagePayload

A4_W, A4_H = 2480, 3508  # px at 300 dpi

CLASSES = (
    "image_only",
    "mixed",
    "native_text",
    "multi_column",
    "blank_pages",
    "rotated",
    "skewed",
    "ligatures",
    "empty_words",
    "line_fallback",
    "tiny",
    "corrupt",
    "encrypted",
)

_NATIVE_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform"
).split()


def _image_span(rng: random.Random, offset: int, cls: str) -> dict:
    layout = "single"
    n_colors = 2 + rng.randrange(200)
    rotation = 0
    skew = 0.0
    if cls == "multi_column":
        layout = "multi_column"
    elif cls == "ligatures":
        layout = "ligatures"
    elif cls == "empty_words":
        layout = "empty_words"
    elif cls == "line_fallback":
        layout = "line_fallback"
    elif cls == "blank_pages" and offset % 2 == 1:
        n_colors = 1  # blank page (pdf2pdfocr.py:1011-1016)
    elif cls == "rotated":
        rotation = rng.choice((90, 180, 270))
    elif cls == "skewed":
        skew = round(0.5 + rng.random() * 4.0, 2)
    payload = PagePayload(
        width_px=A4_W,
        height_px=A4_H,
        dpi=300,
        n_colors=n_colors,
        rotation=rotation,
        skew_pct=skew,
        layout=layout,
        hocr_seed=rng.randrange(1, 2**31),
    )
    ref = payload.to_ref()
    if cls == "corrupt" and offset == 0:
        ref = "sim://CORRUPTED"  # unreadable payload → quarantine (1169-1175)
    return {"kind": "image", "text": "", "media_ref": ref, "offset": offset}


def _text_span(rng: random.Random, offset: int) -> dict:
    n = 4 + rng.randrange(12)
    txt = " ".join(rng.choice(_NATIVE_VOCAB) for _ in range(n))
    return {"kind": "text", "text": txt, "media_ref": "", "offset": offset}


def synth_document(doc_id: str, cls: str, seed: int, n_pages: int | None = None) -> dict:
    """One deterministic document row of the given corpus class."""
    rng = random.Random((seed, cls, doc_id).__repr__())
    if n_pages is None:
        n_pages = 1 if cls == "tiny" else 2 + rng.randrange(4)
    spans = []
    for i in range(n_pages):
        if cls == "native_text":
            spans.append(_text_span(rng, i))
        elif cls == "mixed":
            spans.append(
                _text_span(rng, i) if i % 2 == 0 else _image_span(rng, i, cls)
            )
        else:
            spans.append(_image_span(rng, i, cls))
    meta = {"producer": "synth-corpus", "class": cls}
    if cls == "encrypted":
        meta["encrypted"] = "true"
    return {"doc_id": doc_id, "spans": spans, "meta": meta}


def synth_documents(
    n_docs: int,
    seed: int = 42,
    classes: tuple = CLASSES,
    huge_doc_pages: int = 1000,
    huge_doc_every: int = 0,
) -> list:
    """Deterministic corpus; optionally inject huge docs (page-count power
    law / skew axis, SURVEY.md §7 step 5) every ``huge_doc_every`` docs."""
    rows = []
    for i in range(n_docs):
        cls = classes[i % len(classes)]
        n_pages = None
        if huge_doc_every and i % huge_doc_every == huge_doc_every - 1:
            cls, n_pages = "image_only", huge_doc_pages
        rows.append(synth_document(f"doc-{i:09d}", cls, seed, n_pages))
    return rows


def corpus_df(spark: SparkSession, rows: list, partitions: int = 8) -> DataFrame:
    return spark.createDataFrame(rows, schema=DOCUMENTS_META_SCHEMA).repartition(
        partitions, "doc_id"
    )


def write_corpus(
    spark: SparkSession, path: str, n_docs: int, seed: int = 42,
    buckets: int = 16, **kw,
) -> None:
    """Write an Iceberg-style layout: parquet partitioned by a doc_id hash
    bucket (Iceberg `bucket(doc_id)` transform analog — real deploys use
    `writeTo(tbl).append()`; the sandbox image has no Iceberg jars)."""
    df = corpus_df(spark, synth_documents(n_docs, seed, **kw))
    (
        df.withColumn("doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)))
        .write.mode("overwrite")
        .partitionBy("doc_bucket")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Interleaved spans derived from the driver's flat documents.parquet —
# pure column expressions, fully JVM-side (no Python loop), so the same
# derivation holds at 100 TB.
# ---------------------------------------------------------------------------

def documents_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id:int64, text, lang, source, n_chars) → input_hint shape.

    Each flat doc becomes an interleaved document: its text is split into
    sentence-ish chunks that alternate with deterministic synthetic image
    pages (media_ref encodes a seed derived from doc_id), giving the 'mixed'
    corpus class over driver data.
    """
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    # chunk the word array into text spans of 12 words
    n_chunks = F.greatest(F.lit(1), F.ceil(F.size(words) / F.lit(12)).cast("int"))
    chunk_txt = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 12 + 1, 12)),
    )
    # md5-derived seed (NOT xxhash64): reproducible from pure Python
    # (tools/gen_goldens.py) and from DuckDB, so the flagship pipeline gets
    # an engine-independent golden oracle
    seed = (
        F.pmod(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"),
            F.lit(2**31 - 1),
        )
        + F.lit(1)
    )
    media_ref = F.format_string(
        "sim://w=%d;h=%d;dpi=300;colors=17;rot=0;skew=0.0;layout=single;seed=%d",
        F.lit(A4_W), F.lit(A4_H), seed + F.lit(7),
    )
    # interleave: text chunk i at offset 2i, an image page at offset 2i+1
    spans = F.flatten(
        F.transform(
            chunk_txt,
            lambda t, i: F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    t.alias("text"),
                    F.lit("").alias("media_ref"),
                    (i * 2).cast("int").alias("offset"),
                ),
                F.struct(
                    F.lit("image").alias("kind"),
                    F.lit("").alias("text"),
                    media_ref.alias("media_ref"),
                    (i * 2 + 1).cast("int").alias("offset"),
                ),
            ),
        )
    )
    # two-step select: putting the formatted doc_id alias in the SAME select
    # as `spans` would make spans' inner F.col("doc_id") resolve to the
    # LATERAL column alias (the 'doc-%09d' string) instead of the raw int —
    # silently changing every md5-derived seed
    return raw.select(F.col("doc_id").alias("raw_doc_id"), spans.alias("spans")).select(
        F.format_string("doc-%09d", F.col("raw_doc_id")).alias("doc_id"),
        "spans",
        F.create_map(
            F.lit("producer"), F.lit("testdata"), F.lit("class"), F.lit("mixed")
        ).alias("meta"),
    )
