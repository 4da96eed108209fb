"""X2 salted repartition: page-count skew must not hot-spot a partition
(SURVEY.md §7 step 5 — the power-law axis)."""

from pyspark.sql import functions as F

from pdf2pdfocr_spark import corpus
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.pipeline import apply_gates, explode_pages, salted_repartition


def _page_counts_per_partition(spark, docs, num_partitions, salt_buckets):
    config = PipelineConfig(salt_buckets=salt_buckets)
    df = corpus.corpus_df(spark, docs, partitions=4)
    gated = apply_gates(df, config, None)
    pages = explode_pages(gated.filter(F.col("skip_reason").isNull()), config)
    salted = salted_repartition(pages, num_partitions, salt_buckets)
    return [
        r["n"]
        for r in salted.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_huge_doc_spreads_across_partitions(spark):
    # one 800-page doc among 1-page docs: without salt it lands on ONE
    # partition (a straggler 20× the median); with salt it must spread
    docs = corpus.synth_documents(40, classes=("tiny",))
    docs.append(corpus.synth_document("doc-huge", "image_only", seed=9, n_pages=800))

    unsalted = _page_counts_per_partition(spark, docs, 16, salt_buckets=1)
    salted = _page_counts_per_partition(spark, docs, 16, salt_buckets=256)

    assert max(unsalted) >= 800  # the pathology exists without salt
    total = sum(salted)
    assert total == sum(unsalted)  # row preservation
    # with fine-grained salt the hottest partition carries < 3× fair share
    # (the bound absorbs salt-key hash collisions across partitions)
    assert max(salted) < 3 * (total / 16)
