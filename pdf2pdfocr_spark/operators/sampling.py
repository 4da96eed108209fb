"""Deterministic sampling + shard packing — the selection/layout half of a
training-data pipeline (beside dedup/quality in this package): pick a
reproducible subset per stratum, then pack what survives into token-budgeted
shards for the trainer.

Both operators are pure column expressions over one window each, and both
are deliberately HASH-deterministic (md5-derived order), never `rand()`:
re-running the pipeline on the same corpus yields byte-identical samples and
shards, which is what makes training-data builds auditable. The md5-based
order is also reproducible in DuckDB, so both ship with cross-engine
oracles (plans/entry_queries.py).

Scale notes (100 TB):
* stratified_sample: one shuffle on the stratum key; the per-stratum sort is
  windowed (no global order). Skewed strata are fine — row_number stops
  consuming after k, and AQE splits oversized partitions.
* pack_shards: a GLOBAL running sum would serialize on one partition — the
  packer instead hash-buckets documents (``buckets`` ≈ shard-writer
  parallelism) and packs each bucket independently; shard identity is
  (bucket, shard_in_bucket). Each bucket's running sum is a window over
  that bucket only. Shards straddle nothing: a document belongs to exactly
  one shard, oversized documents occupy their own shard span (documented
  greedy-boundary semantics below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_long(col):
    """First 8 md5 hex chars → BIGINT (the cross-engine hash; identical in
    DuckDB as CAST('0x' || substr(md5(x),1,8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``k`` rows per stratum, chosen by md5-hash rank of the id —
    a deterministic uniform-ish sample (every id competes by an order
    uncorrelated with ingestion order, unlike LIMIT; reproducible across
    runs and engines, unlike rand()). Ties broken by id. Adds ``_rank``
    (1-based within stratum) for downstream proportional subsetting."""
    h = _md5_long(F.concat_ws("|", F.col(strata_col), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .withColumn("_rank", F.col("_rank").cast("int"))
    )


def pack_shards(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """Assign every document to a token-budgeted shard:
    (bucket, shard, doc_id, n_tokens).

    Greedy sequential packing per hash bucket: documents ordered by id
    within their bucket; a document goes to shard
    ``floor(preceding_token_sum / budget)`` — so a shard accumulates docs
    until the budget is crossed, and a document LARGER than the budget
    occupies its own shard index span (subsequent shard ids may skip —
    shard numbering is stable, not dense). Exclusive (preceding) sum, not
    inclusive: the first doc of a bucket always lands in shard 0 and a
    shard's first doc never overflows it retroactively.
    """
    bucket = F.pmod(_md5_long(F.col(id_col).cast("string")), F.lit(buckets)).cast("int")
    out = df.withColumn("bucket", bucket)
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    preceding = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    return out.withColumn(
        "shard", F.floor(preceding / F.lit(budget)).cast("int")
    )
