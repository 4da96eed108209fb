"""ANN partition pruning + fitted-quantizer recall (round-2 verdict #6/#7).

At 100 TB the ANN win IS the pruning: an embeddings table written
partitioned by ``lsh_bucket`` / ``ivf_cell`` must let a probe read ONLY the
probe partitions. These tests materialize the partitioned tables, run the
UNCHANGED topk operators over them, and assert (a) at the plan level that
the scan carries a partition filter on the bucket column, and (b) at the
execution level — ``input_file_name()`` — that only probe-partition files
are touched. Plus: sampled-k-means centroids beat the seeded-random
quantizer on clustered embeddings at equal nprobe.
"""

import io
import random
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pdf2pdfocr_spark.operators import similarity

DIM = 8


def _emb_df(spark, n=400, seed=11):
    rng = random.Random(seed)
    rows = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(DIM)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _files_read(df) -> set:
    return {
        r["f"]
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    }


def test_lsh_probe_prunes_partitions(spark, tmp_path):
    emb = _emb_df(spark)
    planes = similarity.hyperplanes(DIM, 4, seed=42)  # 16 buckets
    path = str(tmp_path / "emb_lsh")
    similarity.write_lsh_partitioned(emb, planes, path)
    tbl = similarity.read_lsh_partitioned(spark, path, planes)

    qvec = [1.0] * DIM
    probes = similarity.lsh_query_probes(qvec, planes, probe_hamming=1)
    topk = similarity.lsh_ann_topk(tbl, qvec, planes, k=5, probe_hamming=1)

    # (a) plan: the parquet scan has a PartitionFilters entry on lsh_bucket
    plan = _plan_of(topk)
    assert "PartitionFilters" in plan and "lsh_bucket" in plan

    # (b) execution: the probed scan touches ONLY probe-partition files,
    # and strictly fewer partitions than exist
    probed_scan = tbl.filter(F.col("lsh_bucket").isin(*probes))
    files = _files_read(probed_scan)
    assert files and all(
        any(f"lsh_bucket={p}/" in f for p in probes) for f in files
    )
    all_parts = {
        r["lsh_bucket"] for r in tbl.select("lsh_bucket").distinct().collect()
    }
    assert len(all_parts) > len(
        {p for p in probes if any(f"lsh_bucket={p}/" in f for f in files)}
    )

    # (c) results over the partitioned table == results computed from raw
    # vectors (the trusted partition column is consistent with recompute)
    raw = similarity.lsh_ann_topk(emb, qvec, planes, k=5, probe_hamming=1)
    assert [tuple(r) for r in topk.collect()] == [tuple(r) for r in raw.collect()]


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    emb = _emb_df(spark)
    cents = similarity.ivf_centroids(DIM, 8, seed=7)
    path = str(tmp_path / "emb_ivf")
    similarity.write_ivf_partitioned(emb, cents, path)
    tbl = similarity.read_ivf_partitioned(spark, path, cents)

    qvec = [1.0] * DIM
    cells = similarity.ivf_probe_cells(qvec, cents, nprobe=2)
    topk = similarity.ivf_topk(tbl, qvec, cents, nprobe=2, k=5)

    plan = _plan_of(topk)
    assert "PartitionFilters" in plan and "ivf_cell" in plan

    probed_scan = tbl.filter(F.col("ivf_cell").isin(*cells))
    files = _files_read(probed_scan)
    assert files and all(
        any(f"ivf_cell={c}/" in f for c in cells) for f in files
    )
    all_parts = {
        r["ivf_cell"] for r in tbl.select("ivf_cell").distinct().collect()
    }
    assert len(cells) < len(all_parts)

    raw = similarity.ivf_topk(emb, qvec, cents, nprobe=2, k=5)
    assert [tuple(r) for r in topk.collect()] == [tuple(r) for r in raw.collect()]


def test_ann_fingerprint_rejects_mismatched_planes(spark, tmp_path):
    """ADVICE r3: probing a partitioned table with DIFFERENT planes than it
    was written with must fail loudly — with_lsh_bucket trusts an existing
    bucket column (that's what makes pruning work), so the sidecar
    fingerprint is the guard against silently wrong neighbors."""
    import pytest

    emb = _emb_df(spark, n=50)
    planes = similarity.hyperplanes(DIM, 4, seed=42)
    other = similarity.hyperplanes(DIM, 4, seed=99)
    path = str(tmp_path / "emb_lsh_fp")
    similarity.write_lsh_partitioned(emb, planes, path)

    # matching planes: opens fine
    assert similarity.read_lsh_partitioned(spark, path, planes).count() == 50
    # mismatched planes: refused
    with pytest.raises(ValueError, match="different quantizer"):
        similarity.read_lsh_partitioned(spark, path, other)
    # a bare parquet dir with no sidecar: refused too
    emb.write.mode("overwrite").parquet(str(tmp_path / "bare"))
    with pytest.raises(ValueError, match="no ANN fingerprint"):
        similarity.read_lsh_partitioned(spark, str(tmp_path / "bare"), planes)


def _clustered(spark, n_clusters=6, per=80, sigma=0.3, dim=16, seed=5):
    """Gaussian clusters around random unit centers — embeddings with real
    structure, where a data-independent quantizer splits clusters across
    cells but a fitted one doesn't."""
    rng = random.Random(seed)
    centers = []
    for _ in range(n_clusters):
        c = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        nrm = sum(x * x for x in c) ** 0.5
        centers.append([x / nrm for x in c])
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0.0, sigma) for x in c]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_centroids_beat_random_recall(spark):
    emb = _clustered(spark)
    dim, n_cells, nprobe, k = 16, 6, 1, 20
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])

    exact = {r["vec_id"] for r in
             similarity.cosine_topk(emb, qvec, k=k).collect()}

    fitted = similarity.fit_ivf_centroids(emb, n_cells=n_cells, sample_n=480)
    rand = similarity.ivf_centroids(dim, n_cells, seed=7)

    def recall(cents):
        got = {r["vec_id"] for r in
               similarity.ivf_topk(emb, qvec, cents, nprobe=nprobe, k=k).collect()}
        return len(got & exact) / k

    r_fit, r_rand = recall(fitted), recall(rand)
    assert r_fit > r_rand, (r_fit, r_rand)
    assert r_fit >= 0.9  # the fitted quantizer keeps the query's cluster whole


def test_fitted_artifact_matches_fit_params(spark):
    """The committed quantizer JSON must be reproducible from the fit fn on
    the table it says it was fit on (guards against stale artifacts)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pdf2pdfocr_spark", "data", "ivf_centroids_sf001.json",
    )
    with open(path) as f:
        art = json.load(f)
    emb = spark.read.parquet(art["fit_table"])
    refit = similarity.fit_ivf_centroids(
        emb, n_cells=art["n_cells"], sample_n=art["sample_n"], seed=art["seed"]
    )
    assert refit == art["centroids"]
