"""End-to-end chained training-data dedup job (round-3 verdict #7):
MinHash∪SimHash pairs → clusters → keep-one → sample → token-budget shards,
with overflow ledgers + per-stage metrics written next to lineage."""

from pyspark.sql import functions as F

from pdf2pdfocr_spark import jobs, lineage

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles slowly carry heavy wooden crates across the narrow stone "
    "bridge under a pale winter moon as distant bells ring softly"
)


def _fixture_docs(spark):
    rows = []
    # near-dup group {1,2,3}: one-word drift per variant (chain-ish)
    rows.append((1, BASE, "web"))
    rows.append((2, BASE.replace("quick", "swift"), "web"))
    rows.append((3, BASE.replace("quick", "swift").replace("lazy", "idle"), "book"))
    # exact-dup group {10,11}
    dup = (
        "colorless green ideas sleep furiously beneath the ancient copper "
        "dome where forgotten machines hum their endless binary lullaby "
        "to rows of dusty terminals awaiting one final instruction"
    )
    rows.append((10, dup, "book"))
    rows.append((11, dup, "web"))
    # distinct docs 20-25: disjoint vocabularies
    uniques = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",
        "uno dos tres cuatro cinco seis siete ocho nueve diez once "
        "doce trece catorce quince dieciseis diecisiete dieciocho",
        "north south east west summit valley river ocean desert tundra "
        "prairie canyon glacier plateau archipelago peninsula isthmus",
        "violin cello oboe clarinet bassoon trumpet trombone tuba harp "
        "timpani celesta piccolo contrabass marimba vibraphone",
        "enzyme protein ribosome mitochondria nucleus chromosome lipid "
        "membrane cytoplasm vacuole chloroplast organelle peptide",
        "voltage current resistance capacitance inductance impedance "
        "frequency amplitude waveform oscillator transistor diode",
    ]
    for i, txt in enumerate(uniques):
        rows.append((20 + i, txt, "web" if i % 2 == 0 else "book"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dedup_job_end_to_end(spark, tmp_path):
    out = str(tmp_path / "dedup_out")
    docs = _fixture_docs(spark)
    metrics = jobs.run_dedup_job(
        spark, docs, out, "run-d1", shard_budget=60, shard_buckets=2
    )

    # clusters: {1,2,3}→1, {10,11}→10 (min-id representative)
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in spark.read.parquet(f"{out}/clusters").collect()
    }
    assert clusters[1] == 1 and clusters[2] == 1 and clusters[3] == 1
    assert clusters[10] == 10 and clusters[11] == 10
    assert not any(d >= 20 for d in clusters)  # distinct docs never pair

    # keep-one: reps + all unpaired docs survive
    shard_rows = spark.read.parquet(f"{out}/shards").collect()
    kept_ids = sorted(r["doc_id"] for r in shard_rows)
    assert kept_ids == [1, 10, 20, 21, 22, 23, 24, 25]  # each exactly once

    # shard packing: per-(bucket, shard) token sums respect the greedy
    # budget rule — a shard's preceding-sum boundary means every shard
    # except possibly the last-started one stays under budget + one doc
    by_shard = {}
    for r in shard_rows:
        by_shard.setdefault((r["bucket"], r["shard"]), []).append(r["n_tokens"])
    for (_b, _s), toks in by_shard.items():
        # exclusive preceding sum: first doc always fits; total ≤ budget
        # plus the doc that crossed the boundary
        assert sum(toks) <= 60 + max(toks)

    # metrics ledger: per-stage counts incl. overflow visibility (r3 #8)
    m = {
        r["stage"]: r["n"]
        for r in lineage.read_metrics(spark, out).collect()
    }
    assert m["docs_in"] == 11
    assert m["docs_dropped"] == 3 and m["docs_kept"] == 8
    assert m["docs_sampled"] == 8 and m["dup_pairs"] >= 3
    assert m["minhash_overflow_buckets"] == 0
    assert m["simhash_overflow_buckets"] == 0
    assert m["shards"] == len(by_shard)
    assert metrics["docs_kept"] == 8

    # overflow ledgers exist (empty here — caps not hit on this corpus)
    assert spark.read.parquet(f"{out}/ledgers/minhash_overflow").count() == 0
    assert spark.read.parquet(f"{out}/ledgers/simhash_overflow").count() == 0


def test_dedup_job_stratified_sampling(spark, tmp_path):
    """sample_k bounds survivors per stratum AFTER keep-one."""
    out = str(tmp_path / "dedup_sample_out")
    docs = _fixture_docs(spark)
    jobs.run_dedup_job(
        spark, docs, out, "run-d2", sample_k=2, strata_col="source",
        shard_budget=60, shard_buckets=2,
    )
    shards = spark.read.parquet(f"{out}/shards")
    per = {
        r["source"]: r["n"]
        for r in shards.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per and all(n <= 2 for n in per.values())


def test_dedup_job_custom_id_col(spark, tmp_path):
    """ADVICE r4: id_col != 'doc_id' must work end-to-end — the clusters
    frame always emits (doc_id, cluster_id), renamed before the keep-one
    anti-join."""
    out = str(tmp_path / "dedup_idcol_out")
    docs = _fixture_docs(spark).withColumnRenamed("doc_id", "docid")
    metrics = jobs.run_dedup_job(
        spark, docs, out, "run-d3", id_col="docid",
        shard_budget=60, shard_buckets=2,
    )
    assert metrics["docs_kept"] == 8
    kept = sorted(
        r["docid"] for r in spark.read.parquet(f"{out}/shards").collect()
    )
    assert kept == [1, 10, 20, 21, 22, 23, 24, 25]


def test_dedup_job_single_signature_pass(spark, tmp_path, monkeypatch):
    """Round-4 verdict #3: the job computes each signature frame (minhash
    bands / simhash chunks — the two most expensive stages) exactly ONCE,
    shared between the capped candidate join and its overflow ledger."""
    from pdf2pdfocr_spark.operators import dedup as d

    calls = {"band": 0, "chunk": 0}
    orig_band, orig_chunk = d.minhash_band_rows, d.simhash_chunk_rows

    def band_spy(*a, **k):
        calls["band"] += 1
        return orig_band(*a, **k)

    def chunk_spy(*a, **k):
        calls["chunk"] += 1
        return orig_chunk(*a, **k)

    monkeypatch.setattr(d, "minhash_band_rows", band_spy)
    monkeypatch.setattr(d, "simhash_chunk_rows", chunk_spy)
    jobs.run_dedup_job(
        spark, _fixture_docs(spark), str(tmp_path / "o"), "run-sp",
        shard_budget=60, shard_buckets=2,
    )
    assert calls == {"band": 1, "chunk": 1}


def test_overflow_reuses_persisted_signature_frame(spark):
    """Plan-level half of the single-pass contract: an overflow ledger fed
    the persisted signature frame reads the cache (InMemoryTableScan), not
    a fresh source scan + re-hash."""
    import io
    from contextlib import redirect_stdout

    from pdf2pdfocr_spark.operators import dedup as d

    docs = _fixture_docs(spark)
    band = d.minhash_band_rows(docs).persist()
    try:
        band.count()  # materialize the cache
        over = d.minhash_band_overflow(docs, band_rows=band, bucket_cap=1)
        buf = io.StringIO()
        with redirect_stdout(buf):
            over.explain("formatted")
        assert "InMemoryTableScan" in buf.getvalue()
    finally:
        band.unpersist()


def test_dedup_job_cli(spark, tmp_path):
    """--job dedup drives the chained flow through the spark-submit CLI."""
    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "cli_out")
    _fixture_docs(spark).write.parquet(inp)
    jobs.main([
        "--input", inp, "--output", out, "--run-id", "run-cli",
        "--job", "dedup", "--shard-budget", "60", "--shard-buckets", "2",
    ])
    assert spark.read.parquet(f"{out}/shards").count() == 8


def test_dedup_job_stage_timings(spark, tmp_path):
    """Round-5 verdict #4: the bench leg's dedup_job wall must be
    attributable — stage_timings collects one wall per stage, every value
    positive, and results are identical to a run without the hook."""
    out = str(tmp_path / "dedup_timed")
    docs = _fixture_docs(spark)
    st: dict = {}
    metrics = jobs.run_dedup_job(
        spark, docs, out, "run-t1", shard_budget=60, shard_buckets=2,
        stage_timings=st,
    )
    assert sorted(st) == sorted(
        ["signatures", "pairs", "cc", "keep_pack", "ledgers", "counts"]
    )
    assert all(v > 0 for v in st.values())

    # the timing barriers must not change the job's results
    out2 = str(tmp_path / "dedup_plain")
    plain = jobs.run_dedup_job(
        spark, docs, out2, "run-t1", shard_budget=60, shard_buckets=2
    )
    assert {k: v for k, v in metrics.items() if k != "run_id"} == {
        k: v for k, v in plain.items() if k != "run_id"
    }
