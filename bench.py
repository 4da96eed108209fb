#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) plus the
flagship extraction pipeline over a deterministic synthetic corpus, and
prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

Scaling mode (``--scaling``): runs the identical flagship job at two
parallelism levels (local[8] = N, local[32] = 4N) in separate JVMs on the
same input and writes docs/sec + scaling efficiency to BENCH/BASELINE.md
(the sandbox protocol for the north_rule's N→4N ≥0.8 criterion; see
BASELINE.md "Measurement protocol").
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "tpch_q1_agg",
    "r1_ordered_concat",
    "r3_merge_join",
    "topk_per_group",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_knn_join",
    "h7_render_geometry",
    "text_quality",
    "text_fingerprint",
    "sample_stratified",
    "pack_shards",
)

BENCH_DOCS = 20_000      # default-mode flagship corpus (fast per-round run)
# scaling-mode corpus: sized so the N run is ≥ 3 min — per-job fixed costs
# (stage scheduling, worker handshakes) drop under ~2 % of wall at BOTH
# levels, which is what a long-lived cluster job actually amortizes to, and
# sandbox CPU noise averages out within a rep
SCALING_DOCS = 200_000
HUGE_EVERY = 100
HUGE_PAGES = 120
CORPUS_ROOT = "/tmp/spark_graft_bench_corpus"


def build_session(cores: int):
    from pdf2pdfocr_spark.pipeline import build_spark

    # 3 tasks per core: page batches are uneven (power-law page counts), so a
    # single wave of core-sized tasks idles cores at every stage tail
    spark = build_spark(
        app=f"bench-local{cores}", master=f"local[{cores}]",
        shuffle_partitions=3 * max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def corpus_path(n_docs: int) -> str:
    return f"{CORPUS_ROOT}_{n_docs}d"


def prepare_corpus(spark, n_docs: int) -> str:
    """Write the deterministic bench corpus once (Iceberg-style bucketed
    parquet); benchmark runs then measure the production shape scan→extract,
    not driver-side synthesis."""
    import os

    path = corpus_path(n_docs)
    if os.path.exists(f"{path}/_BENCH_READY"):
        return path
    from pdf2pdfocr_spark import corpus

    # chunked synth keeps driver memory flat for large corpora
    chunk = 20_000
    mode = "overwrite"
    for start in range(0, n_docs, chunk):
        rows = []
        for i in range(start, min(start + chunk, n_docs)):
            huge = HUGE_EVERY and i % HUGE_EVERY == HUGE_EVERY - 1
            rows.append(
                corpus.synth_document(
                    f"doc-{i:09d}",
                    "image_only" if huge else corpus.CLASSES[i % len(corpus.CLASSES)],
                    seed=42,
                    n_pages=HUGE_PAGES if huge else None,
                )
            )
        corpus.corpus_df(spark, rows, partitions=32).write.mode(mode).parquet(path)
        mode = "append"
    open(f"{path}/_BENCH_READY", "w").close()
    return path


def run_flagship(spark, n_docs: int) -> tuple:
    """Extraction pipeline docs/sec: parquet scan → gates → explode+salt →
    OCR → reassembly → count."""
    from pdf2pdfocr_spark.oracle import PipelineConfig
    from pdf2pdfocr_spark.pipeline import extract

    path = prepare_corpus(spark, n_docs)
    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    processed, _q = extract(docs, PipelineConfig())
    n_out = processed.count()
    dt = time.perf_counter() - t0
    return n_out, dt


BENCH_REPS = 3  # timed reps per query/flagship; headline = MEDIAN


def run_operator_queries(spark, sf_dir: str, reps: int = BENCH_REPS) -> dict:
    """Median-of-``reps`` per query after one untimed warm-up rep — round-2
    verdict: the single-rep bench contradicted the scaling campaign's
    steady-state numbers by 4× (JIT tiering + sandbox CPU noise); medians
    make round-over-round deltas attributable to code, not reps."""
    import statistics

    import __spark_entry__ as entry

    queries = entry.queries()
    # warm the JVM/codegen paths so the first timed query isn't charged
    # for session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()

    def _run(name):
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings = {}
    for name in HEADLINE:
        _run(name)  # untimed warm-up rep (codegen compile, shuffle files)
        secs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _run(name)
            secs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(secs), 3)
    return timings


def main_bench(args) -> None:
    import statistics

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    reps = max(args.reps, BENCH_REPS)
    spark = build_session(cores)

    timings = run_operator_queries(spark, sf_dir, reps)
    run_flagship(spark, args.n_docs)  # untimed warm-up: JIT + Python workers
    flag_secs, n_docs = [], 0
    for _ in range(reps):
        n_docs, dt = run_flagship(spark, args.n_docs)
        flag_secs.append(dt)
    dt = statistics.median(flag_secs)
    timings["flagship_extract"] = round(dt, 3)
    docs_per_sec = round(n_docs / dt, 2)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "flagship_docs": n_docs,
                "cores": cores,
                "reps": reps,
                "flagship_all_secs": [round(s, 3) for s in flag_secs],
            }
        )
    )
    spark.stop()


def main_corpus_only(args) -> None:
    """One flagship measurement at a fixed core count. A first untimed pass
    absorbs one-time JVM costs (tiered JIT of the large codegen'd emit
    expression, Python worker spawn) — measured effect: 122→75→38 s over
    three reps at 32 cores — so the timed passes report the steady-state
    throughput a long-lived cluster actually sees."""
    spark = build_session(args.cores)
    # two untimed warm-ups: the first also writes the corpus; the second
    # lets tiered JIT converge on the interpreted HOF evaluators (measured
    # 122→75→38 s over early reps at 32 cores) and pre-forks the Python
    # workers, so timed reps see the steady state a long-lived cluster runs
    run_flagship(spark, args.n_docs)
    run_flagship(spark, args.n_docs)
    secs = []
    for _ in range(args.reps):
        n_docs, dt = run_flagship(spark, args.n_docs)
        secs.append(round(dt, 3))
    # headline = MEDIAN of the timed reps (round-1 verdict: best-of is not
    # defensible under sandbox CPU noise)
    import statistics

    dt = statistics.median(secs)
    print(json.dumps({"cores": args.cores, "docs": n_docs, "sec": dt,
                      "docs_per_sec": round(n_docs / dt, 3), "all_secs": secs}))
    spark.stop()


def main_scaling(args) -> None:
    if args.n_docs == BENCH_DOCS:  # default → use the scaling-sized corpus
        args.n_docs = SCALING_DOCS
    args.reps = max(args.reps, 5)  # median needs ≥5 reps to be defensible
    results = {}
    for cores in (8, 32):
        cmd = [sys.executable, os.path.abspath(__file__), "--corpus-only",
               "--cores", str(cores), "--n-docs", str(args.n_docs),
               "--reps", str(args.reps)]
        if os.path.exists("/usr/bin/taskset"):
            # pin to exactly `cores` CPUs: an unpinned local[8] JVM borrows
            # the idle CPUs for GC/shuffle/daemon threads, inflating the
            # small-cluster number and understating scaling efficiency
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(
            cmd,
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)

    tp8, tp32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = round((tp32 / tp8) / 4.0, 3)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — scaling measurement (sandbox protocol)\n\n"
            "Same flagship extraction job (OCR-to-spans over the "
            f"{args.n_docs}-doc deterministic corpus, power-law page counts, "
            "1% huge docs) at two parallelism levels, per BASELINE.md's "
            "measurement protocol (N = local[8], 4N = local[32]). Runs are "
            "CPU-pinned via taskset; the headline wall is the MEDIAN of "
            f"{args.reps} timed reps after two untimed warm-ups (JIT "
            "convergence + Python worker pre-fork). The corpus is sized so "
            "per-job fixed costs are <2% of wall at both levels.\n\n"
            "| cores | docs | rep walls (s) | median wall (s) | docs/sec |\n"
            "|---|---|---|---|---|\n"
            f"| 8 (N) | {results[8]['docs']} | {results[8]['all_secs']} "
            f"| {results[8]['sec']} | {tp8} |\n"
            f"| 32 (4N) | {results[32]['docs']} | {results[32]['all_secs']} "
            f"| {results[32]['sec']} | {tp32} |\n\n"
            f"**Scaling efficiency = (throughput_4N / throughput_N) / 4 = {eff}**"
            f" (target ≥ 0.8)\n\n"
            f"Reproduce: `python bench.py --scaling --reps {args.reps}`.\n"
        )
    print(json.dumps({"metric": "scaling_efficiency", "value": eff,
                      "unit": "ratio", "queries": {}, "sf": 0,
                      "throughput_8": tp8, "throughput_32": tp32}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--corpus-only", action="store_true")
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--reps", type=int, default=1)
    p.add_argument("--n-docs", type=int, default=BENCH_DOCS)
    a = p.parse_args()
    if a.scaling:
        main_scaling(a)
    elif a.corpus_only:
        main_corpus_only(a)
    else:
        main_bench(a)
