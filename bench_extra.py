#!/usr/bin/env python
"""Per-leg isolation bench + plan capture (optimization guide §1.1/§1.4).

NOT part of the driver's measurement surface — ``bench.py`` is frozen for
that. This harness exists so each optimization round can (a) time ONE query
at a time against the noop sink (so the computation is measured, not the
sink), (b) dump ``.explain("formatted")`` for the judge's plan evidence
(``plans/rNN/<query>_{before,after}.txt``), and (c) time the dedup job's
stages in isolation.

Usage examples::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        --queries tpch_q1_agg,sim_knn_join --reps 3
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        --queries dedup_simhash --explain-dir plans/r07 --suffix _before
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py --dedup-job
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py --ann

Prints one JSON line with per-leg median seconds (median of ``--reps`` after
one untimed warm-up, mirroring bench.py's methodology so numbers are
comparable leg-for-leg).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness: session builder + leg helpers reused


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--queries", default="", help="comma-separated names")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--explain-dir", default=None)
    p.add_argument("--suffix", default="", help="e.g. _before / _after")
    p.add_argument("--dedup-job", action="store_true")
    p.add_argument("--ann", action="store_true")
    p.add_argument("--explain-only", action="store_true")
    args = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench.build_session(cores)

    out: dict = {"sf_dir": sf_dir, "cores": cores, "reps": args.reps}

    if args.queries:
        import __spark_entry__ as entry

        queries = entry.queries()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()
        for name in args.queries.split(","):
            name = name.strip()
            df = queries[name](spark, sf_dir)
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                path = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
                with open(path, "w") as f:
                    f.write(_explain_str(df))
                print(f"# wrote {path}", file=sys.stderr)
            if args.explain_only:
                continue
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")

            def _run():
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

            _run()  # warm-up
            secs = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _run()
                secs.append(time.perf_counter() - t0)
            out[name] = round(statistics.median(secs), 3)
            print(f"# {name}: {out[name]} {[round(s,3) for s in secs]}",
                  file=sys.stderr)

    if args.dedup_job:
        out.update(bench.run_dedup_job_leg(spark, sf_dir, args.reps))

    if args.ann:
        out.update(bench.run_ann_pruning_leg(spark, args.reps))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
