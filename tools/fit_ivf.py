#!/usr/bin/env python
"""Fit the IVF coarse quantizer on the sf0.01 embeddings table and commit
the centroids as a JSON artifact (the "trained model" a real deploy ships).

The entry query ``sim_ivf_kmeans_topk`` and its DuckDB oracle both inline
these centroids as literals, so the cross-engine check covers the FITTED
quantizer path end-to-end. Regenerate after changing the k-means code:

    python tools/fit_ivf.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CELLS = 8
SAMPLE_N = 10_000
SEED = 7
SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf2pdfocr_spark", "data", "ivf_centroids_sf001.json",
)


def main() -> None:
    from pdf2pdfocr_spark.operators import similarity
    from pdf2pdfocr_spark.pipeline import build_spark

    spark = build_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = similarity.fit_ivf_centroids(
        emb, n_cells=N_CELLS, sample_n=SAMPLE_N, seed=SEED
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(
            {
                "n_cells": N_CELLS,
                "sample_n": SAMPLE_N,
                "seed": SEED,
                "fit_table": f"{SF_DIR}/embeddings.parquet",
                "centroids": centroids,
            },
            f,
        )
    print(f"wrote {len(centroids)} centroids -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
