"""Generate golden-parquet oracles for the non-SQL-expressible queries.

Run:  python tools/gen_goldens.py   (writes /root/repo/golden/*.parquet)

* ``flagship_sf{X}.parquet`` — the flagship OCR-to-spans summary computed by
  the PURE-PYTHON single-document oracle (pdf2pdfocr_spark.oracle), over the
  interleaved documents derived from the driver's flat documents.parquet.
  The derivation below reimplements corpus.documents_from_testdata without
  Spark (md5-based seed, 12-word chunking) so the golden is produced by a
  fully independent execution path; tests/test_goldens.py asserts the Spark
  pipeline matches it, and the driver's DuckDB oracle scans it.
* ``multimodal_features.parquet`` — the expected feature summary for
  multimodal.synth_media(n=30), computed by a from-scratch numpy
  reimplementation of the fake-decode + feature kernels (no imports from
  pdf2pdfocr_spark.operators.multimodal).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")

A4_W, A4_H = 2480, 3508


# ---------------------------------------------------------------------------
# flagship: pure-Python documents_from_testdata + oracle.extract_corpus
# ---------------------------------------------------------------------------

def derive_interleaved_docs(sf_dir: str) -> list:
    """Pure-Python mirror of corpus.documents_from_testdata: text split on
    single spaces (empties preserved, like F.split(text, ' ')), 12-word
    chunks, one synthetic image page after each chunk, md5-derived seed."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        words = (text or "").split(" ")
        n_chunks = max(1, math.ceil(len(words) / 12))
        seed = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            % (2**31 - 1)
        ) + 1
        media_ref = (
            f"sim://w={A4_W};h={A4_H};dpi=300;colors=17;rot=0;skew=0.0;"
            f"layout=single;seed={seed + 7}"
        )
        spans = []
        for i in range(n_chunks):
            spans.append(
                {
                    "kind": "text",
                    "text": " ".join(words[i * 12:(i + 1) * 12]),
                    "media_ref": "",
                    "offset": 2 * i,
                }
            )
            spans.append(
                {
                    "kind": "image",
                    "text": "",
                    "media_ref": media_ref,
                    "offset": 2 * i + 1,
                }
            )
        out.append(
            {
                "doc_id": f"doc-{doc_id:09d}",
                "spans": spans,
                "meta": {"producer": "testdata", "class": "mixed"},
            }
        )
    return out


def flagship_golden_rows(sf_dir: str) -> list:
    from pdf2pdfocr_spark.oracle import PipelineConfig, extract_corpus

    docs = derive_interleaved_docs(sf_dir)
    res = extract_corpus(docs, PipelineConfig())
    rows = []
    for doc_id in sorted(res):
        r = res[doc_id]
        assert r["skip_reason"] is None, (doc_id, r["skip_reason"])
        rows.append(
            {
                "doc_id": doc_id,
                "n_spans": len(r["spans"]),
                "n_pages": r["n_pages"],
                "text_hash": hashlib.md5(r["doc_text"].encode()).hexdigest(),
            }
        )
    return rows


def write_flagship(sf: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = flagship_golden_rows(f"/root/testdata/sf{sf}")
    tbl = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "n_spans": pa.array([r["n_spans"] for r in rows], pa.int64()),
            "n_pages": pa.array([r["n_pages"] for r in rows], pa.int64()),
            "text_hash": pa.array([r["text_hash"] for r in rows], pa.string()),
        }
    )
    path = os.path.join(GOLDEN_DIR, f"flagship_sf{sf}.parquet")
    pq.write_table(tbl, path)
    print(f"wrote {path} ({len(rows)} rows)")


# ---------------------------------------------------------------------------
# multimodal: independent numpy reimplementation of the feature kernel
# ---------------------------------------------------------------------------

def _round_half_up(x: float, digits: int) -> float:
    # Spark's F.round(double) = BigDecimal.valueOf(d).setScale(n, HALF_UP),
    # i.e. HALF_UP on the SHORTEST decimal repr — Decimal(repr(x)) matches
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def multimodal_golden_rows(n: int = 30, seed: int = 7) -> list:
    import random

    import numpy as np

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64))

        digest = hashlib.sha256(payload).digest()
        g = np.random.default_rng(int.from_bytes(digest[:8], "big") % (2**32))
        n_frames = None
        if mt == "image":
            arr = g.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
            ys = (np.arange(16) * 32 / 16).astype(int)
            xs = (np.arange(16) * 32 / 16).astype(int)
            small = arr[ys][:, xs]
            chunks = np.array_split(small.astype(np.float64).ravel(), 8)
            feats = [float(c.mean()) for c in chunks]
        elif mt == "audio":
            arr = (g.standard_normal(16_000) * 0.1).astype(np.float32)
            bands = np.array_split(arr.astype(np.float64), 8)
            feats = [float(np.sqrt((b**2).mean())) for b in bands]
        else:
            arr = g.integers(0, 256, size=(8, 16, 16, 3), dtype=np.uint8)
            idx = np.linspace(0, 7, num=4).astype(int)
            frames = arr[idx]
            n_frames = int(frames.shape[0])
            means = frames.astype(np.float64).reshape(frames.shape[0], -1).mean(axis=1)
            pad = np.zeros(8)
            pad[: len(means)] = means[:8]
            feats = [float(x) for x in pad]

        # the Spark column stores features as float32; the entry query sums
        # the float32 values promoted back to double, in array order
        total = 0.0
        for v in feats:
            total += float(np.float32(v))
        rows.append(
            {
                "media_id": f"m-{i:06d}",
                "media_type": mt,
                "n_frames_sampled": n_frames,
                "error": None,
                "feature_sum": _round_half_up(total, 4),
            }
        )
    return rows


def write_multimodal() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = multimodal_golden_rows()
    tbl = pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.string()),
            "media_type": pa.array([r["media_type"] for r in rows], pa.string()),
            "n_frames_sampled": pa.array(
                [r["n_frames_sampled"] for r in rows], pa.int32()
            ),
            "error": pa.array([r["error"] for r in rows], pa.string()),
            "feature_sum": pa.array(
                [r["feature_sum"] for r in rows], pa.float64()
            ),
        }
    )
    path = os.path.join(GOLDEN_DIR, "multimodal_features.parquet")
    pq.write_table(tbl, path)
    print(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf in ("0.001", "0.01"):
        write_flagship(sf)
    write_multimodal()
