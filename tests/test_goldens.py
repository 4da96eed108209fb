"""The committed golden parquets (golden/) are real oracles: the Spark
pipeline must reproduce them, and they must be regenerable by the
independent pure-Python path (tools/gen_goldens.py)."""

import duckdb

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _read_golden(path):
    return duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{path}')"
    ).fetchall()


def test_flagship_matches_committed_golden(spark):
    got = {
        r["doc_id"]: (r["n_spans"], r["n_pages"], r["text_hash"])
        for r in entry_mod.queries()["flagship_extract_spans"](spark, SF_DIR).collect()
    }
    want = {
        doc_id: (n_spans, n_pages, text_hash)
        for doc_id, n_spans, n_pages, text_hash in _read_golden(
            "/root/repo/golden/flagship_sf0.001.parquet"
        )
    }
    assert got == want


def test_multimodal_matches_committed_golden(spark):
    got = {
        r["media_id"]: (
            r["media_type"], r["n_frames_sampled"], r["error"], r["feature_sum"]
        )
        for r in entry_mod.queries()["multimodal_features"](spark, SF_DIR).collect()
    }
    want = {
        mid: (mt, nf, err, fs)
        for mid, mt, nf, err, fs in _read_golden(
            "/root/repo/golden/multimodal_features.parquet"
        )
    }
    assert got == want


def test_generator_reproduces_committed_goldens():
    """Regen drift check: the pure-Python generator, run now, must agree
    with what is committed (guards against silent semantic drift between
    pipeline changes and stale goldens)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import gen_goldens as g

    rows = g.multimodal_golden_rows()
    committed = _read_golden("/root/repo/golden/multimodal_features.parquet")
    assert [
        (r["media_id"], r["media_type"], r["n_frames_sampled"], r["error"],
         r["feature_sum"])
        for r in rows
    ] == committed

    fl = g.flagship_golden_rows(SF_DIR)
    committed_fl = _read_golden("/root/repo/golden/flagship_sf0.001.parquet")
    assert [
        (r["doc_id"], r["n_spans"], r["n_pages"], r["text_hash"]) for r in fl
    ] == committed_fl
