"""Doc-quoted bench figures must match the newest shipped bench artifact
(round-5 verdict #2: hand-written numbers drifted from BENCH_r05)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import sync_bench_docs as sync  # noqa: E402


def test_docs_match_newest_bench_artifact(tmp_path):
    newest = sync.newest_bench_json()
    assert newest, "no BENCH_r*.json in repo root"
    # syncing against the newest artifact must be a no-op: the committed
    # docs already quote it
    assert sync.sync_from_file(newest) is False, (
        f"SCALE.md/README.md drifted from {newest}; "
        "run: python tools/sync_bench_docs.py"
    )


def test_sync_rewrites_on_new_numbers(tmp_path, monkeypatch):
    """End-to-end: a fresh artifact with different ANN numbers rewrites
    both marked regions, and re-syncing the ORIGINAL artifact restores the
    committed text byte-for-byte."""
    import shutil

    repo = str(tmp_path)
    for f in ("SCALE.md", "README.md"):
        shutil.copy(os.path.join(sync.REPO, f), os.path.join(repo, f))

    fake = {"queries": {"ann_probe_unpartitioned": 12.0,
                        "ann_probe_partitioned": 1.5}}
    assert sync.sync_from_result(fake, "BENCH_rX", repo=repo) is True
    scale = open(os.path.join(repo, "SCALE.md")).read()
    readme = open(os.path.join(repo, "README.md")).read()
    assert "BENCH_rX" in scale and "8.0×" in scale
    assert "BENCH_rX" in readme and "12.00 s" in readme
    # idempotent on the same numbers
    assert sync.sync_from_result(fake, "BENCH_rX", repo=repo) is False

    newest = sync.newest_bench_json()
    data = json.load(open(newest))
    parsed = data.get("parsed", data)
    label = os.path.basename(newest).replace(".json", "")
    assert sync.sync_from_result(parsed, label, repo=repo) is True
    for f in ("SCALE.md", "README.md"):
        assert (
            open(os.path.join(repo, f)).read()
            == open(os.path.join(sync.REPO, f)).read()
        ), f"{f} round-trip diverged"
