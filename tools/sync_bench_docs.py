"""Rewrite doc-quoted bench figures from the shipped bench artifact.

Round-5 verdict #2: SCALE.md/README quoted an ANN pruning measurement
(5.84 s / 0.87 s = 6.7×) that predated the final BENCH_r05 run
(7.55 s / 0.92 s = 8.2×) — numbers written by hand drift from the JSON
they claim to cite. This tool makes the docs DERIVED: the text between
``<!-- ANN_BENCH:BEGIN -->`` / ``<!-- ANN_BENCH:END -->`` markers is
regenerated from a bench-result dict, either the newest ``BENCH_r*.json``
in the repo root (default) or an explicit path / in-memory dict.

``bench.py`` calls :func:`sync_from_result` at the end of every full run,
so the next recorded round's docs always match its artifact; the CLI form
(``python tools/sync_bench_docs.py [BENCH_rN.json]``) re-syncs by hand and
``tests/test_bench_docs_sync.py`` fails the suite if the docs ever drift
from the newest committed artifact.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- ANN_BENCH:BEGIN -->", "<!-- ANN_BENCH:END -->"


def newest_bench_json(repo: str = REPO) -> str | None:
    paths = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    return paths[-1] if paths else None


def _queries(parsed: dict) -> dict:
    return parsed.get("queries", parsed)


def ann_figures(parsed: dict) -> tuple[float, float, float] | None:
    q = _queries(parsed)
    full = q.get("ann_probe_unpartitioned")
    part = q.get("ann_probe_partitioned")
    if not full or not part:
        return None
    return full, part, full / part


def _render(label: str, full: float, part: float, ratio: float,
            style: str) -> str:
    if style == "scale":
        return (f"{label} measures {full:.2f} s full scan vs {part:.2f} s "
                f"partitioned at 32 cores —\n  **{ratio:.1f}×**")
    return (f"{ratio:.1f}×: {full:.2f} s full-scan vs {part:.2f} s\n"
            f"partitioned probe over a 2M×64 table, {label} bench leg")


def _splice(path: str, text: str) -> bool:
    src = open(path, encoding="utf-8").read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(src):
        raise RuntimeError(f"{path}: ANN_BENCH markers missing")
    new = pat.sub(BEGIN + text + END, src, count=1)
    if new != src:
        open(path, "w", encoding="utf-8").write(new)
        return True
    return False


def sync_from_result(parsed: dict, label: str, repo: str = REPO) -> bool:
    """Rewrite the marked regions from a bench-result dict; returns True
    if either file changed. ``label`` names the artifact being quoted
    (e.g. ``BENCH_r06`` or ``bench run 2026-08-17``)."""
    fig = ann_figures(parsed)
    if fig is None:
        return False
    full, part, ratio = fig
    changed = _splice(
        os.path.join(repo, "SCALE.md"),
        "\n  " + _render(label, full, part, ratio, "scale") + "\n  ",
    )
    changed |= _splice(
        os.path.join(repo, "README.md"),
        _render(label, full, part, ratio, "readme"),
    )
    return changed


def sync_from_file(path: str, repo: str = REPO) -> bool:
    data = json.load(open(path, encoding="utf-8"))
    parsed = data.get("parsed", data)  # driver wrapper or raw bench line
    label = os.path.basename(path).replace(".json", "")
    return sync_from_result(parsed, label, repo)


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else newest_bench_json()
    if target is None:
        sys.exit("no BENCH_r*.json found")
    print(f"synced={sync_from_file(target)} from {target}")
