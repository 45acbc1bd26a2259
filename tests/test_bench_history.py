"""Bench variance ledger (tools/bench_history.py): history folding over
both BENCH file shapes and one-sided band classification."""

import json
import os
import sys

sys.path.insert(0, "/root/repo/tools")

from bench_history import _rows_from_file, classify, history  # noqa: E402


def _write(tmpdir, name, payload):
    p = os.path.join(tmpdir, name)
    with open(p, "w") as f:
        json.dump(payload, f)
    return p


def test_rows_from_parsed_and_tail_shapes(tmp_path):
    d = str(tmp_path)
    parsed = _write(d, "BENCH_r01.json", {
        "parsed": {"queries": {"q_a": 1.5, "q_b": 0.25}, "value": 9.9}})
    # truncated tail-only shape: scraped by regex, non-query keys skipped
    tail = _write(d, "BENCH_r02.json", {
        "parsed": None,
        "tail": '_x": 1, "q_a": 2.5, "q_b": 0.5, "sf": 0.1, "value": 3.0}'})
    assert _rows_from_file(parsed) == {"q_a": 1.5, "q_b": 0.25}
    assert _rows_from_file(tail) == {"q_a": 2.5, "q_b": 0.5}
    h = history(repo_dir=d)
    assert h["q_a"] == {"n": 2, "min": 1.5, "median": 2.0, "max": 2.5}


def test_classify_is_one_sided(tmp_path):
    d = str(tmp_path)
    for r, v in ((1, 1.0), (2, 2.0), (3, 3.0)):
        _write(d, f"BENCH_r{r:02d}.json",
               {"parsed": {"queries": {"q": float(v)}}})
    h = history(repo_dir=d)
    # hi band = max(3.0, 2.0 * 1.5) = 3.0
    assert classify("q", 2.9, h)["within_band"]
    assert classify("q", 3.0, h)["within_band"]
    assert not classify("q", 3.1, h)["within_band"]
    # faster-than-history is NEVER flagged (idle host / smaller sf)
    fast = classify("q", 0.01, h)
    assert fast["within_band"] and fast["ratio_to_median"] == 0.005
    # unknown row (new coverage) → no classification
    assert classify("brand_new", 1.0, h) is None


def test_history_ignores_unreadable_files(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "BENCH_r01.json"), "w") as f:
        f.write("{not json")
    assert history(repo_dir=d) == {}
