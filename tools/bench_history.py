"""Per-row bench variance ledger.

Round-12 verdict task #7: rows like ann_pq and events_window oscillate
across rounds with byte-identical code (host variance), and every round
they consumed audit time. This makes the noise bands machine-checkable:
it folds every historical driver bench (BENCH_r*.json in the repo root)
into per-row (n, min, median, max) stats, and classifies a fresh timing
against its band.

Used two ways:
  * ``python tools/bench_history.py`` — print the ledger as a table.
  * ``bench.py`` imports :func:`history` / :func:`classify` and emits a
    ``vs_history`` block in its JSON line, so the per-round bench itself
    says which rows moved beyond their historical band.

BENCH files come in two shapes: ``{"parsed": {"queries": {...}}}`` and
older/truncated ones where only a ``tail`` string survives — the tail is
scraped with a regex (a variance ledger tolerates lossy history; a row
missing from one round just has one fewer observation).
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics

# keys in the bench JSON line that are not query rows
_NON_QUERY = {"value", "sf", "runs", "n", "rc", "cpus"}
_PAIR = re.compile(r'"([a-z0-9_]+)":\s*([0-9]+\.[0-9]+)')


def _rows_from_file(path: str) -> dict[str, float]:
    try:
        d = json.load(open(path))
    except (OSError, ValueError):
        return {}
    # full-fidelity artifact (bench_history/rN.json — bench.py writes the
    # complete payload itself since r14)
    if isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    p = d.get("parsed")
    if p and isinstance(p.get("queries"), dict):
        return {k: float(v) for k, v in p["queries"].items()}
    tail = d.get("tail") or ""
    return {k: float(v) for k, v in _PAIR.findall(tail)
            if k not in _NON_QUERY}


def history(repo_dir: str | None = None) -> dict[str, dict]:
    """Fold every historical driver bench into {row: {n, min, median,
    max}}. Sources, one observation per round per row: the committed
    full-fidelity ``bench_history/r*.json`` when present (bench.py
    writes the complete map since r14 — the driver's BENCH_rN.json
    truncates the first rows out of its ``tail``), falling back to the
    lossy BENCH_rN.json scrape for rounds without one."""
    repo = repo_dir or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    full = {os.path.basename(f).removesuffix(".json"): f
            for f in glob.glob(os.path.join(repo, "bench_history",
                                            "r*.json"))}
    obs: dict[str, list[float]] = {}
    seen_rounds = set()
    for rnd, f in sorted(full.items()):
        seen_rounds.add(rnd)
        for k, v in _rows_from_file(f).items():
            obs.setdefault(k, []).append(v)
    for f in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        rnd = os.path.basename(f).removesuffix(".json") \
            .removeprefix("BENCH_")
        if rnd in seen_rounds:
            continue  # the full artifact already covers this round
        for k, v in _rows_from_file(f).items():
            obs.setdefault(k, []).append(v)
    return {k: {"n": len(v), "min": min(v),
                "median": round(statistics.median(v), 3), "max": max(v)}
            for k, v in obs.items()}


def classify(name: str, secs: float, hist: dict[str, dict],
             band: float = 1.5) -> dict | None:
    """Return {ratio_to_median, within_band, band_hi} for one fresh
    timing, or None when the row has no history (new coverage row).

    One-sided on purpose: only a timing ABOVE the historical envelope
    (slower than every prior round and 1.5× the median) is an anomaly
    worth auditing — faster runs (idle host, smaller sf) are not."""
    h = hist.get(name)
    if not h or h["median"] <= 0:
        return None
    hi = max(h["max"], h["median"] * band)
    return {"ratio_to_median": round(secs / h["median"], 3),
            "within_band": secs <= hi,
            "band_hi": round(hi, 3)}


def main() -> None:
    hist = history()
    print(f"{'row':34s} {'n':>3s} {'min':>8s} {'median':>8s} {'max':>8s}")
    for k in sorted(hist):
        h = hist[k]
        print(f"{k:34s} {h['n']:3d} {h['min']:8.3f} "
              f"{h['median']:8.3f} {h['max']:8.3f}")


if __name__ == "__main__":
    main()
