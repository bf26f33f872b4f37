"""Consolidated per-query wall history across every bench artifact —
the companion to the r12 rotation slice: headline queries have warm
walls every round, rotation queries one wall per ~4 rounds; this tool
folds BOTH into one table so any query's trend (and any >2× move
between its two most recent observations) is visible at a glance.

    python tools/perf_history.py            # full table, registry order
    python tools/perf_history.py --flags    # only the >2x movers
    python tools/perf_history.py q_pagerank # one query's history

Sources, in precedence order per (round, query):
  - tools/bench_r{N}_local.json — builder-controlled quiet-host runs
    (warm dict + rotation record);
  - BENCH_r{N}.json at the repo root — the driver's per-round archive
    (tail-wrapped; salvaged by bench_compare's loaders).
Headline warm walls and rotation single-run walls are tagged 'w' and
'r' respectively — compare within a tag, not across (rotation rows
carry cold-ish single-run noise that warm rows don't).
"""

from __future__ import annotations

import glob
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)

from bench_compare import _load, _load_rotation  # noqa: E402


def collect() -> dict[str, dict[int, tuple[float, str]]]:
    hist: dict[str, dict[int, tuple[float, str]]] = {}

    def put(q: str, rnd: int, wall: float, tag: str) -> None:
        hist.setdefault(q, {})[rnd] = (wall, tag)

    # driver artifacts first, builder-local second (overwrites = wins)
    sources: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            sources.append((int(m.group(1)), path))
    for path in glob.glob(os.path.join(HERE, "bench_r*_local.json")):
        m = re.search(r"bench_r(\d+)_local\.json$", path)
        if m:
            sources.append((int(m.group(1)), path))

    for rnd, path in sorted(sources, key=lambda t: (t[0], "local" in t[1])):
        try:
            d = _load(path)
            for q, w in d.get("queries", {}).items():
                put(q, rnd, float(w), "w")
        except Exception:
            pass
        try:
            # r13+: _load_rotation returns {slice_index: record} (a
            # catch-up run can carry several slices in one artifact)
            for rec in _load_rotation(path).values():
                for q, w in rec.get("queries_rotation", {}).items():
                    put(q, rnd, float(w), "r")
        except Exception:
            pass
    return hist


def flags(hist: dict) -> list[str]:
    out = []
    for q, by_round in sorted(hist.items()):
        obs = sorted(by_round.items())
        # compare the two most recent SAME-TAG observations
        by_tag: dict[str, list[tuple[int, float]]] = {}
        for rnd, (w, tag) in obs:
            by_tag.setdefault(tag, []).append((rnd, w))
        for tag, rows in by_tag.items():
            if len(rows) < 2:
                continue
            (r_prev, w_prev), (r_last, w_last) = rows[-2], rows[-1]
            if w_last > 2 * max(w_prev, 0.3):  # 0.3s sub-second noise floor
                out.append(
                    f"FLAG {q} [{tag}]: r{r_prev} {w_prev:.2f}s -> "
                    f"r{r_last} {w_last:.2f}s ({w_last / w_prev:.1f}x)"
                )
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only_flags = "--flags" in sys.argv
    hist = collect()
    fl = flags(hist)
    if only_flags:
        print("\n".join(fl) if fl else "no >2x movers")
        return 0
    rounds = sorted({r for by in hist.values() for r in by})
    names = args or sorted(hist)
    print(f"{'query':30s} " + " ".join(f"{'r' + str(r):>8s}" for r in rounds))
    for q in names:
        by = hist.get(q, {})
        cells = []
        for r in rounds:
            if r in by:
                w, tag = by[r]
                cells.append(f"{w:7.2f}{tag}")
            else:
                cells.append(f"{'—':>8s}")
        print(f"{q:30s} " + " ".join(cells))
    print(f"\n{len(hist)} queries with history; "
          f"{len(fl)} flagged >2x movers" + (":" if fl else ""))
    for f in fl:
        print("  " + f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
