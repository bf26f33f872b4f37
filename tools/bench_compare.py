"""Compare two bench JSON artifacts on their common queries.

Usage: python tools/bench_compare.py BENCH_r06.json BENCH_r07.json

Uses each file's "queries" dict — which, from round 7 on, holds WARM
times (every headline query runs twice, caches released between runs;
see bench.py). Cold first-execution times in a shared JVM absorb the
preceding queries' JIT/GC state and produced round 6's phantom
regressions, so cross-round deltas are only meaningful warm-to-warm;
comparing a warm file against an older cold-time file understates the
old round and is flagged in the header.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    d = json.load(open(path))
    if "queries" not in d and "tail" in d:
        d = _from_tail(d["tail"], path)
    return d


def _balanced(s: str, start: int) -> str:
    """The balanced {...} span of s beginning at start (s[start]=='{')."""
    depth, i = 0, start
    while i < len(s):
        if s[i] == "{":
            depth += 1
        elif s[i] == "}":
            depth -= 1
            if depth == 0:
                return s[start : i + 1]
        i += 1
    raise ValueError("unbalanced braces")


def _from_tail(tail: str, path: str) -> dict:
    """Driver-wrapped artifact: the bench's own JSON line is embedded
    in the captured tail. Parse exactly ONE line starting at the
    marker (trailing warnings with '}' must not widen the span). The
    driver keeps only the LAST N bytes, so the line's head — including
    the marker and the warm "queries" dict — may be cut off; salvage
    whichever per-query dict survives intact ("queries", else
    "queries_cold", flagged single-run so the protocol note prints)."""
    if '{"metric"' in tail:
        line = tail[tail.index('{"metric"') :].split("\n", 1)[0]
        return json.loads(line[: line.rindex("}") + 1])
    for key in ('"queries": {', '"queries_cold": {'):
        if key in tail:
            start = tail.index(key) + len(key) - 1
            qs = json.loads(_balanced(tail, start))
            if key.startswith('"queries"'):
                return {"queries": qs, "queries_cold": True}
            print(f"# NOTE: {path} tail truncated — warm times lost, "
                  "using its cold-run dict")
            return {"queries": qs}
    raise ValueError(f"{path}: no bench JSON recoverable from tail")


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = _load(a_path)
    b = _load(b_path)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    a_warm = "queries_cold" in a
    b_warm = "queries_cold" in b
    print(f"# {a_path} ({'warm' if a_warm else 'single-run'}) vs "
          f"{b_path} ({'warm' if b_warm else 'single-run'})")
    if a_warm != b_warm:
        print("# NOTE: mixed protocols — deltas vs the single-run side "
              "include its cold-start noise")
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"# common queries: {len(common)}; totals {ta:.1f}s -> {tb:.1f}s "
          f"({(tb - ta) / ta * 100:+.1f}%)")
    rows = sorted(common, key=lambda q: qb[q] - qa[q])
    print(f"{'query':28s} {'old':>7s} {'new':>7s} {'delta':>8s}")
    for q in rows:
        d = qb[q] - qa[q]
        if abs(d) < 0.15 and (qa[q] == 0 or abs(d) / max(qa[q], 1e-9) < 0.2):
            continue  # noise floor
        print(f"{q:28s} {qa[q]:7.2f} {qb[q]:7.2f} {d:+8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
