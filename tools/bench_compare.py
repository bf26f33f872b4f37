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
import re
import sys


def _load(path: str) -> dict:
    text = open(path).read()
    try:
        d = json.loads(text)
    except ValueError:
        # r10 local artifacts hold TWO records (cold diagnostics line,
        # then the authoritative warm line) — take the last line that
        # carries a per-query dict
        d = None
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue  # sheared/partial line — salvage the rest
            if "queries" in rec or d is None:
                d = rec
        if d is None:
            raise ValueError(f"{path}: no JSON records found")
        if "queries" in d:
            d["queries_cold"] = True  # two-record format is warm-protocol
        elif isinstance(d.get("queries_cold"), dict):
            # warm line missing/sheared — fall back to the cold
            # diagnostics dict (single-run protocol, so no warm flag)
            print(f"# NOTE: {path} warm line missing — using its "
                  "cold-run dict")
            d = {"queries": d["queries_cold"]}
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
        # from r10 the warm record is a standalone FINAL line; prefer
        # the last complete metric line in the tail
        start = tail.rindex('{"metric"')
        line = tail[start:].split("\n", 1)[0]
        try:
            return json.loads(line[: line.rindex("}") + 1])
        except ValueError:
            pass  # the last metric line itself got sheared — fall through
    for key in ('"queries": {', '"queries_cold": {'):
        if key in tail:
            start = tail.index(key) + len(key) - 1
            qs = json.loads(_balanced(tail, start))
            if key.startswith('"queries"'):
                return {"queries": qs, "queries_cold": True}
            print(f"# NOTE: {path} tail truncated — warm times lost, "
                  "using its cold-run dict")
            return {"queries": qs}
    # head-truncated warm dict (the r9 artifact shape: the tail is the
    # LAST N chars, so the warm dict's opening — and marker — are cut
    # but its suffix and the closing `"value": <total>}` survive):
    # salvage the intact (query, sec) pairs and the authoritative total
    m_total = re.search(r'"value":\s*([0-9.]+)\}\s*$', tail)
    pairs = re.findall(r'"(q_\w+)":\s*([0-9.]+)', tail)
    if m_total and pairs:
        print(f"# NOTE: {path} tail head-truncated — salvaged "
              f"{len(pairs)} per-query warm entries + the warm total")
        return {
            "queries": {q: float(v) for q, v in pairs},
            "queries_cold": True,
            "value": float(m_total.group(1)),
            "partial": True,
        }
    raise ValueError(f"{path}: no bench JSON recoverable from tail")


def _load_rotation(path: str) -> dict[int, dict]:
    """The artifact's rotation_slice records keyed by slice_index
    (r12: one per file; r13+ a catch-up run may carry several).
    Rotation walls are single-run history rows for the ~200
    non-headline registry queries; the same slice recurs every
    n_slices rounds, so cross-round comparison is only meaningful
    between records carrying the SAME slice_index."""
    text = open(path).read()
    recs: dict[int, dict] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("metric") == "rotation_slice":
            recs[int(d.get("slice_index", -1))] = d
    return recs


def _compare_rotation(a_path: str, b_path: str) -> None:
    ra, rb = _load_rotation(a_path), _load_rotation(b_path)
    shared = sorted(set(ra) & set(rb))
    if not shared:
        if ra and rb:
            print(f"# rotation slices differ ({sorted(ra)} vs "
                  f"{sorted(rb)}) — no rotation comparison")
        return
    for idx in shared:
        qa = ra[idx]["queries_rotation"]
        qb = rb[idx]["queries_rotation"]
        common = sorted(set(qa) & set(qb))
        print(f"# rotation slice {idx}: {len(common)} common "
              f"queries, totals {sum(qa[q] for q in common):.1f}s -> "
              f"{sum(qb[q] for q in common):.1f}s")
        flagged = [
            q for q in common
            if qb[q] > 2 * max(qa[q], 0.3)  # 0.3s floor: sub-second jitter
        ]
        for q in flagged:
            print(f"# ROTATION >2x MOVER: {q} {qa[q]:.2f}s -> {qb[q]:.2f}s")
        if not flagged:
            print(f"# rotation slice {idx}: no >2x movers")


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
    if a.get("partial") or b.get("partial"):
        print("# NOTE: a side is a salvaged partial dict — the common-"
              "query total above covers only its surviving suffix")
    if "value" in a and "value" in b:
        va, vb = float(a["value"]), float(b["value"])
        print(f"# authoritative warm TOTALS (all queries): {va:.1f}s -> "
              f"{vb:.1f}s ({(vb - va) / va * 100:+.1f}%)")
    # host-noise sentinels (r13): three fixed sub-second queries timed
    # at the start AND end of each run. Their cross-round ratio is the
    # HOST factor — code for them never moves, so a ratio far from 1.0
    # marks one run as hot and lets a reader normalize uniform movers
    # without a worktree A/B (r12's driver-tail inflation needed one).
    host = None
    if a.get("sentinels_start") and b.get("sentinels_start"):
        sa = sum(a["sentinels_start"].values()) + sum(
            a.get("sentinels_end", {}).values())
        sb = sum(b["sentinels_start"].values()) + sum(
            b.get("sentinels_end", {}).values())
        host = sb / max(sa, 1e-9)
        print(f"# sentinel host ratio (new/old): {host:.2f}"
              f"  [within-run drift old {a.get('sentinel_drift')}, "
              f"new {b.get('sentinel_drift')}]")
        if abs(host - 1.0) > 0.15:
            print(f"# NOTE: hosts differ by {host:.2f}x — deltas below "
                  "are annotated with the host-normalized new time")
    rows = sorted(common, key=lambda q: qb[q] - qa[q])
    print(f"{'query':28s} {'old':>7s} {'new':>7s} {'delta':>8s}")
    for q in rows:
        d = qb[q] - qa[q]
        if abs(d) < 0.15 and (qa[q] == 0 or abs(d) / max(qa[q], 1e-9) < 0.2):
            continue  # noise floor
        note = ""
        if host is not None and abs(host - 1.0) > 0.15:
            note = f"  (host-norm {qb[q] / host:6.2f})"
        print(f"{q:28s} {qa[q]:7.2f} {qb[q]:7.2f} {d:+8.2f}{note}")
    _compare_rotation(a_path, b_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
