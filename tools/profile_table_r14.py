"""Render the round-14 before/after checklist table from the two
profile JSONL files (baseline at round-start commit, final at HEAD).

Usage: python tools/profile_table_r14.py baseline.jsonl final.jsonl
Prints a markdown table: query | warm s (base→final) | jobs (base→final).
"""

from __future__ import annotations

import json
import sys


def load(p):
    out = {}
    for line in open(p):
        r = json.loads(line)
        if "q" in r:
            out[r["q"]] = (r["warm"], r["jobs_warm"])
    return out


def main() -> None:
    base = load(sys.argv[1])
    fin = load(sys.argv[2])
    tb = sum(v[0] for v in base.values())
    tf = sum(v[0] for v in fin.values())
    jb = sum(v[1] for v in base.values())
    jf = sum(v[1] for v in fin.values())
    print(f"| query | warm s | jobs |")
    print(f"|---|---|---|")
    print(f"| **TOTAL ({len(base)})** | **{tb:.1f} → {tf:.1f}** | **{jb} → {jf}** |")
    for q in sorted(base, key=lambda q: -base[q][0]):
        bw, bj = base[q]
        fw, fj = fin.get(q, (float("nan"), -1))
        mark = " ←" if bj != fj else ""
        print(f"| {q} | {bw:.2f} → {fw:.2f} | {bj} → {fj}{mark} |")


if __name__ == "__main__":
    main()
