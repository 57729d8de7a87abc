#!/usr/bin/env python3
"""Generate round-over-round bench notes FROM THE SHIPPED ARTIFACTS.

Usage: python3 tools/bench_notes.py <prev_bench_full.json> <cur_bench_full.json> <round>

Emits markdown to stdout. Every number in the output is read from the two
JSON files — nothing is hand-typed, so the notes can never drift from the
artifact they ship with (the round-7 failure mode: notes quoting an
intermediate run).
"""
import json
import sys

REGRESSION_SEC = 0.25


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    prev_path, cur_path, rnd = sys.argv[1], sys.argv[2], sys.argv[3]
    prev, cur = load(prev_path), load(cur_path)
    pq, cq = prev["queries"], cur["queries"]
    shared = sorted(set(pq) & set(cq))
    new = sorted(set(cq) - set(pq))
    gone = sorted(set(pq) - set(cq))
    p_tot = sum(pq[q] for q in shared)
    c_tot = sum(cq[q] for q in shared)
    regress = sorted(((q, pq[q], cq[q]) for q in shared
                      if cq[q] - pq[q] > REGRESSION_SEC),
                     key=lambda t: t[1] - t[2])
    improve = sorted(((q, pq[q], cq[q]) for q in shared
                      if pq[q] - cq[q] > REGRESSION_SEC),
                     key=lambda t: t[2] - t[1])
    tail = sorted(cq.items(), key=lambda kv: -kv[1])[:5]

    print(f"# Bench notes — round {rnd} (generated from artifacts, "
          f"sf{cur.get('sf', '?')}, local[32])")
    print()
    print(f"Source artifacts: `{prev_path}` (prev) vs `{cur_path}` (this round);")
    print("regenerate with `python3 tools/bench_notes.py <prev> <cur> <round>`.")
    print()
    print("## Headline")
    print()
    print(f"- **{len(cq)} queries benched**, errors: "
          f"`{json.dumps(cur.get('errors', []))}`, total "
          f"{cur.get('value', 0.0):.1f} s.")
    ratio = c_tot / p_tot if p_tot else float("nan")
    print(f"- On the {len(shared)} queries timed in both rounds: "
          f"**{p_tot:.1f} s → {c_tot:.1f} s ({ratio:.2f}×)**.")
    if new:
        print(f"- Newly timed this round ({len(new)}): "
              + ", ".join(f"{q} {cq[q]:.2f}s" for q in new) + ".")
    if gone:
        print(f"- No longer benched ({len(gone)}): " + ", ".join(gone) + ".")
    print()
    print(f"## Regressions > {REGRESSION_SEC} s ({len(regress)})")
    print()
    if regress:
        print("| query | prev | now | delta |")
        print("|---|---|---|---|")
        for q, a, b in regress:
            print(f"| {q} | {a:.2f} | {b:.2f} | +{b - a:.2f} |")
    else:
        print("None.")
    print()
    print(f"## Improvements > {REGRESSION_SEC} s ({len(improve)})")
    print()
    if improve:
        print("| query | prev | now | delta |")
        print("|---|---|---|---|")
        for q, a, b in improve:
            print(f"| {q} | {a:.2f} | {b:.2f} | -{a - b:.2f} |")
    else:
        print("None.")
    print()
    print("## Expensive tail (top 5 this round)")
    print()
    print("| query | sec |")
    print("|---|---|")
    for q, v in tail:
        print(f"| {q} | {v:.2f} |")


if __name__ == "__main__":
    main()
