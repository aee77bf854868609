#!/usr/bin/env python3
"""r14 four-scale analysis: per-decade ratios + r13 comparison.

Usage: python3 tools/sweeps/r14_analyze.py
Reads r14_{sf0.1,sf1,sf10,sf100}_bench.json and r13_{...}.json (the r13
sweep files keep full names under "queries"), prints the decade table
and the biggest r13->r14 movers at sf100 (box factor applies: this
round's box measured ~1.3x slower CPU, ~5x slower cold disk).
"""
import json


def load(path, short=True):
    d = json.load(open(path))
    qs = d["queries"] if "queries" in d else d["parsed"]["queries"]
    out = {}
    for k, v in qs.items():
        out[k.split("_")[0] if short else k] = v
    return out, d.get("value") or d.get("parsed", {}).get("value")


def main():
    scales = ["sf0.1", "sf1", "sf10", "sf100"]
    r14 = {}
    totals = {}
    for s in scales:
        r14[s], totals[s] = load(f"tools/sweeps/r14_{s}_bench.json")
    print("r14 same-hour four-scale totals (full 94, min-of-2, -Xmx64g):")
    prev = None
    for s in scales:
        ratio = f"  ({totals[s]/prev:.2f}x)" if prev else ""
        print(f"  {s:6s} {totals[s]:8.1f} s{ratio}")
        prev = totals[s]
    print(f"  1000x data = {totals['sf100']/totals['sf0.1']:.1f}x wall")

    try:
        r13, t13 = load("tools/sweeps/r13_sf100.json")
    except FileNotFoundError:
        return
    print(f"\nsf100 vs r13 ({t13:.0f} s, faster box):")
    movers = sorted(((r14['sf100'][q] / r13[q], q, r13[q], r14['sf100'][q])
                     for q in r13 if q in r14['sf100']), key=lambda x: -x[0])
    for r, q, a, b in movers[:8]:
        print(f"  {q:5s} {a:7.1f} -> {b:7.1f}  ({r:.2f}x)")
    print("  ...")
    for r, q, a, b in movers[-8:]:
        print(f"  {q:5s} {a:7.1f} -> {b:7.1f}  ({r:.2f}x)")
    # per-decade worst rows in r14
    print("\nworst r14 sf10->sf100 per-decade ratios:")
    dec = sorted(((r14['sf100'][q] / max(r14['sf10'][q], 0.001), q)
                  for q in r14['sf100']), key=lambda x: -x[0])
    for r, q in dec[:10]:
        print(f"  {q:5s} {r:6.1f}x  ({r14['sf10'][q]:.2f} -> {r14['sf100'][q]:.1f} s)")


if __name__ == "__main__":
    main()
