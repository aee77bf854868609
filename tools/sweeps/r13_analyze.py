#!/usr/bin/env python3
"""Summarize a r13 sweep stats JSON (per-attempt task-metric + /proc/self/io
deltas from graft.Bench's SPARK_GRAFT_STATS_JSON) into a per-query table:
round-1 (page-cache-cold) vs round-2 (warm) wall, actual disk reads,
shuffle, spill, cpu — the raw material for the sf100 I/O-regime
attribution in SCALING.md.

Usage: r13_analyze.py <stats.json> [stats2.json ...]
"""
import json
import sys

GB = 1 << 30


def load(path):
    rows = json.load(open(path))
    per = {}
    for r in rows:
        per.setdefault(r["query"], []).append(r)
    return per


def fmt(per, label):
    print(f"\n== {label} ==")
    print(f"{'query':26} {'r1 wall':>8} {'r2 wall':>8} {'r1 dRead':>9} {'r2 dRead':>9}"
          f" {'shufW':>7} {'spill':>7} {'cpu_s':>7} {'gc_s':>6}")
    for q in sorted(per):
        a = per[q]
        r1, r2 = a[0], (a[1] if len(a) > 1 else None)

        def g(r, k):
            return r.get(k, 0) if r else 0
        print(f"{q:26} {g(r1,'wall_sec'):8.1f} {(g(r2,'wall_sec') if r2 else float('nan')):8.1f}"
              f" {g(r1,'proc_disk_read_bytes')/GB:8.1f}G {g(r2,'proc_disk_read_bytes')/GB:8.1f}G"
              f" {g(r1,'shuffle_write_bytes')/GB:6.1f}G"
              f" {(g(r1,'disk_spilled_bytes')+g(r1,'memory_spilled_bytes'))/GB:6.1f}G"
              f" {g(r1,'cpu_time_ms')/1e3:7.0f} {g(r1,'gc_time_ms')/1e3:6.0f}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        fmt(load(p), p)
