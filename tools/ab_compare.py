#!/usr/bin/env python3
"""Canary-normalized comparison of two Bench detail captures (VERDICT
r13 task #4: make cross-round bench deltas falsifiable).

Usage: python3 tools/ab_compare.py <baseline_detail.json> <current_detail.json> [top_n]

Both files are Bench sidecar JSONs. The canary ratio
(current_canary_mean / baseline_canary_mean) estimates the session-
condition shift between the captures; each query's raw ratio is then
divided by it. A normalized ratio ~1.0 means "moved with the machine";
a normalized ratio well above 1.0 is a real regression. Queries absent
from either capture are listed separately. Captures without a canary
field (pre-r14) fall back to raw ratios with a loud warning.
"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)

base, cur = load(sys.argv[1]), load(sys.argv[2])
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

def canary_mean(d, name):
    c = d.get("canary")
    if not c:
        print(f"WARNING: {name} has no canary field — raw ratios only")
        return None
    return sum(c) / len(c)

cb, cc = canary_mean(base, "baseline"), canary_mean(cur, "current")
ratio = (cc / cb) if (cb and cc) else 1.0
print(f"canary: baseline={base.get('canary')} current={cur.get('canary')} "
      f"session ratio={ratio:.3f}")
print(f"load: baseline={base.get('load')} current={cur.get('load')}")

qb, qc = base["queries"], cur["queries"]
shared = sorted(set(qb) & set(qc))
failed = set(base.get("failed", [])) | set(cur.get("failed", []))
rows = []
for q in shared:
    if q in failed or qb[q] <= 0:
        continue
    raw = qc[q] / qb[q]
    rows.append((q, qb[q], qc[q], raw, raw / ratio))

tb = sum(qb[q] for q, *_ in rows)
tc = sum(qc[q] for q, *_ in rows)
print(f"shared queries: {len(rows)}  wall {tb:.1f}s -> {tc:.1f}s "
      f"(raw {tc/tb:.3f}x, canary-normalized {tc/tb/ratio:.3f}x)")
print(f"\n{'query':40s} {'base':>8s} {'cur':>8s} {'raw':>6s} {'norm':>6s}")
for q, b, c, raw, norm in sorted(rows, key=lambda r: -r[4])[:top_n]:
    print(f"{q:40s} {b:8.2f} {c:8.2f} {raw:6.2f} {norm:6.2f}")
only_b = sorted(set(qb) - set(qc))
only_c = sorted(set(qc) - set(qb))
if only_b:
    print(f"\nonly in baseline ({len(only_b)}): {', '.join(only_b[:10])}…"
          if len(only_b) > 10 else f"\nonly in baseline: {', '.join(only_b)}")
if only_c:
    print(f"only in current ({len(only_c)}): {', '.join(only_c[:10])}…"
          if len(only_c) > 10 else f"only in current: {', '.join(only_c)}")
if failed:
    print(f"excluded (failed in either): {sorted(failed)}")
