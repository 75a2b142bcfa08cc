#!/usr/bin/env python3
"""Cross-scale growth table (VERDICT r14 #2): per-query wall ratio
between two Bench detail captures taken at DIFFERENT scale factors on
the SAME build — the adjudication input for "which queries grow
superlinearly on 10x data".

Unlike ab_compare.py (same-scale A/B, canary-normalized), growth is a
property of the operator, so the canary is reported but NOT divided
out — instead each capture's own drift rule applies (a capture whose
machine changed mid-run can't adjudicate growth either).

Usage: python3 tools/growth_table.py <small_detail.json> <big_detail.json>
       [scale_ratio] [growth_flag_threshold]
Defaults: scale_ratio=10, flag queries whose wall ratio > 2x per 10x
data (the VERDICT r14 #2 adjudication bar). Queries under 1s at the
small scale are listed but never flagged (fixed-cost floor dominates).
"""
import json, sys

DRIFT_MAX = 1.25

def load(p):
    with open(p) as f:
        return json.load(f)

small, big = load(sys.argv[1]), load(sys.argv[2])
scale_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
flag_at = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0

def drift_check(d, name):
    c = d.get("canary")
    if not c or len(c) < 2 or any(v <= 0 for v in c):
        print(f"WARNING: {name} canary missing/void ({c})")
        return
    r = max(c) / min(c)
    if r > DRIFT_MAX:
        print(f"WARNING: {name} mid-capture canary drift {r:.2f}x "
              f"(stamps {c}) — growth ratios unreliable")

drift_check(small, "small")
drift_check(big, "big")

qs, qb = small["queries"], big["queries"]
shared = sorted(set(qs) & set(qb))
fail_s, fail_b = set(small.get("failed", [])), set(big.get("failed", []))
rows = []
for q in shared:
    if q in fail_s or q in fail_b:
        continue
    ratio = qb[q] / qs[q] if qs[q] > 0 else float("inf")
    rows.append((ratio, q, qs[q], qb[q]))
rows.sort(reverse=True)

flagged = [(r, q, a, b) for r, q, a, b in rows if r > flag_at and a >= 1.0]
print(f"shared={len(shared)} small_total={small['value']:.1f}s "
      f"big_total={big['value']:.1f}s data_ratio={scale_ratio:g}x "
      f"flag_bar={flag_at:g}x")
print(f"\n== flagged (> {flag_at:g}x wall on {scale_ratio:g}x data, "
      f">=1s at small scale): {len(flagged)} ==")
print(f"{'query':<34} {'small_s':>9} {'big_s':>9} {'ratio':>7}")
for r, q, a, b in flagged:
    print(f"{q:<34} {a:>9.2f} {b:>9.2f} {r:>6.2f}x")
print(f"\n== top 30 by ratio (all) ==")
for r, q, a, b in rows[:30]:
    print(f"{q:<34} {a:>9.2f} {b:>9.2f} {r:>6.2f}x")
only_s = sorted(set(qs) - set(qb))
only_b = sorted(set(qb) - set(qs))
if only_s: print(f"\nonly in small: {only_s}")
if only_b: print(f"only in big: {only_b}")
if fail_s | fail_b: print(f"failed: small={sorted(fail_s)} big={sorted(fail_b)}")
