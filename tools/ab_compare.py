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
field (pre-r14), or with a -1 sentinel stamp (a canary that crashed —
Bench keeps the capture and voids the stamp), fall back to raw ratios
with a loud warning.

DRIFT RULE (VERDICT r14 #6, binding): a capture whose own start/end
canary stamps diverge by more than DRIFT_MAX (1.25x either way) was
measuring a machine whose conditions CHANGED MID-CAPTURE — its
per-query numbers are not comparable to anything, including each
other. The script prints the verdict and exits 2, so automation cannot
quietly adjudicate a "+20% regression" that is session noise (the r13
dispute this rule retires). Pass --allow-drift to downgrade the exit
to the printed warning (for forensic reads of a known-contaminated
capture).
"""
import json, sys

DRIFT_MAX = 1.25

args = [a for a in sys.argv[1:] if a != "--allow-drift"]
allow_drift = "--allow-drift" in sys.argv[1:]

def load(p):
    with open(p) as f:
        return json.load(f)

base, cur = load(args[0]), load(args[1])
top_n = int(args[2]) if len(args) > 2 else 25

def canary_stamps(d, name):
    c = d.get("canary")
    if not c or any(v <= 0 for v in c):
        print(f"WARNING: {name} canary is missing or void ({c}) — raw ratios only")
        return None
    return c

def drift(c, name):
    if not c or len(c) < 2:
        return False
    r = max(c) / min(c)
    if r > DRIFT_MAX:
        print(f"DRIFT: {name} start/end canary {c} diverges {r:.2f}x "
              f"(> {DRIFT_MAX}x) — conditions changed MID-CAPTURE; "
              f"its numbers are not comparable")
        return True
    return False

cb_stamps = canary_stamps(base, "baseline")
cc_stamps = canary_stamps(cur, "current")
drifted = drift(cb_stamps, "baseline") | drift(cc_stamps, "current")
cb = sum(cb_stamps) / len(cb_stamps) if cb_stamps else None
cc = sum(cc_stamps) / len(cc_stamps) if cc_stamps else None
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
# tb == 0 when the shared non-failed set is empty (disjoint query sets,
# or every shared query failed) — still print the only-in/failed
# diagnostics below, they are the useful output in exactly that case
if tb > 0:
    print(f"shared queries: {len(rows)}  wall {tb:.1f}s -> {tc:.1f}s "
          f"(raw {tc/tb:.3f}x, canary-normalized {tc/tb/ratio:.3f}x)")
    print(f"\n{'query':40s} {'base':>8s} {'cur':>8s} {'raw':>6s} {'norm':>6s}")
    for q, b, c, raw, norm in sorted(rows, key=lambda r: -r[4])[:top_n]:
        print(f"{q:40s} {b:8.2f} {c:8.2f} {raw:6.2f} {norm:6.2f}")
else:
    print("shared non-failed query set is EMPTY — no wall ratio; "
          "diagnostics below")
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
if drifted and not allow_drift:
    print("\nEXIT 2: refusing the comparison under mid-capture canary "
          "drift (--allow-drift to downgrade)")
    sys.exit(2)
