#!/usr/bin/env python3
"""Assemble the FULL-library sf0.1 -> sf1 growth census.

Unlike growth_table.py (the slowest-N deep-dive), this pairs the full
per-query maps from two bench_detail captures.

Inputs:
  argv[1]: bench_detail JSON for sf0.1 (runs>=2)
  argv[2]: bench_detail JSON for sf1 (runs=1 census)
  argv[3]: optional idle re-measure dir (<query>.json bench lines) —
           substitutes sf1 values for queries whose census slot was
           load-contaminated; firstpass kept in sf1_sec_firstpass.
  argv[4]: optional output artifact path (default BENCH_sf1_census.json
           next to the repo root).

Every row carries an explicit `status` field (the r9 OOM-as-timing
incident was caught by hand; the DNF marker is structural now):
  ok                 both sides are clean measurements
  idle-remeasure     sf1 value is the idle re-measure (firstpass kept)
  CRASHED-sf0.1      the BASELINE failed — growth undefined even if an
                     idle sf1 measurement exists (a failed baseline's
                     abort time is not a denominator)
  CRASHED-sf1        the sf1 side failed and no idle re-measure exists
  CRASHED-idle       the idle re-measure itself failed
  excluded-work-bound  deliberately not run at sf1: a declared exact
                     ground-truth operator whose WORK grows ~K^2 by
                     semantics (its bounded twin is what ships); the
                     row carries the last idle measurement so the
                     exclusion is visible, never silent
  missing-sf1-capture  present at sf0.1 but absent from the sf1 side
                     and NOT declared excluded — a gap to fix, loudly

Completeness contract (r11, VERDICT r10 #5): every query in the sf0.1
capture gets a census row with an explicit status; row count ==
sf0.1-side query count.
"""
import sys, json, os, glob

# Declared sf1-census exclusions. Keys absent from the sf1 capture but
# NOT listed here are emitted as missing-sf1-capture. Carried numbers
# are the last idle measurements (r9: BENCH_sf1_r9.json).
EXCLUDED_WORK_BOUND = {
    "dedup_prefix_filter":
        "exact PPJoin all-pairs ground truth; work ~K^2 by semantics "
        "(r9 idle: 3.59 -> 222.5 s, >80 GB /tmp spill - run alone). "
        "Bounded twin: dedup_minhash_lsh + dedup_lsh_recall audit.",
    "text_bm25":
        "exact full-corpus BM25 baseline; queries x postings ~K^2 by "
        "semantics (r9 idle: 4.73 -> 97.1 s). Bounded twin: "
        "text_bm25_champion + text_bm25_champ_recall audit.",
}

sf01 = json.load(open(sys.argv[1]))
sf1 = json.load(open(sys.argv[2]))
# a crashed query still gets a time in the bench output (slowest
# failure, so breakage can't look fast) — but it is NOT a measurement;
# honor the failed arrays PER SIDE: an idle sf1 re-measure can rescue a
# crashed sf1 slot, but nothing rescues a crashed sf0.1 BASELINE
crashed01 = set(sf01.get("failed", []))
crashed1 = set(sf1.get("failed", []))
idle, idle_failed = {}, set()
if len(sys.argv) > 3 and sys.argv[3] != "-":
    for p in glob.glob(os.path.join(sys.argv[3], "*.json")):
        d = json.load(open(p))
        for n, s in d.get("queries", {}).items():
            if n in d.get("failed", []):
                idle_failed.add(n)
            else:
                idle[n] = s

q01, q1 = sf01["queries"], sf1["queries"]
art = {
    "sf_base": "/root/testdata/sf0.1 (runs=%s, min)" % sf01.get("runs"),
    "sf_big": "tmp/sf1 (ScaleUp 10x; runs=%s)" % sf1.get("runs"),
    "queries": {},
}
bands = {}


def emit(n, row, band):
    art["queries"][n] = row
    bands[band] = bands.get(band, 0) + 1


for n in sorted(q1):
    if n in crashed01:
        emit(n, {"sf0.1_sec": None, "sf1_sec": None, "growth": None,
                 "flag": "CRASHED", "status": "CRASHED-sf0.1"}, "CRASHED")
        continue
    if n in idle_failed and n not in idle:
        emit(n, {"sf0.1_sec": q01.get(n), "sf1_sec": None, "growth": None,
                 "flag": "CRASHED", "status": "CRASHED-idle"}, "CRASHED")
        continue
    if n in crashed1 and n not in idle:
        emit(n, {"sf0.1_sec": q01.get(n), "sf1_sec": None, "growth": None,
                 "flag": "CRASHED", "status": "CRASHED-sf1"}, "CRASHED")
        continue
    b = q01.get(n)
    if not b:
        continue
    s, fp, status = q1[n], None, "ok"
    if n in idle:
        s, fp, status = idle[n], q1[n], "idle-remeasure"
    g = s / b
    # same band boundaries as growth_table.py (r11): a 10x-data run is
    # linear AT 10x, so "~linear" spans 7-10.5x (5% noise allowance)
    # and anything above is SUPERLINEAR pending WorkProbe adjudication
    flag = ("SUPERLINEAR" if g > 10.5 else
            "sublinear" if g < 7 else "~linear")
    e = {"sf0.1_sec": b, "sf1_sec": s, "growth": round(g, 2),
         "flag": flag, "status": status}
    if fp is not None:
        e["sf1_sec_firstpass"] = fp
    emit(n, e, flag)

# completeness: every sf0.1-side query gets a row with an explicit
# status — declared exclusions carry their reason, anything else
# missing from the sf1 side is flagged loudly
for n in sorted(set(q01) - set(art["queries"])):
    if n in EXCLUDED_WORK_BOUND:
        emit(n, {"sf0.1_sec": q01.get(n), "sf1_sec": None, "growth": None,
                 "flag": "excluded", "status": "excluded-work-bound",
                 "note": EXCLUDED_WORK_BOUND[n]}, "excluded")
    else:
        emit(n, {"sf0.1_sec": q01.get(n), "sf1_sec": None, "growth": None,
                 "flag": "MISSING", "status": "missing-sf1-capture"},
             "MISSING")
if bands.get("MISSING"):
    print("WARNING: %d sf0.1 queries have no sf1 capture and no declared "
          "exclusion" % bands["MISSING"])
assert len(art["queries"]) >= len(q01), "census lost sf0.1-side rows"

out = (sys.argv[4] if len(sys.argv) > 4 else
       os.path.join(os.path.dirname(os.path.dirname(
           os.path.abspath(__file__))), "BENCH_sf1_census.json"))
json.dump(art, open(out, "w"), indent=1)
gs = sorted(((e["growth"], n) for n, e in art["queries"].items()
             if e["growth"] is not None), reverse=True)
print("census: %d queries paired; bands %s" % (len(gs), bands))
print("top 12 growth:")
for g, n in gs[:12]:
    print("  %-28s %.1fx  (%.2f -> %.2f s)" % (
        n, g, art["queries"][n]["sf0.1_sec"], art["queries"][n]["sf1_sec"]))
med = gs[len(gs) // 2][0]
print("median growth: %.2fx on 10x data" % med)
