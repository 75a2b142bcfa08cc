#!/usr/bin/env python3
"""Assemble the FULL-library sf0.1 -> sf1 growth census (round 9).

Unlike growth_table.py (the slowest-20 deep-dive), this pairs the full
per-query maps from two bench_detail captures — every query the library
ships, minus the five known work-bound exact paths measured separately
(dedup_prefix_filter, dedup_lsh_recall, text_bm25, text_rrf_fuse,
text_rank_metrics; see BENCH_sf1_r9.json).

Inputs:
  argv[1]: bench_detail JSON for sf0.1 (runs>=2)
  argv[2]: bench_detail JSON for sf1 (runs=1 census)
  argv[3]: optional idle re-measure dir (<query>.json bench lines) —
           substitutes sf1 values for queries whose census slot was
           load-contaminated; firstpass kept in sf1_sec_firstpass.
Output: BENCH_sf1_census_r9.json + a summary on stdout.
"""
import sys, json, os, glob

sf01 = json.load(open(sys.argv[1]))
sf1 = json.load(open(sys.argv[2]))
# a crashed query still gets a time in the bench output (slowest
# failure, so breakage can't look fast) — but it is NOT a measurement;
# honor the failed arrays on every input, like growth_table.py does
crashed = set(sf01.get("failed", [])) | set(sf1.get("failed", []))
idle = {}
if len(sys.argv) > 3:
    for p in glob.glob(os.path.join(sys.argv[3], "*.json")):
        d = json.load(open(p))
        for n, s in d.get("queries", {}).items():
            if n in d.get("failed", []):
                crashed.add(n)
            else:
                idle[n] = s

q01, q1 = sf01["queries"], sf1["queries"]
art = {
    "sf_base": "/root/testdata/sf0.1 (runs=%s, min)" % sf01.get("runs"),
    "sf_big": "tmp/sf1 (ScaleUp 10x; runs=%s)" % sf1.get("runs"),
    "excluded": "dedup_prefix_filter dedup_lsh_recall text_bm25 "
                "text_rrf_fuse text_rank_metrics (work-bound exact paths, "
                "measured in BENCH_sf1_r9.json)",
    "queries": {},
}
bands = {}
for n in sorted(q1):
    if n in crashed and n not in idle:
        art["queries"][n] = {"sf0.1_sec": q01.get(n), "sf1_sec": None,
                             "growth": None, "flag": "CRASHED"}
        bands["CRASHED"] = bands.get("CRASHED", 0) + 1
        continue
    b = q01.get(n)
    if not b:
        continue
    s, fp = q1[n], None
    if n in idle:
        s, fp = idle[n], q1[n]
    g = s / b
    # same band boundaries as growth_table.py: sublinear strictly
    # below 8x, SUPERLINEAR strictly above 12x
    flag = ("SUPERLINEAR" if g > 12 else
            "sublinear" if g < 8 else "~linear")
    e = {"sf0.1_sec": b, "sf1_sec": s, "growth": round(g, 2), "flag": flag}
    if fp is not None:
        e["sf1_sec_firstpass"] = fp
    art["queries"][n] = e
    bands[flag] = bands.get(flag, 0) + 1

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_sf1_census_r9.json")
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
