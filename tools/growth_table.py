#!/usr/bin/env python3
"""Assemble the sf0.1 -> sf1 growth table from per-query bench captures.

Inputs:
  argv[1]: bench JSON for sf0.1 (one line, the Bench main's output)
  argv[2]: directory of per-query sf1 JSONs (<query>.json each holding
           either a Bench line or {"timeout": N})
  argv[3]: optional directory of IDLE re-measures for flagged queries —
           the first capture ran queries back-to-back, so a query whose
           slot overlapped another query's JVM teardown (or a driver
           cron) reads high; any query present here has its sf1 time
           replaced by the idle value (first-pass value kept as
           sf1_sec_firstpass) and its flag recomputed.
Output: BENCH_sf1_r9.json artifact (combined) + a markdown table on
stdout for SURVEY §5. Growth = sf1_sec / sf0.1_sec on 10x data.
Bands (r11, tightened per VERDICT r10: 11.2x must never print
"~linear"): sublinear < 7x, ~linear 7-10.5x (10x data + 5% noise),
SUPERLINEAR > 10.5x — superlinear rows then get the WorkProbe
adjudication (work-bound vs engine regression) in SURVEY §5.
"""
import sys, json, os, glob


def load_dir(path):
    out = {}
    for p in glob.glob(os.path.join(path, "*.json")):
        name = os.path.basename(p)[:-5]
        try:
            d = json.load(open(p))
        except Exception:
            d = {"timeout": -1}
        if "timeout" in d:
            out[name] = {"sec": None, "timeout": d["timeout"]}
        elif name in d.get("failed", []):
            # Bench reports a crashed query's abort time (slowest
            # failure) so it can't look fast — but it is NOT a
            # measurement; treat like a DNF
            out[name] = {"sec": None, "timeout": -2}
        else:
            out[name] = {"sec": d["queries"][name], "load": d.get("load")}
    return out


sf01 = json.load(open(sys.argv[1]))
q01 = sf01["queries"]
perq = load_dir(sys.argv[2])
idle = load_dir(sys.argv[3]) if len(sys.argv) > 3 else {}

rows = []
for name, d in sorted(perq.items()):
    base = q01.get(name)
    first = d["sec"]
    re_entry = idle.get(name)
    if re_entry is not None and re_entry["sec"] is None:
        # the idle re-measure ITSELF failed: the first-pass value was
        # already adjudicated as contaminated, so silently reusing it
        # would launder a non-measurement — emit an explicit DNF
        rows.append((name, base, None, first, None,
                     "DNF(idle-remeasure-failed)"))
        continue
    re = re_entry["sec"] if re_entry is not None else None
    sec = re if re is not None else first
    if sec is None:
        t = d.get("timeout", 0)
        verdict = ("CRASHED(failed-marker)" if t == -2 else
                   "DNF(unparseable)" if t < 0 else "DNF(>%ds)" % t)
        rows.append((name, base, None, None, None, verdict))
        continue
    if not base:
        # a growth verdict needs BOTH sides measured — never fabricate
        # a flag for a query missing its sf0.1 baseline
        rows.append((name, None, sec, None, None, "no-baseline"))
        continue
    g = sec / base
    flag = ("SUPERLINEAR" if g > 10.5 else
            "sublinear" if g < 7 else "~linear")
    rows.append((name, base, sec, (first if re is not None else None), g, flag))

art = {
    "sf_base": "/root/testdata/sf0.1", "sf_big": "tmp/sf1 (ScaleUp 10x of sf0.1)",
    "runs_base": sf01.get("runs"), "runs_big": 1,
    "note": "sf1_sec_firstpass present => first capture adjudicated as "
            "load-contaminated or a silently-failed run (q_dbscan_cluster: "
            "its 32.6s first capture was an OOM abort at the runner's 8g "
            "driver heap, detected r9 and re-measured idle at 16g); "
            "sf1_sec is the idle re-measure",
    "queries": {},
}

# ship-path companion captures (the bounded-work twins of the flagged
# exact paths, measured at the same scale step): fold in when present
here = os.path.dirname(os.path.abspath(__file__))
ship01 = os.path.join(here, "bench_ship_sf01_r9.json")
ship1 = os.path.join(here, "bench_ship_sf1_r9.json")
if os.path.exists(ship01) and os.path.exists(ship1):
    s01 = json.load(open(ship01))["queries"]
    s1 = json.load(open(ship1))["queries"]
    art["ship_paths"] = {
        n: {"sf0.1_sec": s01[n], "sf1_sec": s1[n],
            "growth": round(s1[n] / s01[n], 2)}
        for n in sorted(s01) if n in s1
    }
for n, b, s, fp, g, f in rows:
    e = {"sf0.1_sec": b, "sf1_sec": s,
         "growth": (round(g, 2) if g else None), "flag": f,
         "status": ("idle-remeasure" if (fp is not None and s is not None)
                    else "ok" if g is not None else f)}
    if fp is not None:
        e["sf1_sec_firstpass"] = fp
    art["queries"][n] = e
outp = (sys.argv[4] if len(sys.argv) > 4 else
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_sf1_growth.json"))
json.dump(art, open(outp, "w"), indent=1)

print("| query | sf0.1 s | sf1 s (10x) | growth | verdict |")
print("| --- | --- | --- | --- | --- |")
for n, b, s, fp, g, f in sorted(rows, key=lambda r: -(r[4] or 99)):
    star = "*" if fp is not None else ""
    print(f"| {n} | {b} | {(str(s) + star) if s is not None else '—'} | "
          f"{f'{g:.1f}x' if g else '—'} | {f} |")
if any(fp is not None for _, _, _, fp, _, _ in rows):
    print("\n`*` = idle re-measure (first back-to-back capture was "
          "load-contaminated; original value in sf1_sec_firstpass)")
