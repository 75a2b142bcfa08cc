#!/usr/bin/env python3
"""Systematic int64/DECIMAL(38) envelope audit of every scaled-product
site in src/main/scala vs sf100 operand magnitudes.

Why: the sf1 growth census caught q_abc_class/q_lorenz wrapping int64
(cumulative cents x 1e6) one decade above the correctness gate, and
q_share/q_gini would have wrapped at sf10. This audit makes that catch
systematic instead of accidental:

  1. ENUMERATE every multiplication by a scale constant >= 1e4
     (1e4 / 1e6 / 1e8 / 1e12 / 2^32) in non-test Scala source, comment
     lines excluded. Oracles.scala is excluded (DuckDB-side SQL runs on
     HUGEINT, a 128-bit envelope).
  2. CLASSIFY each site against a curated rule table. An enumerated
     site with no matching rule FAILS the audit -- new product sites
     cannot appear silently.
  3. BOUND each class's max operand at sf100 from magnitudes MEASURED
     on the sf0.01 fixture via DuckDB, scaled by the class's growth law
     (rows/users/documents grow linearly with sf; per-row value
     magnitudes are constant; per-period and per-user totals grow
     linearly; second moments grow linearly through the population
     count). A x4 slack factor covers distribution drift.
  4. REPORT per-site headroom = limit / bound, where limit is
     2^63-1 for int64 arithmetic or 1e38 for DECIMAL(38,0) paths.
     Exit 1 if any site has headroom < 1 at sf100, or is unclassified.

Output: ENVELOPE_AUDIT.json (site rows sorted by headroom + summary).

Usage: python3 tools/envelope_audit.py [sf001_dir] [out_json]
"""
import json
import pathlib
import re
import sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "ENVELOPE_AUDIT.json"
SCALE = 10000          # sf0.01 -> sf100
SLACK = 4              # distribution-drift slack on measured magnitudes
I64 = 2 ** 63 - 1
DEC38 = 10 ** 38

# ---------------------------------------------------------------- measure
def measure(d):
    import duckdb
    con = duckdb.connect()
    q = {}
    (q["li_rows"], q["li_sum_cents"], q["li_max_cents"],
     q["li_sumsq_units"]) = con.execute(
        f"""select count(*), sum(cast(round(l_extendedprice*100) as bigint)),
                   max(cast(round(l_extendedprice*100) as bigint)),
                   sum(cast(floor(l_extendedprice) as bigint)
                       * cast(floor(l_extendedprice) as bigint))
            from '{d}/lineitem.parquet'""").fetchone()
    q["orders_rows"], q["ord_sum_cents"] = con.execute(
        f"""select count(*), sum(cast(round(o_totalprice*100) as bigint))
            from '{d}/orders.parquet'""").fetchone()
    q["max_month_cents"] = con.execute(
        f"""select max(s) from (
              select year(o_orderdate)*12+month(o_orderdate) k,
                     sum(cast(round(o_totalprice*100) as bigint)) s
              from '{d}/orders.parquet' group by 1)""").fetchone()[0]
    (q["events_rows"], q["users"], q["max_user_cents"],
     q["sumsq_user_cents"]) = con.execute(
        f"""with u as (select user_id,
                              sum(cast(round(value*100) as bigint)) c
                       from '{d}/events.parquet' group by 1)
            select (select count(*) from '{d}/events.parquet'),
                   count(*), max(c), sum(c*c) from u""").fetchone()
    q["docs"], q["tokens"] = con.execute(
        f"""select count(*),
                   sum(length(text)-length(replace(text,' ',''))+1)
            from '{d}/documents.parquet'""").fetchone()
    return q


# ------------------------------------------------------- class definitions
# Each class: (domain, grows_with_sf, bound_fn(quantities_at_sf100), note)
# bound_fn returns the max magnitude the PRODUCT reaches at sf100.
def classes(m):
    rows_max = max(m["li_rows"], m["events_rows"], m["orders_rows"],
                   m["docs"]) * SCALE * SLACK
    tokens100 = m["tokens"] * SCALE * SLACK
    month_cents = m["max_month_cents"] * SCALE * SLACK
    user_cents = m["max_user_cents"] * SLACK          # per-user ~ constant
    sumsq_user = m["sumsq_user_cents"] * SCALE * SLACK
    ord_rows = m["orders_rows"] * SCALE * SLACK
    sum_cents = max(m["li_sum_cents"], m["ord_sum_cents"]) * SCALE * SLACK
    li_sumsq = m["li_sumsq_units"] * SCALE * SLACK
    return {
        # -- int64-safe-by-construction families ---------------------------
        "count_x_1e6": ("int64", True, rows_max * 1e6,
            "count <= max table rows at sf100, x 1e6"),
        "tokens_x_1e6": ("int64", True, tokens100 * 1e6,
            "corpus token/shingle/line count x 1e6"),
        "perrow_x_1e6": ("int64", False, 1e6 * 1e6,
            "per-row/per-doc bounded quantity (<=1e6) x 1e6"),
        "hash32_x_1e6": ("int64", False, 2**32 * 1e6,
            "32-bit hash x 1e6 (sampling threshold compare)"),
        "ppm_x_2e32": ("int64", False, 1e6 * 2**32,
            "rate_ppm x 2^32 threshold: 4.6e18, constant by contract "
            "(ppm <= 1e6); 2.0x headroom, does not grow with data"),
        "sketchk_x_2e32": ("int64", False, 65536 * 2**32,
            "KMV sketch size k (<=65536) x 2^32"),
        "const_small": ("int64", False, 1e14,
            "compile-time / parameter-bounded constants"),
        "canary_fixed": ("int64", False, 6.4e13,
            "bench canary sum(n*n2): <= (8e6)^2 even if one md5-prefix "
            "key held every row; input size is frozen, never grows"),
        "entropy_e4_x_1e6": ("int64", False, 1e6 * 1e6,
            "e4-scaled log quantity (<=~1e6) x 1e6"),
        "pct_double": ("int64", False, 1e7,
            "floor(double in [0,1] x 1e6/1e7): bounded by the constant"),
        "curve_pack": ("int64", False, 2**20 * 2**32 * 4,
            "space-filling-curve bit packing: 15-bit coords by contract"),
        "woe_contrib": ("int64", True, 1e6 * 4e5,
            "ppm-difference (<=1e6) x e4-scaled ln ratio (<=~4e5)"),
        "diag_tool": ("int64", True, rows_max * 1e6,
            "ScaleProbe driver diagnostic, not a ship path; count x 1e6"),
        "stats_suite_sumsq_dec38": ("dec38", True, li_sumsq,
            "q_stats_suite second moments over whole-unit prices on "
            "DECIMAL(38,0) (r11 fix: int64 measured 1.03x at sf100)"),
        "theilsen_adjacent_slope": ("int64", True, month_cents * 1e6 / 80,
            "output slope_ppm ~ adjacent-month delta x 1e6 (result "
            "column, DECIMAL numerator upstream as of r11)"),
        # -- DECIMAL(38,0) families ----------------------------------------
        "dec38_cents_x_1e6": ("dec38", True, sum_cents * 1e6,
            "cumulative cents x 1e6 on DECIMAL(38,0) (q_abc/q_lorenz/"
            "q_share fix class, r10)"),
        "dec38_month_cents_x_1e6": ("dec38", True, month_cents * 1e6,
            "per-period total cents x 1e6 on DECIMAL(38,0) (r11 fix: "
            "pctChange/theilSen)"),
        "dec38_pairprod_x_1e6": ("dec38", True,
            (ord_rows ** 2) * 1e6,
            "count x count x 1e6 on DECIMAL(38,0) (r11 fix: ksTest/"
            "mannWhitney/assoc lift; modularity degree^2)"),
        "dec38_sumsq_cents": ("dec38", True, sumsq_user,
            "sum of squared per-user cents on DECIMAL(38,0) (r11 fix: "
            "cuped/welchT accumulators)"),
        "dec38_count_x_1e6": ("dec38", True, rows_max * 1e6,
            "count x 1e6 already on DECIMAL(38,0)"),
        "dec38_emd": ("dec38", True, rows_max ** 2 * 16 * 1e6,
            "EMD numerator/denominator n x n_total x bands on "
            "DECIMAL(38,0) (r11 fix)"),
        "dec38_acf": ("dec38", True, 80 * (80 * month_cents / 1e8) ** 2 * 1e6,
            "ACF moments in M$ units on DECIMAL(38,0): n^2-scaled "
            "centered products over a calendar-bounded series"),
        "dec38_small": ("dec38", True, rows_max * 1e6 * 1e6,
            "misc DECIMAL(38,0) site with operands <= count x 1e6 x 1e6"),
        # -- int64 second-moment accumulators ------------------------------
        "zipf_moments": ("int64", False, 5000 * (1.5e5 ** 2),
            "zipf/heaps OLS moments: topN (<=5000) x e4-scaled lns "
            "(<=1.5e5 each) -- bounded by construction, sf-independent"),
        "bootstrap_wsum": ("int64", True,
            8 * m["li_max_cents"] * m["li_rows"] * SCALE * SLACK,
            "Poisson bootstrap weighted sum: weight <= ~8 x cents, "
            "summed over rows"),
        "dsir_score": ("int64", False, 1e6 * 4e5,
            "DSIR per-doc score: per-doc bucket counts (<= doc tokens "
            "<= 1e6) x e4 log-ratio (<=4e5), grouped per doc_id"),
    }


# --------------------------------------------------------------- rule table
# (file-suffix, line-substring) -> class; first match wins. A site matching
# no rule fails the audit.
RULES = [
    ("Params.scala", "MixTargetsPpm", "const_small"),
    ("Params.scala", "* (k + 1) * 1000000L", "const_small"),
    ("ScaleProbe.scala", "", "diag_tool"),
    ("SparkEntry.scala", "sum(coalesce(hit, 0)) * 1000000L", "count_x_1e6"),
    ("SparkEntry.scala", "CAST(rev_cents AS DECIMAL(38,0))", "dec38_cents_x_1e6"),
    ("SparkEntry.scala", "CAST(gcum AS DECIMAL(38,0))", "dec38_cents_x_1e6"),
    ("SparkEntry.scala", "CAST(__cum AS DECIMAL(38,0))", "dec38_cents_x_1e6"),
    ("SparkEntry.scala", "1000000L * (n_docs - n_unique)", "count_x_1e6"),
    ("SparkEntry.scala", "n_hit * 1000000 div n_true", "count_x_1e6"),
    ("SparkEntry.scala", "percent_rank().over(w) * lit(1000000.0)", "pct_double"),
    ("SparkEntry.scala", "cume_dist().over(w) * lit(1000000.0)", "pct_double"),
    ("SparkEntry.scala", "l_discount\") * lit(1000000.0)", "pct_double"),
    ("SparkEntry.scala", "l_tax\") * lit(1000000.0)", "pct_double"),
    ("SparkEntry.scala", "l_discount\") * lit(10000000.0)", "pct_double"),
    ("SparkEntry.scala", "(grank - 1) * 1000000", "count_x_1e6"),
    ("SparkEntry.scala", "n_recip * 1000000", "count_x_1e6"),
    ("SparkEntry.scala", "1000000L * n_nodes", "count_x_1e6"),
    ("SparkEntry.scala", "cf * 1000000 div df", "tokens_x_1e6"),
    ("SparkEntry.scala", "qualityScore(col(\"text\")) * 10000", "pct_double"),
    ("SparkEntry.scala", "dedup_source_stats", "count_x_1e6"),
    ("Audit.scala", "ratePpm * 4294967296L", "ppm_x_2e32"),
    ("Canary.scala", "sum(col(\"n\") * col(\"n2\"))", "canary_fixed"),
    ("Spatial.scala", "maxPairs * 1000000L", "const_small"),
    ("Audit.scala", "cast(sampled_rows as decimal(38,0)) * 4294967296", "dec38_small"),
    ("Audit.scala", "1000000L * n_orphan", "count_x_1e6"),
    ("Audit.scala", "1000000 * n div n_total", "count_x_1e6"),
    ("Audit.scala", "cnt * 1000000L div n_total", "count_x_1e6"),
    ("Dedup.scala", "(li * 1000000L)", "perrow_x_1e6"),
    ("Dedup.scala", "n_dup * 1000000L div n_spans", "tokens_x_1e6"),
    ("Dedup.scala", "n_common * 1000000L", "count_x_1e6"),
    ("EventOps.scala", "1000000L * dau div mau", "count_x_1e6"),
    ("EventOps.scala", "(1000000L * w) div tw", "perrow_x_1e6"),
    ("EventOps.scala", "n * 1000000L / rowTot(s)", "count_x_1e6"),
    ("EventOps.scala", "eff * 1000000L / totEff", "const_small"),
    ("Experiment.scala", "cast(a as decimal(38,0)) * d * 1000000", "dec38_pairprod_x_1e6"),
    ("Experiment.scala", "k * 1000000L div n", "count_x_1e6"),
    ("Experiment.scala", "* 1000000 div (CAST(na AS DECIMAL(38,0))*nb)", "dec38_cents_x_1e6"),
    ("Experiment.scala", "(n_a - n_b) * 10000", "dec38_pairprod_x_1e6"),
    ("Experiment.scala", "CAST($tnum * 1000000 div $tden", "dec38_sumsq_cents"),
    ("Frequency.scala", "n_ab * 1000000L", "count_x_1e6"),
    ("Frequency.scala", "CAST(n_ab AS DECIMAL(38,0)) * n_baskets * 1000000", "dec38_pairprod_x_1e6"),
    ("Intervals.scala", "covered * 1000000L div span", "const_small"),
    ("Layout.scala", "* lit(4294967296L)", "curve_pack"),
    ("LinkPredict.scala", "n_common * 1000000L", "count_x_1e6"),
    ("Modularity.scala", "e_within * 1000000L div m", "count_x_1e6"),
    ("Modularity.scala", "degree_sum AS DECIMAL(38,0)", "dec38_pairprod_x_1e6"),
    ("Quality.scala", "hash32(id, salt) * lit(1000000L)", "hash32_x_1e6"),
    ("Quality.scala", "lit(pPpm) * lit(4294967296L)", "ppm_x_2e32"),
    ("Quality.scala", "cast(reported_cnt as decimal(38,0)) * 1000000", "dec38_count_x_1e6"),
    ("Quality.scala", "cast(n as decimal(38,0)) * ${pPpm}) * 1000000)", "dec38_count_x_1e6"),
    ("Quality.scala", "CAST(raw AS DECIMAL(38,0)) * 1000000", "dec38_emd"),
    ("Quality.scala", "n_good * 1000000 div g_tot", "woe_contrib"),
    ("Quality.scala", "n_bad * 1000000 div b_tot", "woe_contrib"),
    ("Quality.scala", "n_pos * 1000000 div n", "count_x_1e6"),
    ("Quality.scala", "1000000L * cum_pos", "count_x_1e6"),
    ("Sampling.scala", "rate * 4294967296.0", "ppm_x_2e32"),
    ("Sampling.scala", "w * lit(4294967296.0)", "ppm_x_2e32"),
    ("Sampling.scala", "* lit(1000000L) < col(\"rate_ppm\") * lit(4294967296L)", "ppm_x_2e32"),
    ("Sampling.scala", "1000000L * floor(sqrt", "count_x_1e6"),
    ("Sampling.scala", "trainThr = trainPm * 4294967296L", "ppm_x_2e32"),
    ("Sampling.scala", "(trainPm + valPm) * 4294967296L", "ppm_x_2e32"),
    ("Sampling.scala", "alloc * 1000000L div avail", "tokens_x_1e6"),
    ("Sampling.scala", "ratePpm * 4294967296L", "ppm_x_2e32"),
    ("Sampling.scala", "cast(sampled_sum as decimal(38,0)) * 4294967296", "dec38_small"),
    ("Sampling.scala", "(col(\"rtot\") + lit(buckets)).cast(\"double\"))) * 10000", "pct_double"),
    ("Sampling.scala", "n * 1000000L div n_fold", "count_x_1e6"),
    ("Similarity.scala", "n_hit * 1000000L div n_exact", "count_x_1e6"),
    ("Sketches.scala", "L * 4294967296L) div (element_at", "sketchk_x_2e32"),
    ("Sketches.scala", "(c * 1000000L) div kk", "perrow_x_1e6"),
    ("Sketches.scala", "CAST(__dmax AS DECIMAL(38,0)) * 1000000", "dec38_pairprod_x_1e6"),
    ("Sketches.scala", "CAST(u2 AS DECIMAL(38,0)) * 1000000", "dec38_pairprod_x_1e6"),
    ("Sketches.scala", "* 1000000 div (CAST((n_ref + n_cur) AS DECIMAL(38,0))", "dec38_pairprod_x_1e6"),
    ("Sketches.scala", "n_cur*t_ref AS DOUBLE)) * 10000", "entropy_e4_x_1e6"),
    ("Sketches.scala", "greatest(0L, sp) AS DECIMAL(38,0)) * 1000000", "dec38_count_x_1e6"),
    ("Sketches.scala", "greatest(0L, sq) AS DECIMAL(38,0)) * 1000000", "dec38_count_x_1e6"),
    ("Sketches.scala", "(h_num div n) * 1000000L", "entropy_e4_x_1e6"),
    ("Sketches.scala", "(n_ref + 1) * 1000000", "count_x_1e6"),
    ("Sketches.scala", "(n_cur + 1) * 1000000", "count_x_1e6"),
    ("Sketches.scala", "(mi_num div n) * 1000000L", "entropy_e4_x_1e6"),
    ("Spatial.scala", "targetMeanNb}L * 1000000L", "const_small"),
    ("Spatial.scala", "targetMeanNb * 1000000L", "const_small"),
    ("Spatial.scala", "ratePpm * 4294967296L", "ppm_x_2e32"),
    ("TextOps.scala", "(n_lines - n_uniq) * 1000000L", "perrow_x_1e6"),
    ("TextOps.scala", "(top_bg * 1000000L)", "perrow_x_1e6"),
    ("TextOps.scala", "(c_ab * 1000000L) div c_a", "tokens_x_1e6"),
    ("TextOps.scala", "inter * 1000000L div (sza + szb - inter)", "perrow_x_1e6"),
    ("TextOps.scala", "(1000000 * __n_alpha) div n_words", "perrow_x_1e6"),
    ("TextOps.scala", "n_novel * 1000000L div n_grams", "tokens_x_1e6"),
    ("TextOps.scala", "CAST(n*sxy - sx*sy AS DECIMAL(38,0)) * 1000000", "dec38_small"),
    ("TextOps.scala", "CAST(sy AS DECIMAL(38,0)) * 1000000", "dec38_small"),
    ("TextOps.scala", "div (n * 1000000) AS BIGINT", "dec38_small"),
    ("TextOps.scala", "hits * 1000000L div rnk", "perrow_x_1e6"),
    ("TextOps.scala", "n_hit * 1000000L div", "perrow_x_1e6"),
    ("TextOps.scala", "dcg_e6 * 1000000L div idcg_e6", "entropy_e4_x_1e6"),
    ("TextOps.scala", "n_boiler * 1000000 div n_lines", "perrow_x_1e6"),
    ("TextOps.scala", "(n_docs - bad_docs) * 1000000", "count_x_1e6"),
    ("TimeSeries.scala", "num * 1000000 div den", "dec38_acf"),
    ("TimeSeries.scala", "__num * 1000000 div __den", "dec38_acf"),
    ("TimeSeries.scala", "CAST(__y - __ls AS DECIMAL(38,0)) * 1000000", "dec38_month_cents_x_1e6"),
    ("TimeSeries.scala", "CAST(__y - __lc AS DECIMAL(38,0)) * 1000000", "dec38_month_cents_x_1e6"),
    ("TimeSeries.scala", ".cast(\"decimal(38,0)\") * lit(1000000L)", "dec38_month_cents_x_1e6"),
    ("UrlOps.scala", "domain_docs * 1000000L", "count_x_1e6"),
    # -- int64 second-moment accumulators (SUMPROD_PAT) --------------------
    ("SparkEntry.scala", "cast(\"decimal(38,0)\") * col(\"y\")", "stats_suite_sumsq_dec38"),
    ("SparkEntry.scala", "cast(\"decimal(38,0)\") * col(\"x\")", "stats_suite_sumsq_dec38"),
    ("TimeSeries.scala", "sum(col(\"cx\") * col(\"cx\"))", "dec38_acf"),
    ("TimeSeries.scala", "sum(col(\"cx\") * col(\"cx2\"))", "dec38_acf"),
    ("TextOps.scala", "sum(col(\"x\") * col(\"x\"))", "zipf_moments"),
    ("TextOps.scala", "sum(col(\"x\") * col(\"y\"))", "zipf_moments"),
    ("Sketches.scala", "sum(col(\"__w\") * col(\"__x\"))", "bootstrap_wsum"),
    ("Sampling.scala", "sum(col(\"c\") * col(\"lam4\"))", "dsir_score"),
]

SITE_PAT = re.compile(
    r'\*\s*(lit\()?(10000|1000000|100000000|1000000000000|4294967296)L?\b'
    r'|\b(10000|1000000|1000000000000|4294967296)L?\s*\*')
# int64 sum-of-products (second moments): the cuped/welchT overflow class
# fixed in r11 -- any NEW such accumulator must be classified here too.
SUMPROD_PAT = re.compile(r'sum\((col|when)\(.*\*\s*col\(')


def enumerate_sites():
    out = []
    for p in sorted(pathlib.Path("src/main/scala").rglob("*.scala")):
        if p.name == "Oracles.scala":
            continue
        for i, line in enumerate(p.read_text(errors="replace").splitlines(), 1):
            s = line.strip()
            if s.startswith("//") or s.startswith("*") or s.startswith("/**"):
                continue
            if SITE_PAT.search(line) or (
                    SUMPROD_PAT.search(line) and "decimal(38" not in line):
                out.append((str(p), i, s))
    return out


def main():
    m = measure(SF_DIR)
    cls = classes(m)
    rows, unclassified = [], []
    for f, ln, text in enumerate_sites():
        hit = next((c for (fs, sub, c) in RULES
                    if f.endswith(fs) and sub in text), None)
        if hit is None:
            unclassified.append(f"{f}:{ln}: {text[:90]}")
            continue
        dom, grows, bound, note = cls[hit]
        limit = I64 if dom == "int64" else DEC38
        headroom = limit / bound
        rows.append({"file": f, "line": ln, "cls": hit, "domain": dom,
                     "grows_with_sf": grows,
                     "bound_sf100": f"{bound:.3e}",
                     "headroom_sf100": round(headroom, 2),
                     "status": "OK" if headroom >= 1 else "FIX",
                     "note": note, "src": text[:90]})
    rows.sort(key=lambda r: r["headroom_sf100"])
    bad = [r for r in rows if r["status"] == "FIX"]
    report = {
        "sf_base_dir": SF_DIR, "scale_to": "sf100",
        "slack_factor": SLACK,
        "measured_sf001": {k: int(v) for k, v in m.items()},
        "n_sites": len(rows) + len(unclassified),
        "n_ok": len(rows) - len(bad), "n_fix": len(bad),
        "n_unclassified": len(unclassified),
        "unclassified": unclassified,
        "min_headroom": rows[0]["headroom_sf100"] if rows else None,
        "sites": rows,
    }
    pathlib.Path(OUT).write_text(json.dumps(report, indent=1))
    print(f"sites={report['n_sites']} ok={report['n_ok']} "
          f"fix={report['n_fix']} unclassified={report['n_unclassified']} "
          f"min_headroom={report['min_headroom']}")
    for r in rows[:10]:
        print(f"  {r['headroom_sf100']:>12}x {r['cls']:<28} "
              f"{r['file']}:{r['line']}")
    if bad or unclassified:
        for u in unclassified:
            print("UNCLASSIFIED:", u)
        sys.exit(1)


if __name__ == "__main__":
    main()
