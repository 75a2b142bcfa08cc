#!/usr/bin/env python3
"""Head-to-head: reference etl_imdb.py vs graft.ImdbMain on the same
synthetic IMDb dump, same flags, same machine. Generates raw tsv.gz,
runs both, times them, and value-compares every output table in DuckDB.

Usage: python3 tools/headtohead.py [n_titles] [runs]
(driver-side tooling: python/pyspark/duckdb are NOT library deps)
"""
import gzip
import random
import subprocess
import sys
import time
from pathlib import Path

N_TITLES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
BASE = Path("/tmp/graft_h2h")
RAW = BASE / "raw"
GENRES = ["Action", "Comedy", "Drama", "Horror", "Sci-Fi", "Romance", "Thriller",
          "Documentary", "Animation", "Crime", "Fantasy", "Mystery", "Western",
          "War", "Musical", "Sport", "History", "Family", "Adventure", "Biography"]
TYPES = ["movie", "movie", "movie", "movie", "short", "tvSeries", "video"]


def generate():
    RAW.mkdir(parents=True, exist_ok=True)
    rnd = random.Random(7)
    tpath = RAW / "title.basics.tsv.gz"
    rpath = RAW / "title.ratings.tsv.gz"
    if tpath.exists() and rpath.exists():
        print("[gen] reusing existing dump")
        return
    t0 = time.time()
    with gzip.open(tpath, "wt") as t, gzip.open(rpath, "wt") as r:
        t.write("tconst\ttitleType\tprimaryTitle\toriginalTitle\tisAdult\t"
                "startYear\truntimeMinutes\tgenres\n")
        r.write("tconst\taverageRating\tnumVotes\n")
        for i in range(N_TITLES):
            tc = f"tt{i:08d}"
            tt = TYPES[rnd.randrange(len(TYPES))]
            title = f"Title {i} {GENRES[i % len(GENRES)]}"
            year = "\\N" if rnd.random() < 0.05 else str(1900 + rnd.randrange(126))
            rt = "\\N" if rnd.random() < 0.1 else str(40 + rnd.randrange(160))
            gs = ("\\N" if rnd.random() < 0.08 else
                  ",".join(rnd.sample(GENRES, 1 + rnd.randrange(3))))
            t.write(f"{tc}\t{tt}\t{title}\t{title}\t{i % 2}\t{year}\t{rt}\t{gs}\n")
            if rnd.random() < 0.5:
                r.write(f"{tc}\t{round(1.0 + rnd.random() * 9.0, 1)}\t{rnd.randrange(1, 2_000_000)}\n")
    print(f"[gen] wrote {N_TITLES} titles in {time.time() - t0:.1f}s")


def run_ref(out: Path) -> float:
    t0 = time.time()
    env = dict(__import__("os").environ,
               PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell")
    subprocess.run(
        [sys.executable, "/root/reference/src/etl_imdb.py",
         "--raw-dir", str(RAW), "--dw-dir", str(out / "dw"),
         "--marts-dir", str(out / "marts"), "--min-votes", "1000", "--top-n", "10"],
        check=True, capture_output=True, env=env)
    return time.time() - t0


def run_graft(out: Path, jar: str) -> float:
    t0 = time.time()
    subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[*]",
         "--driver-memory", "8g",
         "--class", "graft.ImdbMain", jar,
         "--raw-dir", str(RAW), "--dw-dir", str(out / "dw"),
         "--marts-dir", str(out / "marts"), "--min-votes", "1000", "--top-n", "10"],
        check=True, capture_output=True)
    return time.time() - t0


def compare(ref: Path, gr: Path):
    import duckdb
    con = duckdb.connect()
    tables = [("dw", "dim_year"), ("dw", "dim_title"), ("dw", "dim_genre"),
              ("dw", "bridge_title_genre"),
              ("dw", "fact_ratings"), ("marts", "mart_year_kpi"),
              ("marts", "mart_top_genre_year"), ("marts", "mart_top_year_by_rating"),
              ("marts", "mart_rating_distribution")]
    ok = True
    for d, t in tables:
        a = f"read_parquet('{ref / d / t}/**/*.parquet', hive_partitioning=true)"
        b = f"read_parquet('{gr / d / t}/**/*.parquet', hive_partitioning=true)"
        # mart top-N under ties is order-dependent in the REFERENCE (ranks
        # by one metric alone); compare on the deterministic columns (the
        # ranking metric itself), and round float aggregates (partial-agg
        # summation order differs run to run in BOTH engines)
        if t == "mart_top_genre_year":
            a = f"(SELECT yearkey, genrekey, num_votes, rk FROM {a})"
            b = f"(SELECT yearkey, genrekey, num_votes, rk FROM {b})"
        elif t == "mart_top_year_by_rating":
            a = f"(SELECT yearkey, avg_rating, rk FROM {a})"
            b = f"(SELECT yearkey, avg_rating, rk FROM {b})"
        elif t == "mart_year_kpi":
            a = f"(SELECT yearkey, n_movies, round(mean_rating, 6) AS m, total_votes FROM {a})"
            b = f"(SELECT yearkey, n_movies, round(mean_rating, 6) AS m, total_votes FROM {b})"
        diff = con.execute(
            f"SELECT (SELECT count(*) FROM ((SELECT * FROM {a}) EXCEPT ALL (SELECT * FROM {b}))) + "
            f"(SELECT count(*) FROM ((SELECT * FROM {b}) EXCEPT ALL (SELECT * FROM {a})))").fetchone()[0]
        n = con.execute(f"SELECT count(*) FROM {a}").fetchone()[0]
        status = "OK" if diff == 0 else f"DIFF={diff}"
        if diff != 0:
            ok = False
        print(f"[cmp] {t}: {n} rows {status}")
    return ok


def main():
    generate()
    print("[build] sbt package")
    subprocess.run(["sbt", "-batch", "package"], cwd="/root/repo", check=True,
                   capture_output=True)
    jar = next(p for p in Path("/root/repo/target/scala-2.13").glob("*.jar")
               if not p.name.endswith("-tests.jar"))
    ref_out, gr_out = BASE / "ref", BASE / "graft"
    for i in range(RUNS):
        tr = run_ref(ref_out)
        tg = run_graft(gr_out, str(jar))
        print(f"[run {i + 1}] reference {tr:.1f}s  graft {tg:.1f}s")
    ok = compare(ref_out, gr_out)
    print("[result]", "OUTPUTS IDENTICAL" if ok else "OUTPUTS DIFFER")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
