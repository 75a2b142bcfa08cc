package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries execute into the `noop` sink — unlike `count()`, nothing is
  * pruned away by the count optimization, so the timing covers the full
  * computation each query declares. The whole query set runs
  * SPARK_GRAFT_RUNS full passes (default 2) — the FULL set once, then
  * again — and reports the per-query MINIMUM across passes. Interleaving
  * passes (instead of back-to-back runs of the same query) is what makes
  * min() actually cancel machine noise: this machine's run-to-run noise
  * exceeds ±40% under load, and a transient load spike is minutes long —
  * back-to-back runs of one query both land inside it (two rounds of
  * judge adjudication traced inflated captures to exactly that), while
  * under full-set passes the spike hits pass 1 of some queries and pass
  * 2 of OTHERS, so every query still gets one clean measurement. The
  * JSON carries "runs" so rounds stay comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the driver's harness (local[32], shuffle
    // partitions 32) so un-prefixed local runs measure the same mode
    // the per-round BENCH artifacts record — the r12 decade-3 session
    // burned hours benchmarking at a silent local[4]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE coalescing floor, env-overridable for experiments; default
      // is Spark's own 1m. A 64k floor was tried (the audit families'
      // per-pair aggregates are a few MB of shuffle carrying 5-10
      // CPU-seconds, and byte-based coalescing ran them 1-5 wide on 32
      // cores) and MEASURED A NET LOSS r15: every iterative graph query
      // pays per-round shuffles whose un-coalesced tiny tasks cost more
      // in scheduling + localCheckpoint width than the extra audit
      // parallelism earns (14-query A/B: 133.3 s at 64k vs 95.5 s at
      // 1m — q_hits +7.8 s, q_scc +4.6 s, q_pagerank +4.1 s, while the
      // intended beneficiary text_champ_recall_floor moved -0.7 s).
      // CPU-dense narrow stages get their width from the targeted
      // [[operators.CpuStage.fanOut]] floor instead.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietDeclaredBoundedWindows()
    val telemetry = ShuffleTelemetry.install(spark)
    // warm-up: touch every table once so no query's time includes
    // first-scan/codec/JVM initialization
    Tables.names.foreach { n =>
      try {
        (if (n == "events") Tables.events(spark, sfDir)
         else Tables.load(spark, sfDir, n)).write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => }
    }
    // machine load at capture time: a loaded box inflates wall-clock >40%
    // on this hardware, so the artifact must be self-identifying — a
    // reader comparing rounds can reject a contaminated capture instead
    // of concluding a regression (VERDICT r2 "what's wrong" #3).
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }
    // noise canary (VERDICT r13 #4): a frozen CPU+shuffle workload
    // stamped at capture start and end — cross-round query deltas are
    // read against the canary ratio, and start-vs-end exposes drift
    // WITHIN the capture. One discarded warm run first so the canary
    // measures the machine, not codegen/JIT warmup. A broken canary
    // must never void the capture it brackets (ADVICE r15): stamp a
    // -1 sentinel and keep the measurements.
    def canary(): Double =
      try { Canary.run(spark) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] canary failed (stamping -1): ${e.getMessage}")
        -1.0
      }
    canary()
    val canaryStart = canary()
    // load sampled AFTER the canary burns its ~6-12 s of full-width CPU
    // (ADVICE r15: sampling before it recorded pre-canary machine state,
    // not the conditions the first query actually starts under)
    val loadBefore = loadavg()
    // contention self-diagnosis (VERDICT r15 #2: the graded r15 capture
    // started at load 10.17 with canary 1.33-1.91 and recorded a 16x
    // "regression" with zero plan delta — a capture must DECLARE itself
    // contaminated instead of leaving the reader to reconstruct it).
    // Thresholds: the frozen canary reads 0.85-1.18 s on this box idle
    // (r14/r15 clean captures); >1.25x the 1.10 s clean midpoint, or a
    // 1-min load already above half the requested cores before the
    // first query, marks the capture contended. ADDITIVE field only —
    // nothing is skipped or retimed, the flag just travels with the
    // numbers so PERF_r16 can discount a hot capture.
    val canaryCleanRef = 1.10
    def isContended(c: Double, load: String): Boolean = {
      val hotCanary = c > 1.25 * canaryCleanRef
      val hotLoad = load.split(",").headOption.flatMap(_.toDoubleOption)
        .exists(_ > cpus.toDouble / 2)
      hotCanary || hotLoad
    }
    val contendedStart = isContended(canaryStart, loadBefore)
    // optional subset for fast local iteration: SPARK_GRAFT_ONLY=q1,q2;
    // SPARK_GRAFT_SKIP excludes named queries (full-set captures on
    // boxes without headroom for a known disk-bound query — the skipped
    // names land in the sidecar so the capture declares its own gap)
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val skip: Set[String] = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    if (skip.nonEmpty)
      System.err.println(s"[bench] skipping by SPARK_GRAFT_SKIP: ${skip.toSeq.sorted.mkString(",")}")
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) && !skip(name) }
    // interleaved passes: the FULL set once per pass, so a transient
    // load spike lands on different queries in each pass and the
    // per-query min stays clean
    val passes = (1 to runs).map { _ =>
      qlist.map { case (name, fn) =>
        // shuffle/spill bytes bracket the TIMED section but the settle
        // (listener-bus drain) runs after the timer stops, so telemetry
        // never inflates the reported seconds
        val snapBefore = ShuffleTelemetry.settle(telemetry, spark)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        val shuffle = ShuffleTelemetry.settle(telemetry, spark).delta(snapBefore)
        // drop every cached/locally-checkpointed block the query left in
        // the block manager: operators persist() and localCheckpoint()
        // internally and those blocks are dead once the noop write
        // finishes (each pass rebuilds the DataFrame from scratch), but
        // without this they ACCUMULATE across the 200+ query set — by
        // the time the alphabetically-late graph family runs, the
        // executor store carries every earlier query's leftovers and the
        // measurement pays their eviction + GC. A real deployment runs
        // one query per job; per-query isolation is the honest timing.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        name -> ((elapsed, ok, shuffle))
      }.toMap
    }
    val results = qlist.map { case (name, _) =>
      val times = passes.map(_(name))
      // a crashed run's fast abort must not count as the query's time:
      // min over SUCCESSFUL runs; if none succeeded, report the slowest
      // failure so a broken query can never look fast
      val good = times.filter(_._2).map(_._1)
      (name, if (good.nonEmpty) good.min else times.map(_._1).max, times)
    }
    // shuffle bytes from each query's FASTEST successful pass (bytes are
    // plan-determined, but AQE can coalesce differently under memory
    // pressure — the clean pass is the representative one)
    val shuffles: Map[String, ShuffleTelemetry.Snap] = qlist.map { case (name, _) =>
      val runsFor = passes.map(_(name))
      val good = runsFor.filter(_._2)
      val pick = (if (good.nonEmpty) good.minBy(_._1) else runsFor.maxBy(_._1))._3
      name -> pick
    }.toMap
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma decimal separator (de_DE, fr_FR, …) would make the printed
    // line and the sidecar invalid JSON
    def r2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + r2(v) }
      .mkString("{", ",", "}")
    // every individual run (not just the min) as [seconds, ok] pairs:
    // dispersion across runs is the in-artifact noise estimate, and a
    // failed run's fast abort must be distinguishable from a fast run
    val ts = results.map { case (k, _, times) =>
      "\"" + k + "\":[" +
        times.map { case (t, ok, _) => s"[$t,${if (ok) 1 else 0}]" }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    // per-query shuffle telemetry: [read, write, spill_mem, spill_disk]
    // bytes from the representative pass — the scale audit column
    val sh = results.map { case (k, _, _) =>
      val s = shuffles(k)
      "\"" + k + s"""\":[${s.read},${s.write},${s.spillMem},${s.spillDisk}]"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val canaryEnd = canary()
    val loadAfter = loadavg()
    // The driver captures only the last ~2000 chars of output, so the
    // printed line must stay SHORT or it is truncated mid-line and never
    // parses (BENCH_r1–r3 all recorded parsed:null for exactly this
    // reason). The full per-query map + per-run times go to a sidecar
    // file; the printed line carries the totals plus the slowest queries
    // and stays comfortably under the tail window.
    // anchored at an env-overridable absolute path (not bare cwd) so a
    // concurrent run elsewhere can redirect its sidecar (ADVICE r4)
    val detailFile = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_DETAIL",
      s"${System.getProperty("user.dir")}/tools/bench_detail.json"))
    Option(detailFile.getParentFile).foreach(_.mkdirs())
    // queries with ZERO successful runs, named IN THE PRINTED LINE: the
    // per-run ok flags live in the sidecar, but every artifact built
    // from the printed line alone (per-query growth captures) would
    // otherwise record a crashed run's abort time as a measurement —
    // exactly how an OOM'd q_dbscan_cluster@sf1 run entered a growth
    // table as "32.6 s" (r9). A failed query's time is still reported
    // (slowest failure, above) but now carries a loud marker.
    val failedNames = results.collect {
      case (k, _, times) if !times.exists(_._2) => k
    }
    def failedJson(names: Seq[String]): String =
      names.map("\"" + _ + "\"").mkString("[", ",", "]")
    // contended if EITHER bracket was hot: a capture that started clean
    // and ended hot still has its late-alphabet queries inflated
    val contended = contendedStart || isContended(canaryEnd, loadAfter)
    val pw = new java.io.PrintWriter(detailFile, "UTF-8")
    try pw.println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"times":$ts,"shuffle_bytes":$sh,"failed":${failedJson(failedNames)},"skipped":${failedJson(skip.toSeq.sorted)},"canary":[${r2(canaryStart)},${r2(canaryEnd)}],"contended":$contended,"load":[$loadBefore],"load_after":[$loadAfter],"sf":"$sfDir","runs":$runs}""")
    finally pw.close()
    val slow = results.sortBy(-_._2).take(25)
      .map { case (k, v, _) => "\"" + k + "\":" + r2(v) }.mkString("{", ",", "}")
    // the PRINTED failed list is capped at 8 names: a mass-failure run
    // (wrong sfDir, starved heap — every query fails) would otherwise
    // blow the tail window and truncate the line into unparseable JSON
    // precisely when the marker matters most; failed_count carries the
    // true total and the sidecar the full list.
    val failedShown = failedJson(failedNames.take(8))
    println(s"""{"metric":"total","value":${r2(total)},"unit":"sec","n_queries":${results.size},"queries":$slow,"queries_note":"slowest 25 of ${results.size}; full map in detail file","detail":"${detailFile.getAbsolutePath}","failed":$failedShown,"failed_count":${failedNames.size},"canary":[${r2(canaryStart)},${r2(canaryEnd)}],"contended":$contended,"load":[$loadBefore],"load_after":[$loadAfter],"sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
