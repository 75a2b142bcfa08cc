package graft

import org.apache.spark.sql.SparkSession

/** Worst-case scale probes that the sf-scaled testdata cannot exercise —
  * synthetic inputs sized to the property under test (the oracle gate
  * never reads these; they exist to measure, not to verify).
  *
  * `probe=bpe`: the testdata corpus has a 31-word vocabulary, so the
  * bench BPE numbers are pure overhead measurements. This probe trains
  * on an n-word md5-derived vocabulary with a Zipf-ish frequency ramp —
  * the shape of a real web-corpus word count — to show the per-round
  * cost is vocabulary-bounded and the argmax/merge machinery holds at
  * realistic vocabulary sizes.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val iters = args.lift(1).map(_.toInt).getOrElse(graft.Params.BpeMerges)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // n pseudo-words, 4–12 chars of hex (truncation collisions collapse
    // in the groupBy, like a real word count), Zipf-ish frequencies
    val words = spark.range(n).selectExpr(
        "substring(md5(cast(id as string)), 1, 4 + cast(id % 9 as int)) as word",
        "cast(1 + 1000000 / (id + 1) as long) as freq")
      .groupBy("word").agg(org.apache.spark.sql.functions.sum("freq").as("freq"))
    val t0 = System.nanoTime()
    val (merges, state) = operators.TextOps.bpeTrainWords(words, iters)
    val m = merges.collect()
    val vocab = state.selectExpr("sum(size(syms))").collect()(0).getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"bpe","n_words":$n,"iters":$iters,"merges":${m.length},"sym_rows":$vocab,"secs":$secs%.2f}""")
    spark.stop()
  }
}
