package graft

import org.apache.spark.sql.SparkSession

/** Champion-list recall sweep: recall@k of the champion BM25 ranking vs
  * the exact ranking at several champion-list sizes M, on the same fixed
  * hash-order query budget the audit query uses. The knob a deployment
  * turns BEFORE trusting the bounded path at a new corpus scale — r12
  * measured M=40 (100% recall@10 at sf0.01) collapsing to 25% mean
  * recall at sf1, so M is a per-corpus parameter, not a constant.
  * Usage: runMain graft.RecallSweep <sfDir> <m1,m2,...>
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ms = args(1).split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.quietDeclaredBoundedWindows()
    import Params._
    val docs = Tables.load(spark, dir, "documents")
    val exact = operators.TextOps.bm25TopK(docs, "doc_id", "text",
      Bm25QueryMod, Bm25K, queryBudget = AuditQueryBudget)
      .localCheckpoint() // one exact pass shared by every M
    ms.foreach { m =>
      val champ = operators.TextOps.bm25TopK(docs, "doc_id", "text",
        Bm25QueryMod, Bm25K, champM = m, queryBudget = AuditQueryBudget)
      val r = SparkEntry.recallAtK(exact, champ).collect()(0)
      println(s"[recall-sweep] M=$m n_queries=${r.getLong(0)} " +
        s"mean_recall_ppm=${r.getLong(1)} min_recall_ppm=${r.getLong(2)}")
    }
    spark.stop()
  }
}
