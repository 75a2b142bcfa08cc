package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection by majority vote: every node starts as its own label, and
  * each round adopts the most frequent label among its in-neighbors
  * (count desc, then SMALLEST label — a total tie-break, so the result
  * is deterministic on any engine or partitioning, unlike the random
  * visit orders of the original paper). Fixed `iters` rounds, the
  * replayable form; on bipartite graphs free-running LP oscillates, so
  * a fixed round count is also the honest semantics.
  *
  * Complements the graph family: [[Dedup.clusters]] finds CONNECTED
  * components (any path joins a cluster); LP finds DENSE communities —
  * a bridge edge between two tight groups does not merge them because
  * it never wins the majority vote.
  *
  * Scale shape per round, same contract as [[PageRank]]: one join of
  * the label table to the edge list (both keyed on the node id), one
  * (node, label)-keyed partial-agg count, a node-keyed struct-max
  * aggregate for the argmax (lexicographic (c, −label) — no window
  * sort), one left join back to carry isolated nodes. Labels are lazily
  * checkpointed per round so the iterated plan never nests.
  */
object LabelProp {

  /** `edges` must have long columns (`src`, `dst`); propagation follows
    * edge direction (pass a symmetrized list for undirected graphs).
    * Returns (node, label) after `iters` rounds. Node set = src ∪ dst.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one round")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      // argmax as ONE struct-max aggregate — lexicographic (c, −label)
      // order gives highest count then lowest label, no window sort
      val won = e.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("__new"))
      labels = labels.join(won, Seq("node"), "left")
        .select(col("node"), coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }
}
