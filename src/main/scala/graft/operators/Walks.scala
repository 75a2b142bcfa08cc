package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H}

/** Deterministic random-walk corpus generation — the sampling pass
  * behind DeepWalk/node2vec-style graph embeddings: emit fixed-length
  * walks from seed nodes, one row per (walk, step, node), ready to feed
  * a sequence model exactly like token windows feed a language model.
  *
  * "Random" is a salted hash, not rand(): the neighbor index at step i
  * is `hash32(salt : walk_id : i : node) mod degree(node)` over the
  * node's rank-ordered adjacency. Same graph + salt → the same corpus
  * on any engine (the DuckDB twin replays it with WITH RECURSIVE), any
  * partitioning, any retry — rand() would make every recovery a
  * different corpus. Each step's hash includes the walk id AND the
  * position, so two walks crossing the same node diverge independently.
  *
  * Distributed shape: adjacency is ranked once under a src-partitioned
  * window (one shuffle, no global sort) and reused every step; each
  * step is two keyed equi-joins (frontier⋈degree on node, then
  * pick⋈adjacency on (node, rank)) — frontier rows = live walks, never
  * edge-sized. Walks that reach a dead-end node (degree 0) stop there:
  * the inner join against the degree table drops them, in both engines.
  * The step count is a fixed small constant (walk length), so the plan
  * is `steps` joins deep — no iterate-to-convergence checkpointing
  * needed at typical walk lengths (≤ ~20).
  */
object Walks {

  /** edges: DIRECTED (src, dst) rows — pass both directions for an
    * undirected graph; duplicates are collapsed. seeds: (node).
    * Returns (walk_id, step, node), step 0 = the seed itself.
    */
  def randomWalks(edges: DataFrame, seeds: DataFrame, steps: Int,
                  salt: String): DataFrame = {
    require(steps >= 1 && steps <= 64, "walk length must be in [1, 64]")
    // every step joins the same ranked adjacency — materialize it once
    // (localCheckpoint, the multi-consumer pattern from TextOps) instead
    // of replaying the distinct+window `steps` times
    val adj = edges.select(col("src"), col("dst")).distinct()
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("src")).orderBy(col("dst"))) - 1)
      .localCheckpoint(false)
    // deg is consumed once per STEP — materialize the aggregate once
    // instead of replaying it from the adj checkpoint every step
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    var frontier = seeds.select(col("node").as("walk_id"),
      lit(0L).as("step"), col("node"))
    var acc = frontier
    for (i <- 1 to steps) {
      val picked = frontier
        .join(deg, frontier("node") === deg("src"))
        .select(col("walk_id"), col("node").as("cur"),
          (H.hash32(concat_ws(":", col("walk_id"), lit(i), col("node")), salt)
            % col("deg")).as("pick"))
      // per-step checkpoint: frontier_i feeds BOTH the acc union branch
      // and step i+1's lineage — unmaterialized, step 1's subtree
      // re-executes once per LATER step (plan was 1113 lines at 8
      // steps; the iterated-loop contract of Bfs/PageRank)
      frontier = picked
        .join(adj, picked("cur") === adj("src") && picked("pick") === adj("rnk"))
        .select(col("walk_id"), lit(i.toLong).as("step"), col("dst").as("node"))
        .localCheckpoint(false)
      acc = acc.unionAll(frontier)
    }
    acc
  }
}
