package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree orientation — the classic
  * bounded-fan-out formulation (cf. Suri & Vassilvitskii, "Counting
  * Triangles and the Curse of the Last Reducer", WWW'11).
  *
  * The naive wedge join fans out quadratically in the HIGHEST degree:
  * one celebrity node with degree 10⁶ yields 5·10¹¹ wedges in a single
  * reducer. Orienting every edge from its (degree, id)-smaller endpoint
  * to the larger turns the graph into a DAG where each vertex's
  * OUT-degree is O(√m) regardless of its true degree — so the wedge
  * join's per-key fan-out is bounded by construction, which is the
  * difference between "finishes at 100 TB" and "last reducer never
  * ends". Each triangle then has exactly one apex (its orientation-
  * minimal vertex) and is found exactly once: apex→x, apex→y wedges
  * closed by the canonical undirected edge (x, y).
  *
  * Pure integer joins/aggregates; the oracle replays the same
  * orientation bit-for-bit.
  */
object Triangles {

  /** Per-node triangle participation counts `(node, n_tri)` over an
    * undirected edge list (`src`, `dst`; self-loops dropped, direction
    * and duplicates ignored). Nodes in no triangle are absent.
    *
    * Edge-iterator form over the orientation: per oriented edge (s, t),
    * the closures are N⁺(s) ∩ N⁺(t) — out-adjacency ARRAYS (bounded at
    * O(√m) elements by the orientation) are attached to both endpoints
    * and intersected map-side, so the only exploded rows are the actual
    * triangles. The earlier wedge-join form shuffled every wedge to the
    * closure probe — 41 M wedge rows vs 1.9 M triangles on the sf0.1
    * co-purchase graph (21×); this form cut the query 7.9 s → measured
    * in §5.5. Each triangle has a unique DAG order a→b→c and is found
    * exactly once, at edge (a, b) with witness c.
    *
    * The canonical edge set feeds two consumers (degrees, orientation)
    * and the oriented set three (adjacency build, both probe sides) —
    * both lazily checkpointed so each computes once per action.
    */
  def perNodeCounts(edges: DataFrame): DataFrame = {
    val e = canonical(edges)
    countsOnCanonical(e, degrees(e))
  }

  /** Canonical undirected edge set (u < v, self-loops dropped, duplicates
    * collapsed), lazily checkpointed: the shared base of both public
    * entry points.
    */
  private def canonical(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
    .where(col("u") =!= col("v"))
    .distinct()
    .localCheckpoint(false)

  /** Degree per node `(n, d)` over a canonical edge set. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

  /** Triangle counting core over an ALREADY-canonical edge set and its
    * degree table — split out so [[clusteringCoef]], which needs the
    * canonical edges and degrees for its own frame anyway, builds them
    * ONCE (the previous nesting re-canonicalized, re-distincted and
    * re-aggregated degrees behind the checkpoint boundary, where
    * Catalyst subtree reuse cannot see the duplication).
    */
  private def countsOnCanonical(e: DataFrame, deg: DataFrame): DataFrame = {
    val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
      .localCheckpoint(false)
    // sorted out-adjacency per node — O(√m) elements by construction,
    // so collect_list is bounded regardless of true degrees
    val adj = oriented.groupBy(col("s"))
      .agg(sort_array(collect_list(col("t"))).as("nbrs"))
    // SHUFFLE_HASH, not sort-merge: the probe rows carry the adjacency
    // ARRAYS, and SMJ must externally sort those fat rows — measured
    // 2.9 GB of sf1 disk spill in exactly these two joins. A shuffled
    // hash join builds on the (node, nbrs) side — one bounded hash map
    // per partition — and streams the probe side unsorted; no order is
    // needed downstream, so the sort was pure waste. (Broadcast is the
    // wrong fix: adjacency grows with the graph.)
    val tri = oriented
      .join(adj.select(col("s"), col("nbrs").as("au")).hint("shuffle_hash"), "s")
      // endpoints with no out-edges close nothing: inner join prunes them
      .join(adj.select(col("s").as("t"), col("nbrs").as("av")).hint("shuffle_hash"), "t")
      .select(col("s").as("a"), col("t").as("b"),
        explode(array_intersect(col("au"), col("av"))).as("w"))
    tri.select(explode(array(col("a"), col("b"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Local clustering coefficient per node: 2·tri(v) / (d(v)·(d(v)−1))
    * in exact ppm — how close each node's neighborhood is to a clique,
    * the standard cohesion feature for community/fraud scoring on
    * co-occurrence graphs. Nodes in no triangle still score (coef 0):
    * the frame is the degree-≥2 node list LEFT-joined with
    * [[perNodeCounts]], because "never closes a wedge" is signal, not
    * absence. Degree-1 nodes have no defined coefficient and are
    * excluded rather than nulled.
    *
    * Cost on top of the triangle pass: one node-keyed join — the
    * canonical edge set and the degree aggregate are the SAME builds
    * the triangle counter needs and are shared with it (r15: the
    * earlier nesting rebuilt both behind the checkpoint boundary).
    * Both sides are bounded by edges, and the triangle side is the
    * O(√m)-oriented counter, so the scale posture is
    * [[perNodeCounts]]'s.
    */
  def clusteringCoef(edges: DataFrame): DataFrame = {
    val e = canonical(edges)
    val deg = degrees(e)
    deg.select(col("n").as("node"), col("d")).where(col("d") >= 2)
      .join(countsOnCanonical(e, deg),
        Seq("node"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("node"), col("d"), col("n_tri"),
        expr("(2000000 * n_tri) div (d * (d - 1))").as("coef_ppm"))
  }
}
