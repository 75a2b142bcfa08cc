package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the coloring
  * algorithm (Orzan 2004; the standard distributed SCC shape, also the
  * FW-BW work-horse in Slota et al.): undirected CC ([[Dedup.clusters]])
  * over-merges any two nodes bridged in ONE direction, so cycles/mutual
  * reachability need their own operator.
  *
  * Per outer round, on the still-unassigned subgraph:
  *   1. forward min-label fixpoint: color(v) ← min over in-neighbors —
  *      converges to color(v) = min node id that can REACH v;
  *   2. nodes with color(v) = v are roots; the SCC of root r is exactly
  *      {v : color(v) = r ∧ v →* r}, found by BACKWARD propagation of
  *      the root mark restricted to color-r nodes (restriction is
  *      sound: any node on a v→…→r path with color(v) = r must itself
  *      have color r — a smaller reacher of it would also reach v
  *      through r, contradicting minimality);
  *   3. assign those nodes scc_id = r, peel them from nodes and edges.
  * Every round assigns ≥ one SCC PER surviving color root (many in
  * parallel), so rounds track the depth of the SCC condensation order,
  * not SCC count; a `maxOuterRounds` guard raises instead of looping
  * forever (adversarial chains of descending-id SCCs hit it — the
  * [[Msf]] convergence-refusal contract).
  *
  * Scale shape: every join is node-keyed (label table ⋈ edge list);
  * fixpoints are detected by one count() action per inner step (the
  * standard driver-loop bill every iterative op here pays); all loop
  * leaves barrier through [[Barrier.local]] so plans never nest and
  * carried stats never compound (SURVEY §5.9).
  */
object Scc {

  /** `edges`: long columns (`src`, `dst`), direction src→dst.
    * Self-loops are dropped (a self-loop never changes an SCC); node
    * set = src ∪ dst of the remaining edges. Returns (node, scc_id)
    * with scc_id = min node id of the component.
    */
  def scc(edges: DataFrame, maxOuterRounds: Int = 16,
          maxInnerRounds: Int = 64): DataFrame = {
    require(maxOuterRounds >= 1 && maxInnerRounds >= 1)
    val e0 = Barrier.local(edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct(), eager = true)
    var live = e0
    var remaining = Barrier.local(
      e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct(), eager = true)
    var nRemaining = remaining.count()
    var result: Option[DataFrame] = None
    var outer = 0
    while (nRemaining > 0 && outer < maxOuterRounds) {
      outer += 1
      // ---- forward min-label fixpoint: color = min reacher ----
      var colors = Barrier.local(
        remaining.select(col("node"), col("node").as("color")), eager = true)
      var changed = 1L
      var inner = 0
      while (changed > 0) {
        inner += 1
        require(inner <= maxInnerRounds, s"scc: forward fixpoint still " +
          s"moving after $maxInnerRounds rounds — raise maxInnerRounds")
        val cand = live
          .join(colors.select(col("node").as("src"), col("color").as("cs")), "src")
          .groupBy(col("dst").as("node")).agg(min(col("cs")).as("cand"))
        val next = Barrier.local(colors.join(cand, Seq("node"), "left")
          .select(col("node"),
            least(col("color"), coalesce(col("cand"), col("color"))).as("color")),
          eager = true)
        changed = next.join(colors.withColumnRenamed("color", "old"), "node")
          .where(col("color") =!= col("old")).count()
        colors = next
      }
      // ---- backward root-mark within each color ----
      var marked = Barrier.local(
        colors.where(col("node") === col("color")), eager = true)
      var nMarked = marked.count()
      var grew = true
      inner = 0
      while (grew) {
        inner += 1
        require(inner <= maxInnerRounds, s"scc: backward sweep still " +
          s"moving after $maxInnerRounds rounds — raise maxInnerRounds")
        val reach = live
          .join(marked.select(col("node").as("dst"), col("color").as("mc")), "dst")
          .select(col("src").as("node"), col("mc").as("color"))
          .join(colors.withColumnRenamed("color", "c"), Seq("node"))
          .where(col("color") === col("c"))
          .select(col("node"), col("color"))
        val next = Barrier.local(
          marked.unionByName(reach).distinct(), eager = true)
        val n = next.count()
        grew = n > nMarked
        marked = next
        nMarked = n
      }
      val assigned = marked.select(col("node"), col("color").as("scc_id"))
      result = Some(result match {
        case None => Barrier.local(assigned, eager = true)
        case Some(r) => Barrier.local(r.unionByName(assigned), eager = true)
      })
      remaining = Barrier.local(
        remaining.join(assigned, Seq("node"), "left_anti"), eager = true)
      nRemaining = remaining.count()
      live = Barrier.local(live
        .join(assigned.select(col("node").as("src")), Seq("src"), "left_anti")
        .join(assigned.select(col("node").as("dst")), Seq("dst"), "left_anti"),
        eager = true)
    }
    require(nRemaining == 0, s"scc: $nRemaining nodes unassigned after " +
      s"$maxOuterRounds rounds — the SCC condensation is deeper than " +
      "maxOuterRounds; raise it")
    result.get
  }
}
