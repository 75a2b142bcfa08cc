package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextOps}

/** Pins the round-10 audit-sampling contract: the fixed hash-order
  * budgets that keep the recall audits' EXACT-truth halves linear at
  * corpus scale are EXACT RESTRICTIONS — sampled output equals the full
  * run filtered to the sample, never an approximation of it. (The
  * budgets in Params exceed the sf0.01 populations, so the driver's
  * DuckDB gate certifies the full audits; these specs certify the
  * restriction property the sf≥0.1 runs rely on.)
  */
class AuditSamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("bm25TopK queryBudget: sampled run == full run ∩ sampled queries; budget ≥ population is the full run") {
    val full = TextOps.bm25TopK(docs, "doc_id", "text", 50, 5)
    val sids = Sampling.hashOrderIds(docs.where(col("doc_id") % 50 === 0),
      "doc_id", 4, "query_id").as[Long].collect().toSet
    assert(sids.size === 4 && sids.forall(_ % 50 == 0))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score_ppm", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
    val sampled = snap(TextOps.bm25TopK(docs, "doc_id", "text", 50, 5,
      queryBudget = 4))
    val expected = snap(full).filter(r => sids(r._1))
    assert(sampled === expected)
    assert(sampled.nonEmpty && sampled.size < snap(full).size,
      "budget must bite: a vacuous restriction pins nothing")
    // budget beyond the population degrades to the unsampled path —
    // the property the sf0.01 correctness gate relies on
    assert(snap(TextOps.bm25TopK(docs, "doc_id", "text", 50, 5,
      queryBudget = 1000000)) === snap(full))
  }

  test("jaccardTopK queryBudget: sampled run == full run ∩ sampled queries") {
    val sids = Sampling.hashOrderIds(docs.where(col("doc_id") % 50 === 0),
      "doc_id", 4, "query_id").as[Long].collect().toSet
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "jac_ppm", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
    val sampled = snap(TextOps.jaccardTopK(docs, "doc_id", "text", 50, 5,
      queryBudget = 4))
    val full = snap(TextOps.jaccardTopK(docs, "doc_id", "text", 50, 5))
    assert(sampled === full.filter(r => sids(r._1)))
    assert(sampled.nonEmpty && sampled.size < full.size)
  }

  test("jaccardLshTopK queryBudget: sampled run == full run ∩ sampled queries") {
    // queryMod=2 + a 40-of-250 budget: LSH candidates only exist where
    // buckets collide, so the sample must be wide enough to catch some
    // of the fixture's ~15 near-dup pairs; τ=0 keeps any background
    // bucket collisions in play too
    val sids = Sampling.hashOrderIds(docs.where(col("doc_id") % 2 === 0),
      "doc_id", 40, "query_id").as[Long].collect().toSet
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "jac_ppm", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
    val sampled = snap(TextOps.jaccardLshTopK(docs, "doc_id", "text",
      2, 5, 0L, Params.LshTopkK, Params.LshTopkBands, queryBudget = 40))
    val full = snap(TextOps.jaccardLshTopK(docs, "doc_id", "text",
      2, 5, 0L, Params.LshTopkK, Params.LshTopkBands))
    assert(sampled === full.filter(r => sids(r._1)))
    assert(sampled.nonEmpty && sampled.size < full.size)
  }

  test("prefixFilterJaccard touchIds: sampled truth == full truth ∩ pairs touching the sample") {
    val sids = Sampling.hashOrderIds(docs, "doc_id", 100)
    val sset = sids.as[Long].collect().toSet
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jac_ppm")
        .as[(Long, Long, Long)].collect().toSet
    val full = snap(Dedup.prefixFilterJaccard(docs, "doc_id", "text",
      Params.JaccardMinNum, Params.JaccardMinDen))
    val sampled = snap(Dedup.prefixFilterJaccard(docs, "doc_id", "text",
      Params.JaccardMinNum, Params.JaccardMinDen, touchIds = Some(sids)))
    val expected = full.filter(p => sset(p._1) || sset(p._2))
    assert(sampled === expected)
    assert(sampled.nonEmpty, "fixture must exercise the sampled path")
    assert(sampled.size < full.size,
      "sample must exclude some full pairs or the spec pins nothing")
  }
}
