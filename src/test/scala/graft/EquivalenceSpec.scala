package graft

import org.apache.spark.sql.functions._
import graft.etl.{Marts, Staging}
import graft.operators.{Sampling, TextOps, TopKAggregate}

/** Seeded randomized equivalence/invariant checks: same spirit as
  * property-based testing, but with a fixed seed and few iterations so
  * the Spark-backed properties stay fast and deterministic in CI.
  */
class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("TopKAggregator equals the window top-N on randomized tied data") {
    (1 to 3).foreach { _ =>
      val rows = (0 until 400).map(i =>
        (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toLong, i.toLong)) // many value ties
      val df = rows.toDF("grp", "v", "id")
      val viaAgg = TopKAggregate.topK[Long, Long](df, $"grp", "grp", $"v", $"id", 7, "id", "v")
        .select($"grp", $"id", $"v", $"rk")
        .as[(String, Long, Long, Long)].collect().toSet
      val viaWindow = Marts.topNPerGroup(df, Seq($"grp"), Seq($"v".desc, $"id".asc), 7)
        .select($"grp", $"id", $"v", $"rk")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(viaAgg === viaWindow)
    }
  }

  test("upsert result is exactly base ++ updates on randomized key sets") {
    (1 to 3).foreach { _ =>
      val base = (0 until 200).map(k => (k.toLong, rnd.nextInt(1000).toLong))
      val updates = rnd.shuffle((0 until 200).toList).take(60).map(k => (k.toLong, 5000L + k)) ++
        (200 until 220).map(k => (k.toLong, 9000L + k)) // brand-new keys
      val merged = Staging.upsert(base.toDF("k", "v"), updates.toDF("k", "v"), Seq("k"))
        .as[(Long, Long)].collect().toMap
      assert(merged === base.toMap ++ updates.toMap)
    }
  }

  test("bernoulli sample is deterministic, a subset, and near the rate") {
    val ids = (0 until 2000).map(_.toLong).toDF("id")
    def run() = Sampling.bernoulli(ids, $"id", 0.3, "eqv").as[Long].collect().toSet
    val (a, b) = (run(), run())
    assert(a === b, "same corpus + salt must draw the same sample")
    assert(a.subsetOf((0L until 2000L).toSet))
    assert(math.abs(a.size - 600) < 110, s"got ${a.size}, expected ~600 (5 sigma)")
    // a different salt draws a (near-)independent sample
    val c = Sampling.bernoulli(ids, $"id", 0.3, "eqv2").as[Long].collect().toSet
    assert(c !== a)
  }

  test("incremental dedup equals full recompute restricted to new-doc pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val newIds = docs.filter($"doc_id" % 5 === 0).select($"doc_id")
      .as[Long].collect().toSet
    val full = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val expected = full.filter(p => newIds(p._1) || newIds(p._2))
    // the operator must not leak cache entries: a daily-increment service
    // calls this once per batch for the life of the session. Compare
    // before/after ids rather than demanding a globally empty cache —
    // the session is shared and OTHER operators' lazy localCheckpoints
    // stay registered until the ContextCleaner GCs them (observed flake).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val incremental = graft.operators.Dedup.incrementalCandidates(
        docs.filter($"doc_id" % 5 === 0),
        graft.operators.Dedup.bandTable(docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(incremental === expected)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"incrementalCandidates must not leave persisted RDDs behind (leaked ids: $leaked)")
  }

  test("chunking covers every token and stitches back to the document") {
    val size = 8
    val stride = 4
    val docs = (0 until 30).map { i =>
      val n = rnd.nextInt(30) // includes 0- and 1-token docs
      (i.toLong, (0 until n).map(j => s"t${i}_$j").mkString(" "))
    }
    val chunks = TextOps.chunk(docs.toDF("doc_id", "text"), "doc_id", "text", size, stride)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) assert(!chunks.contains(id))
      else {
        val cs = chunks(id).map(_._3.split(" ").filter(_.nonEmpty).toSeq)
        assert(cs.length === (toks.length - 1) / stride + 1)
        assert(cs.forall(_.length <= size))
        // stitch: first `stride` tokens of each chunk + the tail of the last
        val stitched = cs.dropRight(1).flatMap(_.take(stride)) ++ cs.last
        assert(stitched === toks.toSeq, s"doc $id must reconstruct from its chunks")
      }
    }
  }
}
