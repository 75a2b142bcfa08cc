package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing (#34/#35 in SURVEY.md §2): binary payload column +
  * typed metadata survive the round trip, and the batched decode stub is
  * deterministic.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("media table carries binary payload + typed metadata") {
    val media = Multimodal.mediaFromDocuments(docs)
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") === "binary")
    assert(schema("modality") === "string")
    assert(schema("width") === "int")
    val r = media.filter($"media_id" === 0).collect().head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8").startsWith("the fast key"))
  }

  test("decode stub is deterministic and batch-shaped") {
    val f1 = Multimodal.featuresFromDocuments(spark, docs).orderBy($"media_id").collect()
    val f2 = Multimodal.featuresFromDocuments(spark, docs).orderBy($"media_id").collect()
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === docs.count())
    assert(f1.forall(_.getAs[Long]("n_bytes") > 0))
  }

  test("resize stub updates metadata and payload size, batch-shaped") {
    val media = Multimodal.mediaFromDocuments(docs).as[Multimodal.MediaRow]
    val resized = Multimodal.resizeStub(media, 64, 64).collect()
    assert(resized.forall(r => r.width === 64 && r.height === 64))
    assert(resized.forall(_.payload.length === 64 * 64 / 64))
  }

  test("frame sampling emits strided frame rows per media item") {
    val media = Multimodal.mediaFromDocuments(docs.limit(10)).as[Multimodal.MediaRow]
    val frames = Multimodal.frameSampleStub(media, frameBytes = 16, stride = 2)
    val byId = frames.groupBy($"media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.size === 10)
    val len0 = media.filter(_.media_id == 0).collect().head.payload.length
    val expected = (0 until math.max(1, len0 / 16) by 2).map(_.toLong)
    val f0 = frames.filter($"media_id" === 0).select($"frame_idx")
      .collect().map(_.getLong(0)).sorted
    assert(f0.toSeq === expected)
  }

  test("feature vectors have the declared shape") {
    val media = Multimodal.mediaFromDocuments(docs).as[Multimodal.MediaRow]
    val feats = Multimodal.decodeStub(media).collect()
    assert(feats.forall(_.feature.length === 8))
    assert(feats.forall(_.feature.forall(v => v >= 0f && v <= 1f)))
  }
}
