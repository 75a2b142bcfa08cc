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

  test("binaryFile ingestion: the file tree roundtrips with source " +
    "metadata + real decode agreeing with construction") {
    val out = SparkEntry.queries("src_binaryfile_ingest")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one row per materialized file, and for EVERY file: n_bytes is the
    // exact payload length (source metadata) and width/height are the
    // construction's dims recovered from the BYTES by the real decode
    val expect = Multimodal.mediaFromDocumentsPng(
        docs.where($"doc_id" < Params.BinSrcMaxId))
      .collect().map(m => (m.media_id, m.payload.length.toLong,
        m.width.toLong, m.height.toLong))
    assert(out.toSet === expect.toSet)
    assert(out.length === expect.length)
  }

  test("real PNG codec: decode recovers encoded dimensions from the bytes") {
    val media = Multimodal.mediaFromDocumentsPng(docs.limit(20)).collect()
    // payloads are genuine PNG containers (magic bytes), varied sizes
    assert(media.forall(r => (r.payload(0) & 0xff) == 0x89 && r.payload(1) == 'P'))
    assert(media.map(r => (r.width, r.height)).distinct.length > 1)
    media.foreach { r =>
      val decoded = graft.multimodal.ImageCodec.decodePng(r.payload)
      assert(decoded.isDefined, s"media ${r.media_id} must decode as PNG")
      val (w, h, _) = decoded.get
      assert(w === r.width && h === r.height,
        s"decoded dims ($w,$h) must match metadata (${r.width},${r.height})")
    }
    // the Spark-side batched decode agrees with the local decode
    val feats = Multimodal.decodeImage(
      Multimodal.mediaFromDocumentsPng(docs.limit(20))).collect()
    feats.foreach { f =>
      val row = media.find(_.media_id == f.media_id).get
      assert(f.checksum === graft.multimodal.ImageCodec.decodePng(row.payload).get._3)
      assert(f.n_bytes === row.payload.length.toLong)
    }
    // a non-image payload falls back to byte features instead of failing
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow(99L, "audio", 0, 0, Array[Byte](1, 2, 3))).toDS()
    assert(Multimodal.decodeImage(junk).collect().head.n_bytes === 3L)
  }

  test("decode stub is deterministic and batch-shaped") {
    val f1 = Multimodal.featuresFromDocuments(spark, docs).orderBy($"media_id").collect()
    val f2 = Multimodal.featuresFromDocuments(spark, docs).orderBy($"media_id").collect()
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === docs.count())
    assert(f1.forall(_.getAs[Long]("n_bytes") > 0))
    // both real modalities are present in the mixed media pipeline
    assert(f1.count(_.getAs[String]("modality") == "audio") > 0)
    assert(f1.count(_.getAs[String]("modality") == "image") > 0)
  }

  test("real WAV codec: decode recovers sample count, rate and sample crc") {
    import graft.multimodal.AudioCodec
    val samples = AudioCodec.pcmFromSeed("deterministic seed".getBytes("UTF-8"), 480)
    val wav = AudioCodec.encodeWav(8000f, samples)
    // genuine RIFF/WAVE container bytes
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val Some((rate, n, crc)) = AudioCodec.decodeWav(wav)
    assert(rate === 8000f)
    assert(n === 480L, "decoded sample count must equal what was encoded")
    // the crc must be over the DECODED samples — recompute independently
    var expect = 1125899906842597L
    samples.foreach(s => expect = expect * 31 + s)
    assert(crc === expect)
    // non-audio payloads are rejected, not crashed on
    assert(AudioCodec.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decodeWav("not audio at all".getBytes).isEmpty)
  }

  test("mixed media table: all three modalities really decode") {
    val media = Multimodal.mediaFromDocumentsMixed(docs.limit(21)).collect()
    media.foreach { r =>
      r.media_id % 3 match {
        case 0 =>
          assert(r.modality === "image")
          assert(graft.multimodal.ImageCodec.decodePng(r.payload).isDefined)
        case 1 =>
          assert(r.modality === "audio")
          val d = graft.multimodal.AudioCodec.decodeWav(r.payload)
          assert(d.isDefined, s"media ${r.media_id} must decode as WAV")
          assert(d.get._2 === r.media_id % 400 + 100,
            "decoded sample count must match the synth length")
        case _ =>
          assert(r.modality === "video")
          val d = graft.multimodal.ImageCodec.decodeGifFrames(r.payload)
          assert(d.isDefined, s"media ${r.media_id} must demux as GIF")
          assert(d.get.length === (r.media_id % 4 + 2).toInt,
            "demuxed frame count must match the synth")
      }
    }
    assert(media.map(_.modality).distinct.sorted.toSeq
      === Seq("audio", "image", "video"))
    // the Spark-side batched decode agrees with the local decode per row
    val feats = Multimodal.decodeMedia(
      Multimodal.mediaFromDocumentsMixed(docs.limit(21))).collect()
    feats.filter(_.media_id % 3 == 1).foreach { f =>
      val row = media.find(_.media_id == f.media_id).get
      assert(f.checksum === graft.multimodal.AudioCodec.decodeWav(row.payload).get._3)
    }
    feats.filter(_.media_id % 3 == 2).foreach { f =>
      val row = media.find(_.media_id == f.media_id).get
      val want = graft.multimodal.ImageCodec.decodeGifFrames(row.payload).get
        .foldLeft(1125899906842597L) { case (acc, (_, _, _, c)) => acc * 31 + c }
      assert(f.checksum === want, "video feature crc must fold the frame crcs")
    }
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

  test("real resize: decoded output has the target dimensions, pixels rescaled") {
    val media = Multimodal.mediaFromDocumentsPng(docs.limit(10))
    val resized = Multimodal.resizeImages(media, 5, 4).collect()
    assert(resized.length === 10)
    resized.foreach { r =>
      val (w, h, _) = graft.multimodal.ImageCodec.decodePng(r.payload).get
      assert((w, h) === ((5, 4)), "re-encoded payload must decode at target size")
    }
    // non-decodable IMAGE payload falls back to the stub transform, not a crash
    val junk = Seq(Multimodal.MediaRow(99L, "image", 1, 1, Array[Byte](1, 2, 3))).toDS()
    val fb = Multimodal.resizeImages(junk, 8, 8).collect().head
    assert(fb.width === 8 && fb.payload.nonEmpty)
    // non-image modalities in a mixed table pass through UNTOUCHED —
    // an audio payload must not come back as fake image bytes
    val audio = Multimodal.MediaRow(7L, "audio", 3, 2, Array[Byte](9, 8, 7))
    val thru = Multimodal.resizeImages(Seq(audio).toDS(), 8, 8).collect().head
    assert(thru.width === 3 && thru.height === 2 &&
      thru.payload.toSeq === Seq[Byte](9, 8, 7))
  }

  test("real GIF frame sampling: demuxed frames with decoded dims and crc") {
    val media = Multimodal.mediaFromDocumentsGif(docs.limit(12))
    val frames = Multimodal.frameSample(media, frameBytes = 16, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(frames.forall(_._6), "every GIF payload must really demux")
    // doc id → 2..5 frames; stride 2 keeps ceil(nf/2), frame 0 always
    val byId = frames.groupBy(_._1)
    byId.foreach { case (id, fs) =>
      val nf = (id % 4 + 2).toInt
      assert(fs.map(_._2).sorted.toSeq === (0 until nf by 2).map(_.toLong))
      val w = (id % 10 + 4).toInt
      assert(fs.forall(f => f._3 === w.toLong), "decoded width must match encode")
    }
    // frames differ: the per-frame pixel crc must not be constant per item
    val multi = byId.filter(_._2.length > 1)
    assert(multi.nonEmpty && multi.forall(_._2.map(_._5).distinct.length > 1),
      "distinct frames must yield distinct pixel crcs")
    // local demux agrees with the distributed pass
    val row = media.filter(_.media_id == 2L).collect().head
    val local = graft.multimodal.ImageCodec.decodeGifFrames(row.payload).get
    val dist = frames.filter(_._1 == 2L).sortBy(_._2)
    assert(local.filter(_._1 % 2 == 0).map(_._4).toSeq === dist.map(_._5).toSeq)
  }

  test("feature vectors have the declared shape") {
    val media = Multimodal.mediaFromDocuments(docs).as[Multimodal.MediaRow]
    val feats = Multimodal.decodeStub(media).collect()
    assert(feats.forall(_.feature.length === 8))
    assert(feats.forall(_.feature.forall(v => v >= 0f && v <= 1f)))
  }

  test("aHash: constructed half-bright image gives the exact bit pattern") {
    // 16×16, top half luma 200, bottom half luma 40: mean=120, the 32
    // top-half samples (bits 0..31) exceed it, the bottom half doesn't
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = if (y < 8) 200 else 40
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (lo, hi) = graft.multimodal.ImageCodec.aHashPng(bos.toByteArray).get
    assert(lo === 0xffffffffL && hi === 0L)
    // identical payload → identical hash; non-image bytes → None
    assert(graft.multimodal.ImageCodec.aHashPng(bos.toByteArray).get === ((lo, hi)))
    assert(graft.multimodal.ImageCodec.aHashPng("not a png".getBytes).isEmpty)
  }

  test("imageNearDup pairs the one-pixel twin, not the unrelated image; audio rows dropped") {
    // A and A' differ in one seed byte; B is an unrelated pattern
    val seedA = Array.tabulate[Byte](192)(i => (i * 7 + 3).toByte)
    val seedA2 = seedA.clone(); seedA2(0) = (seedA2(0) + 1).toByte
    val seedB = Array.tabulate[Byte](192)(i => (i * 131 + 57).toByte)
    def png(seed: Array[Byte]) = graft.multimodal.ImageCodec.encodePngGray(16, 12, seed)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", 16, 12, png(seedA)),
      Multimodal.MediaRow(2L, "image", 16, 12, png(seedA2)),
      Multimodal.MediaRow(3L, "image", 16, 12, png(seedB)),
      // a WAV row must be dropped by the signature pass, never paired
      Multimodal.MediaRow(4L, "audio", 100, 1,
        graft.multimodal.AudioCodec.encodeWav(8000f,
          graft.multimodal.AudioCodec.pcmFromSeed(seedA, 100)))).toDS()
    val sigs = Multimodal.imageAHash(media).collect()
    assert(sigs.map(_.getAs[Long]("media_id")).toSet === Set(1L, 2L, 3L))
    val pairs = Multimodal.imageNearDup(media, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // distributed hamming agrees with a local popcount on the signatures
    val byId = sigs.map(r => r.getAs[Long]("media_id") ->
      (r.getAs[Long]("sim_lo"), r.getAs[Long]("sim_hi"))).toMap
    val expect = java.lang.Long.bitCount(byId(1L)._1 ^ byId(2L)._1) +
      java.lang.Long.bitCount(byId(1L)._2 ^ byId(2L)._2)
    assert(pairs.head._3 === expect.toLong)
  }

  test("cdcChunks: bounds hold, offsets tile the payload, dedup by content") {
    def bytesOf(seed: Int, n: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(n)(rnd.nextInt(256).toByte)
    }
    val a = bytesOf(7, 2000)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", 1, 1, a),
      Multimodal.MediaRow(2L, "image", 1, 1, a.clone()),
      Multimodal.MediaRow(3L, "image", 1, 1, bytesOf(8, 1500))).toDS()
    val out = Multimodal.cdcChunks(media, 16, 5, 16, 128).collect()
    val byId = out.groupBy(_.media_id).map { case (id, cs) =>
      id -> cs.sortBy(_.chunk_idx)
    }
    // offsets tile each payload exactly: contiguous, lengths sum to size
    byId.foreach { case (id, cs) =>
      val size = if (id == 3L) 1500L else 2000L
      assert(cs.head.offset === 0L && cs.map(_.length).sum === size)
      cs.sliding(2).foreach {
        case Array(x, y) => assert(x.offset + x.length === y.offset)
        case _ =>
      }
      // every chunk obeys [min, max] except possibly the final tail
      cs.dropRight(1).foreach(c => assert(c.length >= 16 && c.length <= 128))
      assert(cs.last.length <= 128)
    }
    // identical payloads chunk identically; different content doesn't
    assert(byId(1L).map(c => (c.offset, c.length, c.chunk_md5)) ===
      byId(2L).map(c => (c.offset, c.length, c.chunk_md5)))
    assert(byId(1L).map(_.chunk_md5).toSet.intersect(
      byId(3L).map(_.chunk_md5).toSet).isEmpty)
  }

  test("cdcChunks re-synchronize after a front insertion; fixed blocks don't") {
    def bytesOf(seed: Int, n: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(n)(rnd.nextInt(256).toByte)
    }
    val base = bytesOf(11, 4000)
    val shifted = bytesOf(99, 11) ++ base
    val media = Seq(
      Multimodal.MediaRow(1L, "image", 1, 1, base),
      Multimodal.MediaRow(2L, "image", 1, 1, shifted)).toDS()
    val out = Multimodal.cdcChunks(media, 16, 5, 16, 128).collect()
    val h1 = out.filter(_.media_id == 1L).map(_.chunk_md5)
    val h2 = out.filter(_.media_id == 2L).map(_.chunk_md5).toSet
    // boundaries depend on local content only: after the insertion the
    // cut points re-sync and the long tail of chunks dedups exactly
    val shared = h1.count(h2.contains)
    assert(shared >= h1.length - 3,
      s"only $shared of ${h1.length} chunks survived an 11-byte insertion")
    // the fixed-size strawman: same data cut every 64 bytes shares ~0
    val fixed1 = base.grouped(64).map(_.toSeq).toSet
    val fixedShared = shifted.grouped(64).map(_.toSeq).count(fixed1.contains)
    assert(fixedShared <= 2, "fixed blocking should lose almost everything")
  }
}
