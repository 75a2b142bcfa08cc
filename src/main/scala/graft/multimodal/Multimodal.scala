package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus a batched decode/feature-extract
  * stage.
  *
  * The Spark-side plumbing (schema, batch iteration, partition sizing) is
  * real, and the IMAGE and AUDIO paths use real codecs: [[ImageCodec]]
  * encodes/decodes PNG via `javax.imageio`, [[AudioCodec]] encodes/
  * decodes WAV via `javax.sound.sampled` (both pure JVM, headless-safe —
  * the two codec families this container ships). VIDEO stays a
  * deterministic STUB (no demuxer exists on a bare JVM); it keeps the
  * exact `Iterator → Iterator` shape a real codec needs (the idiomatic
  * Scala analog of a `mapInPandas` batch UDF: per-partition batching, no
  * per-row JNI/process round-trips).
  */
object Multimodal {

  /** Width-floor for the CPU-bound codec passes below
    * ([[graft.operators.CpuStage.fanOut]]): the documents table lands
    * as one parquet split at bench scale, so without it every
    * encode/decode mapPartitions runs on ONE thread (measured r15:
    * multimodal_frame_sample was a single 4.4 s task at sf0.1 on 32
    * cores). Identity on inputs already at session width — the
    * production corpus with thousands of splits is untouched.
    */
  private def fanned(df: DataFrame): DataFrame =
    graft.operators.CpuStage.fanOut(df)

  /** One media row: payload + typed metadata. */
  case class MediaRow(media_id: Long, modality: String, width: Int, height: Int,
                      payload: Array[Byte])

  /** Extracted features for one row. */
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                           checksum: Long, feature: Array[Float])

  /** Build a media table from the documents table: payload = UTF-8 bytes
    * of the text (a stand-in for real image/audio bytes), metadata derived
    * deterministically. This is the ingestion-side plumbing: binary column
    * + metadata, repartitioned so each task holds a bounded payload volume
    * (at 100 TB, partition count follows bytes, not row count).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("modality"),
      (col("n_chars") % 640 + 32).cast("int").as("width"),
      (col("n_chars") % 480 + 24).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: a real implementation would decode `payload` with an
    * image/audio codec here. The deterministic fake keeps the exact
    * batch shape a real codec needs: one `mapPartitions` pass, features
    * computed per row from the bytes, output typed by Encoder.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // fallback path; the real codec is decodeImage/decodeMedia below —
        // this stub keeps the plumbing testable with no codec installed.
        var crc = 1125899906842597L
        var i = 0
        while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
        val feat = Array.tabulate(8)(j => ((crc >>> (j * 8)) & 0xff).toFloat / 255.0f)
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong, crc, feat)
      }
    }
  }

  /** STUB resize: a real implementation would decode, scale to
    * (targetW, targetH), and re-encode. The deterministic fake keeps the
    * contract: output payload size proportional to the target area,
    * metadata updated, same mapPartitions batch shape.
    */
  def resizeStub(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // fallback path; the real scaler is resizeImages below — this stub
        // keeps the plumbing testable with no codec installed.
        val outLen = math.max(1, (targetW.toLong * targetH / 64L).toInt)
        // empty payloads must survive (the 'any input' contract a real
        // codec stage needs) — emit zero bytes instead of indexing into
        // an empty array
        val out =
          if (r.payload.isEmpty) new Array[Byte](outLen)
          else Array.tabulate[Byte](outLen)(i => r.payload(i % r.payload.length))
        r.copy(width = targetW, height = targetH, payload = out)
      }
    }
  }

  /** REAL resize for image payloads: decode → deterministic
    * nearest-neighbor rescale → PNG re-encode, all on the JVM's built-in
    * imaging stack (headless-safe). Rows whose `modality` is not
    * "image" (audio, video, …) pass through UNTOUCHED — a mixed media
    * table must never have its non-image payloads rewritten into fake
    * image bytes with forged width/height. Image rows whose payload
    * fails to decode fall back to the stub's byte transform so the
    * stage keeps the any-input contract for its own modality. Same
    * mapPartitions batch shape as every codec stage.
    */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.modality != "image") r
        else ImageCodec.resizePng(r.payload, targetW, targetH) match {
          case Some(out) => r.copy(width = targetW, height = targetH, payload = out)
          case None =>
            val outLen = math.max(1, (targetW.toLong * targetH / 64L).toInt)
            val out =
              if (r.payload.isEmpty) new Array[Byte](outLen)
              else Array.tabulate[Byte](outLen)(i => r.payload(i % r.payload.length))
            r.copy(width = targetW, height = targetH, payload = out)
        }
      }
    }
  }

  /** REAL frame sampling for GIF sequences: demux with the JVM's gif
    * reader, keep every `stride`-th frame, emit (frame index, decoded
    * dims, pixel crc). Non-GIF payloads fall back to the stub's
    * fixed-size chunking with crc over the chunk bytes — any-input
    * contract, one flatMap pass, no shuffle.
    */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      ImageCodec.decodeGifFrames(r.payload) match {
        case Some(frames) =>
          frames.collect { case (i, w, h, crc) if i % stride == 0 =>
            (r.media_id, i.toLong, w.toLong, h.toLong, crc, true)
          }
        case None =>
          val nFrames = math.max(1, r.payload.length / math.max(1, frameBytes))
          (0 until nFrames by stride).map { f =>
            val from = f * frameBytes
            val until = math.min(r.payload.length, from + frameBytes)
            var crc = 1125899906842597L
            var i = from
            while (i < until) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
            (r.media_id, f.toLong, 0L, 0L, crc, false)
          }
      }
    }.toDF("media_id", "frame_idx", "width", "height", "frame_crc", "decoded")
  }

  /** Media table with REAL animated-GIF payloads (one per doc,
    * 2–5 frames), the ingestion twin of [[mediaFromDocumentsPng]].
    */
  def mediaFromDocumentsGif(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val w = (id % 10 + 4).toInt
        val h = (id % 7 + 3).toInt
        val nf = (id % 4 + 2).toInt
        MediaRow(id, "video", w, h, ImageCodec.encodeGif(w, h, nf, text.getBytes("UTF-8")))
      }
    }
  }

  /** STUB frame sampling for video-like payloads: every `stride`-th chunk
    * of the payload stands in for a decoded frame; emits one row per
    * sampled frame with its index. The explode keeps frame rows colocated
    * with their source partition — no shuffle.
    */
  def frameSampleStub(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      // fallback path; the real demuxer is frameSample above — fixed-size
      // chunks keep the plumbing testable with no codec installed.
      val nFrames = math.max(1, r.payload.length / math.max(1, frameBytes))
      (0 until nFrames by stride).map { f =>
        val from = f * frameBytes
        val until = math.min(r.payload.length, from + frameBytes)
        (r.media_id, f.toLong, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Media table with REAL PNG payloads: each doc renders a deterministic
    * tiny RGB image from its text bytes, encoded by [[ImageCodec]]. This
    * is the ingestion-side batch shape for a real encoder — one
    * mapPartitions pass, codec invoked per row inside the batch.
    */
  def mediaFromDocumentsPng(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val w = (id % 12 + 4).toInt
        val h = (id % 9 + 3).toInt
        MediaRow(id, "image", w, h, ImageCodec.encodePng(w, h, text.getBytes("UTF-8")))
      }
    }
  }

  /** Materialize each payload as an individual `media_<id>.<ext>` file
    * under `dir` — the fixture builder for the raw binary-file
    * ingestion path ([[graft.sources.Sources.readBinaryFiles]]).
    * Executor-side and idempotent per file (write to a per-task temp
    * name, rename into place; a loser of a concurrent race deletes its
    * temp), so repeated runs against the same dir are cheap no-ops.
    * In local mode the dir is driver-local; on a cluster it must be
    * shared storage — the same contract as any file sink.
    */
  def materializeTree(media: Dataset[MediaRow], dir: String, ext: String): Unit = {
    new java.io.File(dir).mkdirs()
    media.foreachPartition { rows: Iterator[MediaRow] =>
      rows.foreach { r =>
        val f = new java.io.File(dir, f"media_${r.media_id}%06d.$ext")
        if (!f.exists()) {
          val tmp = java.io.File.createTempFile(s".m${r.media_id}_", ".part",
            new java.io.File(dir))
          val os = new java.io.FileOutputStream(tmp)
          try os.write(r.payload) finally os.close()
          if (!tmp.renameTo(f)) tmp.delete() // lost the race: file exists
        }
      }
    }
  }

  /** REAL decode for image payloads (PNG via javax.imageio): dimensions
    * and checksum come from the decoded pixels, not the container bytes.
    * Non-decodable payloads (other modalities) fall back to the stub's
    * byte-level features, so the stage keeps the any-input contract.
    */
  def decodeImage(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        ImageCodec.decodePng(r.payload) match {
          case Some((w, h, pixCrc)) =>
            val feat = Array.tabulate(8)(j => ((pixCrc >>> (j * 8)) & 0xff).toFloat / 255.0f)
            MediaFeatures(r.media_id, r.modality, r.payload.length.toLong, pixCrc, feat)
          case None =>
            var crc = 1125899906842597L
            var i = 0
            while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
            val feat = Array.tabulate(8)(j => ((crc >>> (j * 8)) & 0xff).toFloat / 255.0f)
            MediaFeatures(r.media_id, r.modality, r.payload.length.toLong, crc, feat)
        }
      }
    }
  }

  /** Media table with REAL payloads in BOTH remaining real modalities:
    * even doc ids render a PNG ([[ImageCodec]]), odd ids a WAV
    * ([[AudioCodec]] — deterministic PCM synthesized from the text
    * bytes). Same one-pass mapPartitions ingestion shape.
    */
  def mediaFromDocumentsMixed(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val seed = text.getBytes("UTF-8")
        if (id % 3 == 0) {
          val w = (id % 12 + 4).toInt
          val h = (id % 9 + 3).toInt
          MediaRow(id, "image", w, h, ImageCodec.encodePng(w, h, seed))
        } else if (id % 3 == 1) {
          val n = (id % 400 + 100).toInt
          MediaRow(id, "audio", n, 1, AudioCodec.encodeWav(8000f, AudioCodec.pcmFromSeed(seed, n)))
        } else {
          val w = (id % 10 + 4).toInt
          val h = (id % 7 + 3).toInt
          MediaRow(id, "video", w, h, ImageCodec.encodeGif(w, h, (id % 4 + 2).toInt, seed))
        }
      }
    }
  }

  /** REAL decode for image AND audio payloads: PNG via javax.imageio,
    * WAV via javax.sound.sampled — both pure-JVM, headless-safe. The
    * checksum comes from decoded pixels/samples, not container bytes.
    * Undecodable payloads fall back to the byte-level stub features, so
    * the stage keeps the any-input contract.
    */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        def fromCrc(crc: Long) =
          Array.tabulate(8)(j => ((crc >>> (j * 8)) & 0xff).toFloat / 255.0f)
        def byteStub(): MediaFeatures = {
          var crc = 1125899906842597L
          var i = 0
          while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
          MediaFeatures(r.media_id, r.modality, r.payload.length.toLong, crc, fromCrc(crc))
        }
        // dispatch on the declared modality FIRST — probing every audio
        // payload through a failing ImageIO.read would waste a stream
        // parse + caught exception per row in the hot loop, and a
        // payload readable by both codecs must follow its schema tag;
        // a payload that fails its own codec falls to the byte stub
        // (the any-input contract)
        val decoded = r.modality match {
          case "image" => ImageCodec.decodePng(r.payload).map { case (_, _, crc) => crc }
          case "audio" => AudioCodec.decodeWav(r.payload).map { case (_, _, crc) => crc }
          // video = GIF sequence: feature crc folds the per-frame pixel crcs
          case "video" => ImageCodec.decodeGifFrames(r.payload)
            .map(_.foldLeft(1125899906842597L) { case (acc, (_, _, _, c)) => acc * 31 + c })
          case _ => ImageCodec.decodePng(r.payload).map(_._3)
            .orElse(AudioCodec.decodeWav(r.payload).map(_._3))
        }
        decoded match {
          case Some(crc) =>
            MediaFeatures(r.media_id, r.modality, r.payload.length.toLong, crc, fromCrc(crc))
          case None => byteStub()
        }
      }
    }
  }

  /** Perceptual-hash signature table for image rows: decode → 8×8
    * average-hash ([[ImageCodec.aHashPng]]) → the (media_id, sim_lo,
    * sim_hi) schema shared with the text simhash family, so
    * [[graft.operators.Dedup.signaturePairs]] does the candidate
    * generation. Non-image and undecodable rows are DROPPED, not
    * byte-stubbed: a perceptual hash over non-pixel bytes would
    * manufacture fake near-dup pairs between unrelated payloads (the
    * opposite failure mode from the feature-extract stages, whose
    * any-input contract degrades to byte features). One mapPartitions
    * decode pass; the only shuffle downstream is the candidate-key
    * exchange inside signaturePairs.
    */
  def imageAHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.modality != "image") None
        else ImageCodec.aHashPng(r.payload).map { case (lo, hi) =>
          (r.media_id, lo, hi)
        }
      }
    }.toDF("media_id", "sim_lo", "sim_hi")
  }

  /** Image near-duplicate pairs at hamming distance <= maxDist over the
    * aHash signature — the multimodal twin of the text simhash dedup:
    * same 6-block triple-probe completeness bound (<=3), same ~2^38-key
    * candidate join, decode cost paid once in the signature pass.
    */
  def imageNearDup(media: Dataset[MediaRow], maxDist: Int = 3): DataFrame =
    graft.operators.Dedup.signaturePairs(imageAHash(media), "media_id", maxDist)

  /** Ingestion-side demo table for [[imageNearDup]]: each document
    * renders TWICE at fixed dims as a grayscale byte-raster
    * ([[ImageCodec.encodePngGray]] — luma IS the content, so perceptual
    * distance tracks content distance) — media_id 2·doc_id from the
    * text, 2·doc_id+1 from the text with its first byte shifted (a
    * one-pixel perturbation), so the corpus contains a deterministic
    * near-identical twin per document and unrelated documents sit ~32
    * hamming bits apart.
    */
  def mediaFromDocumentsPngTwins(docs: DataFrame, w: Int, h: Int): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val seed = text.getBytes("UTF-8")
        val twin = seed.clone()
        if (twin.nonEmpty) twin(0) = (twin(0) + 1).toByte
        Seq(
          MediaRow(id * 2, "image", w, h, ImageCodec.encodePngGray(w, h, seed)),
          MediaRow(id * 2 + 1, "image", w, h, ImageCodec.encodePngGray(w, h, twin)))
      }
    }
  }

  /** REALISTIC-DIVERSITY twin fixture (VERDICT r11 task #9): like
    * [[mediaFromDocumentsPngTwins]] but each doc's raster is chained-MD5
    * bytes of its id ([[ImageCodec.md5Raster]]) instead of its text
    * bytes — effectively a uniform draw of the aHash space, so distinct
    * docs collide with probability ~2⁻⁶⁴ and the near-dup pair set is
    * ~one twin pair per doc (OUTPUT-SPARSE, growing ~linearly in N).
    * The text-seeded fixture stays as the output-bound stress case (its
    * natural-text rasters admit only ~5k distinct aHashes at 100k
    * images, so its census measures fixture degeneracy, not the
    * engine).
    */
  def mediaFromDocumentsPngTwinsDiverse(docs: DataFrame, w: Int,
                                        h: Int): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    fanned(docs.select(col("doc_id"))).as[Long].mapPartitions { rows =>
      rows.flatMap { id =>
        val seed = ImageCodec.md5Raster(id, w * h)
        val twin = seed.clone()
        twin(0) = (twin(0) + 1).toByte
        Seq(
          MediaRow(id * 2, "image", w, h, ImageCodec.encodePngGray(w, h, seed)),
          MediaRow(id * 2 + 1, "image", w, h, ImageCodec.encodePngGray(w, h, twin)))
      }
    }
  }

  /** Expected-signature fixture for the diverse twins — same contract
    * as [[exportExpectedTwinSignatures]], rasters from
    * [[ImageCodec.md5Raster]].
    */
  def exportExpectedTwinSignaturesDiverse(docs: DataFrame, w: Int, h: Int,
                                          path: String): Unit = {
    import docs.sparkSession.implicits._
    if (alreadyStaged(docs.sparkSession, path)) return
    fanned(docs.select(col("doc_id"))).as[Long].mapPartitions { rows =>
      rows.flatMap { id =>
        val seed = ImageCodec.md5Raster(id, w * h)
        val twin = seed.clone()
        twin(0) = (twin(0) + 1).toByte
        val (lo0, hi0) = ImageCodec.expectedAHashGray(w, h, seed)
        val (lo1, hi1) = ImageCodec.expectedAHashGray(w, h, twin)
        Seq((id * 2, lo0, hi0), (id * 2 + 1, lo1, hi1))
      }
    }.toDF("media_id", "sim_lo", "sim_hi")
      .write.mode("overwrite").parquet(path)
  }

  /** Full plumbing demo: documents → mixed PNG/WAV media table → real
    * decode of both modalities.
    */
  def featuresFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeMedia(mediaFromDocumentsMixed(docs)).toDF()
      .select(col("media_id"), col("modality"), col("n_bytes"), col("checksum"))
  }

  /** One content-defined chunk of a binary payload. */
  case class CdcChunk(media_id: Long, chunk_idx: Long, offset: Long,
                      length: Long, chunk_md5: String)

  /** Export payloads as exploded (media_id, i, b) rows — the byte-level
    * form a SQL engine with no blob-indexing functions (DuckDB 1.0) can
    * replay rolling-hash arithmetic over. Oracle-support fixture, not a
    * pipeline operator: the export is one narrow flatMap + write.
    * IDEMPOTENT-SKIP like [[materializeTree]]: payloads are a
    * deterministic function of the source table and the path is keyed
    * on the data dir, so a completed export (`_SUCCESS` present) is
    * this run's bytes already — skipping keeps the fixture cost out of
    * timed bench passes of the query that stages it (ADVICE r9).
    */
  /** True when `path` already holds a completed parquet write — the
    * idempotent-skip gate shared by the oracle-support fixtures (their
    * contents are deterministic functions of the source table and the
    * path is keyed on the data dir, so a completed export IS this
    * run's values; skipping keeps fixture cost out of timed bench
    * passes, ADVICE r9).
    */
  private def alreadyStaged(spark: SparkSession, path: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    marker.getFileSystem(spark.sessionState.newHadoopConf()).exists(marker)
  }

  def exportPayloadBytes(media: Dataset[MediaRow], path: String): Unit = {
    import media.sparkSession.implicits._
    if (alreadyStaged(media.sparkSession, path)) return
    media.flatMap { r =>
      r.payload.iterator.zipWithIndex.map { case (b, i) =>
        (r.media_id, i.toLong, (b & 0xff).toLong)
      }
    }.toDF("media_id", "i", "b")
      .write.mode("overwrite").parquet(path)
  }

  /** Expected-decode fixture for `multimodal_features`: per media row
    * the container byte length and the EXPECTED content checksum,
    * computed GENERATION-SIDE ([[ImageCodec.expectedFrameCrc]] /
    * [[AudioCodec.expectedPcmCrc]] — raster/sample arithmetic, never a
    * decoder), so the DuckDB twin hash-checks that the query's REAL
    * encode→decode roundtrip reproduced the source content exactly.
    * Map-only, idempotent-skip like the other oracle fixtures.
    */
  def exportExpectedFeatures(docs: DataFrame, path: String): Unit = {
    import docs.sparkSession.implicits._
    if (alreadyStaged(docs.sparkSession, path)) return
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val seed = text.getBytes("UTF-8")
        if (id % 3 == 0) {
          val w = (id % 12 + 4).toInt
          val h = (id % 9 + 3).toInt
          (id, ImageCodec.encodePng(w, h, seed).length.toLong,
            ImageCodec.expectedFrameCrc(w, h, seed, 0))
        } else if (id % 3 == 1) {
          val n = (id % 400 + 100).toInt
          val pcm = AudioCodec.pcmFromSeed(seed, n)
          (id, AudioCodec.encodeWav(8000f, pcm).length.toLong,
            AudioCodec.expectedPcmCrc(pcm))
        } else {
          val w = (id % 10 + 4).toInt
          val h = (id % 7 + 3).toInt
          val nf = (id % 4 + 2).toInt
          val crc = (0 until nf).foldLeft(1125899906842597L) { (acc, f) =>
            acc * 31 + ImageCodec.expectedFrameCrc(w, h, seed, f)
          }
          (id, ImageCodec.encodeGif(w, h, nf, seed).length.toLong, crc)
        }
      }
    }.toDF("media_id", "n_bytes", "checksum")
      .write.mode("overwrite").parquet(path)
  }

  /** WAV-only media table: every document synthesizes a deterministic
    * PCM payload (same parameters as [[mediaFromDocumentsMixed]]'s
    * audio branch, but for ALL ids) — the direct fixture table for the
    * WAV codec gate.
    */
  def mediaFromDocumentsWav(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val n = (id % 400 + 100).toInt
        MediaRow(id, "audio", n, 1,
          AudioCodec.encodeWav(8000f, AudioCodec.pcmFromSeed(text.getBytes("UTF-8"), n)))
      }
    }
  }

  /** Expected PNG-codec fixture for `multimodal_png_codec` (§2.7 row 35
    * as a DIRECT driver gate, r14): per doc the encoded dims and the
    * expected pixel crc computed from the raster arithmetic
    * ([[ImageCodec.expectedFrameCrc]] — never ImageIO), so the DuckDB
    * twin hash-checks the real encode→decode roundtrip per row, dims
    * included. Idempotent-skip like the other oracle fixtures.
    */
  def exportExpectedPng(docs: DataFrame, path: String): Unit = {
    import docs.sparkSession.implicits._
    if (alreadyStaged(docs.sparkSession, path)) return
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val w = (id % 12 + 4).toInt
        val h = (id % 9 + 3).toInt
        (id, w.toLong, h.toLong,
          ImageCodec.expectedFrameCrc(w, h, text.getBytes("UTF-8"), 0))
      }
    }.toDF("media_id", "width", "height", "pix_crc")
      .write.mode("overwrite").parquet(path)
  }

  /** Expected WAV-codec fixture for `multimodal_wav_codec` (§2.7 row
    * 35c as a DIRECT driver gate, r14): per doc the synth parameters'
    * sample rate/count and the expected sample crc
    * ([[AudioCodec.expectedPcmCrc]] over the generated PCM — never the
    * javax.sound decoder), so the twin hash-checks the real RIFF
    * encode→decode roundtrip per row. Idempotent-skip.
    */
  def exportExpectedWav(docs: DataFrame, path: String): Unit = {
    import docs.sparkSession.implicits._
    if (alreadyStaged(docs.sparkSession, path)) return
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val n = (id % 400 + 100).toInt
        val pcm = AudioCodec.pcmFromSeed(text.getBytes("UTF-8"), n)
        (id, 8000L, n.toLong, AudioCodec.expectedPcmCrc(pcm))
      }
    }.toDF("media_id", "sample_rate", "n_samples", "pcm_crc")
      .write.mode("overwrite").parquet(path)
  }

  /** Expected-resize fixture for `multimodal_resize`: per PNG media row
    * the pixel crc of the floor-NN rescale, computed GENERATION-SIDE
    * ([[ImageCodec.expectedResizeCrc]] — raster arithmetic + the same
    * integer sample map, never a codec), so the DuckDB twin hash-checks
    * the query's real decode → rescale → re-encode → decode pipeline.
    */
  def exportExpectedResize(docs: DataFrame, targetW: Int, targetH: Int,
                           path: String): Unit = {
    import docs.sparkSession.implicits._
    if (alreadyStaged(docs.sparkSession, path)) return
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.map { case (id, text) =>
        val w = (id % 12 + 4).toInt
        val h = (id % 9 + 3).toInt
        (id, ImageCodec.expectedResizeCrc(w, h, text.getBytes("UTF-8"),
          targetW, targetH))
      }
    }.toDF("media_id", "pix_crc")
      .write.mode("overwrite").parquet(path)
  }

  /** Expected-frame-sample fixture for `multimodal_frame_sample`: every
    * strided frame's index, encoded dims and EXPECTED pixel crc
    * ([[ImageCodec.expectedFrameCrc]] — per-frame raster arithmetic,
    * never the gif demuxer), so the DuckDB twin hash-checks the query's
    * real GIF demux against independently derived frames.
    */
  def exportExpectedFrameSamples(docs: DataFrame, stride: Int,
                                 path: String): Unit = {
    import docs.sparkSession.implicits._
    if (alreadyStaged(docs.sparkSession, path)) return
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val seed = text.getBytes("UTF-8")
        val w = (id % 10 + 4).toInt
        val h = (id % 7 + 3).toInt
        val nf = (id % 4 + 2).toInt
        (0 until nf by stride).map { f =>
          (id, f.toLong, w.toLong, h.toLong,
            ImageCodec.expectedFrameCrc(w, h, seed, f))
        }
      }
    }.toDF("media_id", "frame_idx", "width", "height", "frame_crc")
      .write.mode("overwrite").parquet(path)
  }

  /** Expected-signature fixture for `multimodal_image_neardup`: the
    * aHash of every [[mediaFromDocumentsPngTwins]] render computed from
    * the gray raster arithmetic ([[ImageCodec.expectedAHashGray]] — no
    * PNG encode, no ImageIO decode), so the DuckDB twin re-derives the
    * full pigeonhole pair table from independent signatures and
    * hash-checks the query's decode→aHash→pair pipeline end-to-end.
    */
  def exportExpectedTwinSignatures(docs: DataFrame, w: Int, h: Int,
                                   path: String): Unit = {
    import docs.sparkSession.implicits._
    if (alreadyStaged(docs.sparkSession, path)) return
    fanned(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val seed = text.getBytes("UTF-8")
        val twin = seed.clone()
        if (twin.nonEmpty) twin(0) = (twin(0) + 1).toByte
        val (lo0, hi0) = ImageCodec.expectedAHashGray(w, h, seed)
        val (lo1, hi1) = ImageCodec.expectedAHashGray(w, h, twin)
        Seq((id * 2, lo0, hi0), (id * 2 + 1, lo1, hi1))
      }
    }.toDF("media_id", "sim_lo", "sim_hi")
      .write.mode("overwrite").parquet(path)
  }

  /** Content-defined chunking (the rsync/LBFS/FastCDC family): split
    * each payload at positions where a rolling hash of the LAST
    * `window` bytes has its low `maskBits` bits zero — so boundary
    * placement depends only on local content, never on byte offsets.
    * That is the property fixed-size blocking lacks: insert 10 bytes at
    * the front of a file and every fixed block shifts (0% dedup), while
    * CDC boundaries re-synchronize after ~one chunk and every later
    * chunk hashes identically (spec-pinned). Chunk-level md5s then make
    * binary dedup a plain groupBy — the blob-store/transfer-dedup
    * primitive for the multimodal columns whose payloads repeat
    * (re-crawled images, re-encoded shards) without ever comparing
    * byte ranges pairwise.
    *
    * The sliding hash runs CONTINUOUSLY over the payload (subtract the
    * outgoing byte, never reset at a cut) — resetting at chunk starts
    * would make each boundary depend on the previous cut and slow
    * re-sync. Cuts obey [minLen, maxLen]: a cut candidate inside
    * minLen is skipped (its content still influences later windows),
    * and maxLen forces a cut so pathological content (all zeros — the
    * hash never masks out) cannot produce unbounded chunks. Expected
    * chunk length ≈ 2^maskBits bytes between min and max.
    *
    * Scale shape: one `flatMap` pass, per-row work linear in payload
    * bytes, output ~bytes/2^maskBits rows — the same bytes-bound batch
    * shape as every codec stage here. All arithmetic is wrapping
    * two's-complement 64-bit, identical on every JVM.
    */
  def cdcChunks(media: Dataset[MediaRow], window: Int, maskBits: Int,
                minLen: Int, maxLen: Int): Dataset[CdcChunk] = {
    import media.sparkSession.implicits._
    require(window >= 2 && maskBits >= 1, "degenerate rolling-hash config")
    require(minLen >= window && maxLen > minLen,
      "need window <= minLen < maxLen (a sub-window chunk has no full hash)")
    val B = 0x100000001b3L // FNV-ish odd multiplier; wrapping mul is the hash
    val mask = (1L << maskBits) - 1L
    media.flatMap { r =>
      val bytes = r.payload
      // B^(window-1) for the outgoing-byte subtraction, wrapping
      var bw = 1L
      var j = 1
      while (j < window) { bw *= B; j += 1 }
      val out = Vector.newBuilder[CdcChunk]
      val md = java.security.MessageDigest.getInstance("MD5")
      var start = 0
      var idx = 0L
      def emit(end: Int): Unit = {
        md.reset()
        md.update(bytes, start, end - start)
        val hex = md.digest().map("%02x".format(_)).mkString
        out += CdcChunk(r.media_id, idx, start.toLong, (end - start).toLong, hex)
        idx += 1
        start = end
      }
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        val in = bytes(i) & 0xffL
        h = if (i < window) h * B + in
            else (h - (bytes(i - window) & 0xffL) * bw) * B + in
        val len = i - start + 1
        if (len >= maxLen || (len >= minLen && i >= window - 1 && (h & mask) == 0L))
          emit(i + 1)
        i += 1
      }
      if (start < bytes.length) emit(bytes.length)
      out.result()
    }
  }
}

/** Real PNG encode/decode on the JVM's built-in ImageIO — no native or
  * external dependency, safe on headless executors.
  */
object ImageCodec {

  // ImageIO's default stream cache is DISK-backed: every encode/decode
  // call materializes a temp file (FileCache*Stream), which is invisible
  // single-threaded but serializes hard under concurrency — measured
  // r15: width-flooring the codec passes to 32 tasks made
  // multimodal_resize 3.7× SLOWER (2.3 s → 8.5 s) until this switch;
  // with the memory cache the same query runs 0.27 s. Payloads here are
  // tiny (≤ a few KB), so the in-memory stream is strictly better at
  // any parallelism. JVM-global, set once when the codec classloads on
  // each executor.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic grayscale byte-raster from seed bytes, PNG-encoded:
    * pixel (x,y) = seed[(y·w+x) mod len] in all three channels. Unlike
    * [[frame]] (whose seed-independent green pattern dominates luma and
    * makes every same-dim render perceptually near-identical — measured:
    * 106k aHash pairs across 1000 frame-rendered docs), the raster's
    * luma IS the seed, so perceptual distance tracks content distance:
    * a one-byte edit moves one pixel, unrelated seeds give ~32-bit
    * expected hamming.
    */
  def encodePngGray(width: Int, height: Int, seed: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val b = if (seed.isEmpty) 0 else seed((y * width + x) % seed.length) & 0xff
        img.setRGB(x, y, (b << 16) | (b << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic high-entropy raster for doc `id`: chained MD5 blocks
    * of `img:id:block`. Each doc's raster is an effectively uniform
    * draw of the aHash space — the realistic-diversity fixture seed
    * (text-byte rasters saturate ~5k distinct aHashes at 100k images).
    */
  def md5Raster(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var off = 0
    var blk = 0
    while (off < n) {
      val d = md.digest(s"img:$id:$blk".getBytes("UTF-8"))
      val m = math.min(16, n - off)
      System.arraycopy(d, 0, out, off, m)
      off += m
      blk += 1
    }
    out
  }

  /** Deterministic tiny RGB image from seed bytes, PNG-encoded. */
  def encodePng(width: Int, height: Int, seed: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frame(width, height, seed, 0), "png", bos)
    bos.toByteArray
  }

  private[multimodal] def frame(width: Int, height: Int, seed: Array[Byte],
                                f: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val b = if (seed.isEmpty) 0 else seed((y * width + x + f) % seed.length) & 0xff
        img.setRGB(x, y, (b << 16) | (((x * 31 + y + f * 7) & 0xff) << 8)
          | ((b ^ (x + y + f)) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic multi-frame animated GIF from seed bytes — the JVM's
    * built-in gif writer handles frame sequences, so the "video-like"
    * modality gets a REAL container with a real demuxer, no external
    * codecs.
    */
  def encodeGif(width: Int, height: Int, nFrames: Int, seed: Array[Byte]): Array[Byte] = {
    require(nFrames >= 1)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = frame(width, height, seed, f)
      // write NON-interlaced: the JDK gif writer defaults to interlaced
      // frames, and the JDK reader mis-orders interlace passes when
      // height < 5 (decoded row 1 held row 3's pixels — found r10 when
      // the generation-side expected-crc fixture refused to match every
      // h∈{3,4} render; h ≥ 5 frames hid the bug). Plain scan order
      // round-trips at every size and is what a real pipeline ships.
      val meta = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
        writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val tree = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = tree.getElementsByTagName("ImageDescriptor")
      if (kids.getLength > 0)
        kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          .setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, tree)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** GIF demux + per-frame decode → (frame index, width, height, pixel
    * crc) per frame; None when the payload is not a decodable GIF
    * sequence. The gif wire format is palettized, so pixel values
    * round-trip exactly and the crc is reproducible.
    */
  def decodeGifFrames(payload: Array[Byte]): Option[Vector[(Int, Int, Int, Long)]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        if (!reader.getFormatName.equalsIgnoreCase("gif")) None
        else {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map { i =>
            val img = reader.read(i)
            var crc = 1125899906842597L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { crc = crc * 31 + (img.getRGB(x, y) & 0xffffff); x += 1 }
              y += 1
            }
            (i, img.getWidth, img.getHeight, crc)
          }.toVector)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image resize: decode, nearest-neighbor rescale on a headless
    * Graphics2D (deterministic — no antialias/interpolation hints), PNG
    * re-encode. None when the payload is not a decodable image.
    */
  /** Real decode → DEFINED nearest-neighbor rescale → PNG re-encode.
    * The sample map is the explicit integer floor rule
    * `src(dx·srcW div tw, dy·srcH div th)` — not Graphics2D's NN hint,
    * whose sub-pixel rounding is implementation detail: a resize an
    * oracle can gate must have a pixel map both engines can state
    * (r13, VERDICT r12 #5; [[expectedResizeCrc]] is the generation-side
    * twin). Every sample stays in-bounds down to 1×1 sources
    * (dx ≤ tw−1 ⇒ dx·srcW div tw < srcW).
    */
  def resizePng(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (src == null) None
      else {
        val (sw, sh) = (src.getWidth, src.getHeight)
        val dst = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var dy = 0
        while (dy < targetH) {
          var dx = 0
          while (dx < targetW) {
            dst.setRGB(dx, dy,
              src.getRGB(dx * sw / targetW, dy * sh / targetH) & 0xffffff)
            dx += 1
          }
          dy += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** EXPECTED pixel crc of resizePng([[encodePng]](w,h,seed), tw, th)
    * computed from the [[frame]] arithmetic plus the same floor NN map —
    * no BufferedImage, no ImageIO: the generation-side twin that lets a
    * SQL oracle gate decode → rescale → re-encode → decode end-to-end
    * (the [[expectedFrameCrc]] pattern, one resample indirection added).
    */
  def expectedResizeCrc(width: Int, height: Int, seed: Array[Byte],
                        targetW: Int, targetH: Int): Long = {
    var crc = 1125899906842597L
    var dy = 0
    while (dy < targetH) {
      var dx = 0
      while (dx < targetW) {
        val x = dx * width / targetW
        val y = dy * height / targetH
        val b = if (seed.isEmpty) 0 else seed((y * width + x) % seed.length) & 0xff
        val rgb = (b << 16) | (((x * 31 + y) & 0xff) << 8) | ((b ^ (x + y)) & 0xff)
        crc = crc * 31 + rgb
        dx += 1
      }
      dy += 1
    }
    crc
  }

  /** 8×8 average-hash (aHash) of a decodable image payload: sample a
    * fixed 8×8 grid (nearest-neighbor — every cell stays in-bounds down
    * to 1×1 images), integer ITU-R 601 luma per sample (299r+587g+114b,
    * no doubles), bit = luma > integer mean. Returns the 64-bit
    * perceptual signature packed as two non-negative 32-bit halves
    * (lo = bits 0..31) — the same sign-safe packing as the text simhash
    * family, so the pigeonhole pair machinery is shared. None when the
    * payload doesn't decode.
    */
  def aHashPng(payload: Array[Byte]): Option[(Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val s = new Array[Long](64)
        var i = 0
        var total = 0L
        while (i < 64) {
          val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
          s(i) = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
          total += s(i)
          i += 1
        }
        val mean = total / 64
        var lo = 0L
        var hi = 0L
        i = 0
        while (i < 64) {
          if (s(i) > mean) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        Some((lo, hi))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** EXPECTED pixel crc of [[frame]] computed from the generation
    * arithmetic alone — no BufferedImage, no ImageIO: the independent
    * twin of [[decodePng]]'s fold for oracle fixtures. A query that
    * encodes with [[encodePng]] and decodes with [[decodePng]] matching
    * this value proves the container ROUNDTRIP, not just that two calls
    * of one code path agree.
    */
  def expectedFrameCrc(width: Int, height: Int, seed: Array[Byte],
                       f: Int): Long = {
    var crc = 1125899906842597L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val b = if (seed.isEmpty) 0 else seed((y * width + x + f) % seed.length) & 0xff
        val rgb = (b << 16) | (((x * 31 + y + f * 7) & 0xff) << 8) |
          ((b ^ (x + y + f)) & 0xff)
        crc = crc * 31 + rgb
        x += 1
      }
      y += 1
    }
    crc
  }

  /** EXPECTED 8×8 average-hash of an [[encodePngGray]] render, computed
    * from the gray raster arithmetic alone (same sampling grid, ITU-R
    * 601 luma and integer mean as [[aHashPng]], but never touching a
    * codec) — the independent signature twin that lets a SQL oracle
    * verify the decode→aHash path end-to-end.
    */
  def expectedAHashGray(width: Int, height: Int,
                        seed: Array[Byte]): (Long, Long) = {
    val s = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      val x = (i % 8) * width / 8
      val y = (i / 8) * height / 8
      val b = if (seed.isEmpty) 0 else seed((y * width + x) % seed.length) & 0xff
      s(i) = 1000L * b // 299b + 587b + 114b: gray luma is the byte itself
      total += s(i)
      i += 1
    }
    val mean = total / 64
    var lo = 0L
    var hi = 0L
    i = 0
    while (i < 64) {
      if (s(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (lo, hi)
  }

  /** PNG (or any ImageIO-readable) decode → (width, height, pixel crc);
    * None when the payload is not a decodable image.
    */
  def decodePng(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var crc = 1125899906842597L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { crc = crc * 31 + (img.getRGB(x, y) & 0xffffff); x += 1 }
          y += 1
        }
        Some((img.getWidth, img.getHeight, crc))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** Real WAV encode/decode on the JVM's built-in javax.sound.sampled —
  * like [[ImageCodec]], no native or external dependency, safe on
  * headless executors. PCM is 16-bit signed mono little-endian.
  */
object AudioCodec {

  private def format(sampleRate: Float) =
    new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)

  /** Deterministic PCM synth from seed bytes: a seed-modulated sawtooth —
    * stable across runs/engines, full 16-bit range exercised.
    */
  def pcmFromSeed(seed: Array[Byte], nSamples: Int): Array[Short] =
    Array.tabulate(nSamples) { i =>
      val b = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      (((i * 257 + b * 131) % 65536) - 32768).toShort
    }

  /** EXPECTED sample crc over a PCM buffer — the generation-side twin
    * of [[decodeWav]]'s fold (same signed-16-bit values, same
    * polynomial), for oracle fixtures: encode→decode matching this
    * proves the WAV container roundtrip.
    */
  def expectedPcmCrc(samples: Array[Short]): Long = {
    var crc = 1125899906842597L
    var i = 0
    while (i < samples.length) { crc = crc * 31 + samples(i); i += 1 }
    crc
  }

  /** 16-bit mono PCM samples → WAV container bytes. */
  def encodeWav(sampleRate: Float, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), format(sampleRate), samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** WAV decode → (sample rate, sample count, sample crc); None when the
    * payload is not a decodable audio container. The crc runs over the
    * decoded 16-bit samples, not the container bytes.
    */
  def decodeWav(payload: Array[Byte]): Option[(Float, Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      var crc = 1125899906842597L
      var i = 0
      while (i + 1 < data.length) {
        crc = crc * 31 + ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
        i += 2
      }
      Some((fmt.getSampleRate, data.length.toLong / math.max(1, fmt.getFrameSize), crc))
    } catch { case scala.util.control.NonFatal(_) => None }
}
