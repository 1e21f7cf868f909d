package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata, processed in batches by
  * `mapPartitions` over a typed Dataset (the Scala analog of a
  * vectorized Python UDF: per-partition batching amortizes codec setup,
  * and partition count — not row count — bounds memory).
  *
  * CODEC DISPATCH: payloads with an `image/`-prefixed mime take a REAL
  * decode and resize through `javax.imageio` (PNG/JPEG/BMP/GIF codecs
  * ship with the JVM — [[decodeImage]]/[[resizeImage]], spec-gated
  * over embedded real PNGs); `audio/`-prefixed payloads take a REAL
  * decode through `javax.sound.sampled` (WAV/AIFF/AU —
  * [[decodeAudio]], spec-gated over an embedded real WAV). Everything
  * else — including the registry fixtures, whose payloads are opaque
  * octet-streams — keeps the deterministic digest-derived STUB dims
  * ([[decodeStub]]), so the DuckDB-checkable expression twin stays
  * exact. `video/`-prefixed payloads yield REAL container metadata
  * through a pure-JVM ISO BMFF box parser ([[decodeVideoMeta]] —
  * dimensions and frame count from `moov/trak/tkhd` + `stts`) and
  * REAL per-frame byte ranges composed from the stsz/stco/stsc sample
  * tables ([[videoSampleRanges]] → [[frameSample]]), both spec-gated
  * over a handcrafted MP4. Video EMBEDDINGS are content-based too:
  * [[videoEmbedding]] decodes the sampled frames' bytes to pixels
  * (image-decodable stills, as in the fixtures) and mean-pools their
  * [[pixelEmbedding]]s over time; only when the extracted sample is a
  * true codec bitstream `javax.imageio` cannot read does the arm fall
  * back to the digest stub (no video codec ships with the JVM —
  * documented at [[videoEmbedding]]). Image embeddings are
  * CONTENT-BASED: [[pixelEmbedding]]
  * computes block-mean luminance over the decoded, bilinear-resized
  * pixels, so the ANN tier ranks images by what they look like, not
  * by a digest ([[embedMedia]]/[[annRetrieveMedia]]).
  */
object Multimodal {

  /** A media payload row: the fixture `documents.text` stands in for
    * the bytes of an image/audio object.
    */
  case class MediaRecord(doc_id: Long, content: Array[Byte], mime: String)

  /** Typed metadata extracted per payload. */
  case class MediaMeta(doc_id: Long, mime: String, n_bytes: Long,
                       digest: String, width: Long, height: Long,
                       n_frames: Long)

  /** Ingest: text → UTF-8 binary payload column. */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"))

  private val hexChars = "0123456789abcdef"

  /** STUB decoder — deterministic fake dimensions derived from the md5
    * digest (a real implementation would hand `content` to a codec).
    * width/height ∈ {16,…,256}, frames ∈ {1,…,16}.
    */
  def decodeStub(content: Array[Byte]): (Long, Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(content).map("%02x".format(_)).mkString
    def hv(i: Int): Long = hexChars.indexOf(digest.charAt(i)).toLong
    (16L * (hv(0) + 1), 16L * (hv(1) + 1), hv(2) + 1)
  }

  /** REAL image decode — `javax.imageio` (the PNG/JPEG/BMP/GIF codecs
    * that ship with the JVM): payload bytes → (width, height), None
    * when the bytes are not a decodable image. This is the codec swap
    * point the stub documents: [[extractMeta]] and [[resizeMedia]]
    * call it for `image/`-prefixed mimes and fall back to the digest stub
    * otherwise.
    */
  def decodeImage(content: Array[Byte]): Option[(Int, Int)] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content)))
      .map(img => (img.getWidth, img.getHeight))
    catch { case _: java.io.IOException => None }

  /** REAL image resize: decode, bilinear-scale into the target
    * dimensions, re-encode as PNG. None when the payload doesn't
    * decode (corrupt bytes never kill the batch — the row falls back
    * to the stub arm, the per-row error-isolation convention O17).
    */
  def resizeImage(content: Array[Byte], targetW: Int,
                  targetH: Int): Option[Array[Byte]] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))).map { img =>
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
      g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
    catch { case _: java.io.IOException => None }

  /** REAL audio decode — `javax.sound.sampled` (the WAV/AIFF/AU codecs
    * that ship with the JVM): payload bytes →
    * (sampleRate, channels, frames), None when the bytes are not a
    * decodable audio stream. Compressed formats (MP3/Opus) would need
    * an SPI on the classpath; they fall back to the stub arm like any
    * undecodable payload.
    */
  def decodeAudio(content: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(
          new java.io.ByteArrayInputStream(content)))
      try {
        val f = in.getFormat
        Some((f.getSampleRate.toInt, f.getChannels, in.getFrameLength))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL video-container metadata — a pure-JVM ISO BMFF (MP4/MOV) box
    * parser (ISO/IEC 14496-12: a file is a sequence of
    * [size:u32][type:4cc] boxes; `moov/trak/tkhd` carries the track's
    * 16.16-fixed width/height, `moov/trak/mdia/minf/stbl/stts` the
    * sample table whose counts sum to the frame count). No frame
    * DECODE happens — no video codec ships with the JVM — but the
    * metadata a curation pipeline filters on (dimensions, frame count)
    * comes from the real container, not a digest. Returns the first
    * track with nonzero dimensions; None for anything that isn't
    * well-formed BMFF.
    */
  def decodeVideoMeta(content: Array[Byte]): Option[(Long, Long, Long)] = {
    def u32(o: Int): Long =
      if (o + 4 > content.length) -1L
      else ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
        ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
    def fourcc(o: Int): String =
      if (o + 4 > content.length) ""
      else new String(content, o, 4, "ISO-8859-1")
    /** (type, payloadStart, payloadEnd) of each box in [start, end). */
    def boxes(start: Int, end: Int): List[(String, Int, Int)] = {
      var o = start
      val out = List.newBuilder[(String, Int, Int)]
      while (o + 8 <= end) {
        val size = u32(o)
        val tpe = fourcc(o + 4)
        // size==0 (to end) and size==1 (64-bit largesize) per spec
        val (pStart, boxEnd) =
          if (size == 0L) (o + 8, end)
          else if (size == 1L) {
            val hi = u32(o + 8); val lo = u32(o + 12)
            (o + 16, o + math.min((hi << 32 | lo), (end - o).toLong).toInt)
          } else (o + 8, o + math.min(size, (end - o).toLong).toInt)
        if (boxEnd <= o || pStart > boxEnd) return out.result()
        out += ((tpe, pStart, boxEnd))
        o = boxEnd
      }
      out.result()
    }
    def child(tpe: String, within: (Int, Int)): Option[(Int, Int)] =
      boxes(within._1, within._2).collectFirst {
        case (t, s, e) if t == tpe => (s, e) }
    try {
      val moov = child("moov", (0, content.length)).getOrElse(return None)
      boxes(moov._1, moov._2).collect { case ("trak", s, e) =>
        val dims = child("tkhd", (s, e)).flatMap { case (ts, _) =>
          // v0: 4 (version/flags) + 20 (times/id/reserved/duration) +
          // 8 + 2+2 + 2+2 (layer/group/volume/reserved) + 36 (matrix)
          // = 76 to width; v1's 64-bit times push it to 88
          val version = content(ts) & 0xff
          val off = ts + (if (version == 1) 88 else 76)
          val w = u32(off) >> 16; val h = u32(off + 4) >> 16
          if (w > 0 && h > 0) Some((w, h)) else None
        }
        val frames = for {
          mdia <- child("mdia", (s, e)); minf <- child("minf", mdia)
          stbl <- child("stbl", minf); stts <- child("stts", stbl)
        } yield {
          // entry_count is untrusted u32: clamp to what the box can
          // actually hold (8 bytes/entry) so a hostile payload can't
          // drive an OOM-sized range; u32 returns -1 past the buffer,
          // which the clamp also absorbs.
          val declared = u32(stts._1 + 4)
          val capacity = math.max(0L, ((stts._2 - stts._1 - 8) / 8).toLong)
          val n = math.min(math.max(0L, declared), capacity)
          var sum = 0L; var i = 0L
          while (i < n) { sum += u32(stts._1 + 8 + (i * 8).toInt); i += 1 }
          sum
        }
        dims.map { case (w, h) => (w, h, frames.getOrElse(0L)) }
      }.flatten.headOption
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Byte ranges of a BMFF video's SAMPLES (frames), composed from the
    * container's real sample tables (ISO/IEC 14496-12 §8.7): `stsz`
    * (per-sample sizes, or one uniform size), `stco` (chunk byte
    * offsets), and `stsc` (which run of chunks holds how many samples
    * each). Sample i's bytes start at its chunk's offset plus the
    * sizes of the samples before it in that chunk — the standard
    * composition every demuxer runs. All counts are clamped by their
    * box capacity and every range by the payload length, so a hostile
    * table can neither OOM the executor nor read past the buffer.
    * Returns None when any table is absent/garbled. (The extracted
    * bytes are the CODEC bitstream — no video codec ships with the
    * JVM, so decoding them to pixels stays out of scope; what a
    * curation pipeline shards, samples, and hashes is exactly these
    * per-frame byte ranges.)
    */
  def videoSampleRanges(content: Array[Byte]): Option[Seq[(Long, Long)]] = {
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > content.length) -1L
      else ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
        ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
    def fourcc(o: Int): String =
      if (o + 4 > content.length) ""
      else new String(content, o, 4, "ISO-8859-1")
    def boxes(start: Int, end: Int): List[(String, Int, Int)] = {
      var o = start
      val out = List.newBuilder[(String, Int, Int)]
      while (o + 8 <= end) {
        val size = u32(o)
        val tpe = fourcc(o + 4)
        val (pStart, boxEnd) =
          if (size == 0L) (o + 8, end)
          else if (size == 1L) {
            val hi = u32(o + 8); val lo = u32(o + 12)
            (o + 16, o + math.min((hi << 32 | lo), (end - o).toLong).toInt)
          } else (o + 8, o + math.min(size, (end - o).toLong).toInt)
        if (boxEnd <= o || pStart > boxEnd) return out.result()
        out += ((tpe, pStart, boxEnd))
        o = boxEnd
      }
      out.result()
    }
    def child(tpe: String, within: (Int, Int)): Option[(Int, Int)] =
      boxes(within._1, within._2).collectFirst {
        case (t, s, e) if t == tpe => (s, e) }
    // a FullBox's u32 list at `start+8`, declared count clamped by the
    // box capacity (`width` u32s per entry)
    def u32List(b: (Int, Int), width: Int): Seq[Long] = {
      val declared = u32(b._1 + 4)
      val capacity = math.max(0L, ((b._2 - b._1 - 8) / (4L * width)))
      val n = math.min(math.max(0L, declared), capacity).toInt
      (0 until n * width).map(i => u32(b._1 + 8 + i * 4))
    }
    try {
      val stbl = for {
        moov <- child("moov", (0, content.length))
        trak <- child("trak", moov)
        mdia <- child("mdia", trak)
        minf <- child("minf", mdia)
        stbl <- child("stbl", minf)
      } yield stbl
      val tables = stbl.flatMap { s =>
        for { stsz <- child("stsz", s); stco <- child("stco", s)
              stsc <- child("stsc", s) } yield (stsz, stco, stsc)
      }
      tables.flatMap { case (stsz, stco, stsc) =>
        // stsz: version/flags, sample_size (0 → per-sample list), count
        val uniform = u32(stsz._1 + 4)
        val nSamples0 = u32(stsz._1 + 8)
        if (nSamples0 <= 0) return None
        val szCapacity = math.max(0L, (stsz._2 - stsz._1 - 12) / 4)
        val nSamples = (if (uniform > 0) nSamples0
          else math.min(nSamples0, szCapacity)).toInt
        def sizeOf(i: Int): Long =
          if (uniform > 0) uniform else u32(stsz._1 + 12 + i * 4)
        val chunkOffsets = u32List(stco, 1)
        val stscRuns = u32List(stsc, 3).grouped(3)
          .collect { case Seq(first, per, _) => (first, per) }.toSeq
        if (chunkOffsets.isEmpty || stscRuns.isEmpty) return None
        val out = Seq.newBuilder[(Long, Long)]
        var sample = 0
        chunkOffsets.zipWithIndex.foreach { case (chunkOff, ci) =>
          val perChunk = stscRuns.takeWhile(_._1 <= ci + 1)
            .lastOption.map(_._2).getOrElse(0L)
          var within = 0L
          var k = 0L
          while (k < perChunk && sample < nSamples) {
            val sz = sizeOf(sample)
            val start = chunkOff + within
            if (sz > 0 && start >= 0 && start + sz <= content.length)
              out += ((start, sz))
            within += math.max(0L, sz)
            sample += 1; k += 1
          }
        }
        val ranges = out.result()
        if (ranges.isEmpty) None else Some(ranges)
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Batched metadata extraction: mapPartitions processes payloads in
    * fixed-size batches (the shape a real codec wants — reuse one codec
    * instance per batch, bound peak memory by batch size, stay columnar
    * on both ends). `image/`-prefixed payloads decode for REAL
    * ([[decodeImage]]; a single decoded image is one frame);
    * `audio/`-prefixed payloads likewise ([[decodeAudio]] — the meta
    * fields map as width = sample rate, height = channels,
    * n_frames = PCM frame count); anything else — or a payload that
    * fails its codec — takes the digest stub.
    */
  def extractMeta(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup (codec init in a real decoder)
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { r =>
          md.reset()
          val digest = md.digest(r.content).map("%02x".format(_)).mkString
          def hv(i: Int): Long = hexChars.indexOf(digest.charAt(i)).toLong
          val real: Option[(Long, Long, Long)] =
            if (r.mime.startsWith("image/"))
              decodeImage(r.content).map { case (w, h) =>
                (w.toLong, h.toLong, 1L) }
            else if (r.mime.startsWith("audio/"))
              decodeAudio(r.content).map { case (rate, ch, frames) =>
                (rate.toLong, ch.toLong, frames) }
            else if (r.mime.startsWith("video/"))
              decodeVideoMeta(r.content)
            else None
          real match {
            case Some((w, h, nf)) =>
              MediaMeta(r.doc_id, r.mime, r.content.length.toLong, digest,
                w, h, nf)
            case None =>
              MediaMeta(r.doc_id, r.mime, r.content.length.toLong, digest,
                16L * (hv(0) + 1), 16L * (hv(1) + 1), hv(2) + 1)
          }
        }
      }
    }
  }

  /** A resized media payload. For `image/`-prefixed mimes the
    * transform is a REAL bilinear resize + PNG re-encode
    * ([[resizeImage]]); for opaque payloads (and images that fail to
    * decode) it is the deterministic stub: output bytes are a
    * truncated/repeated view sized proportionally to the target dims,
    * so downstream size accounting behaves like a real resize and the
    * registry oracle can recompute it.
    */
  case class ResizedMedia(doc_id: Long, width: Long, height: Long,
                          content: Array[Byte])

  def resizeMedia(media: Dataset[MediaRecord], targetW: Int, targetH: Int,
                  batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val real = if (r.mime.startsWith("image/"))
            resizeImage(r.content, targetW, targetH) else None
          val out = real.getOrElse {
            // STUB: proportional byte budget in place of real re-encoding
            val budget = math.max(1, targetW * targetH / 64)
            Array.tabulate[Byte](math.min(budget, r.content.length))(
              i => r.content(i % r.content.length))
          }
          ResizedMedia(r.doc_id, targetW.toLong, targetH.toLong, out)
        }
      }
    }
  }

  /** Frame sampling for video-like payloads: every n-th fixed-size
    * chunk of the payload stands in for a decoded frame — the output
    * shape (one row per sampled frame with frame_idx) is exactly what a
    * real frame sampler produces.
    */
  case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

  def frameSampleStub(media: Dataset[MediaRecord], frameSize: Int,
                      everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = math.max(1, r.content.length / frameSize)
      (0L until nFrames.toLong).filter(_ % everyN == 0).map { i =>
        val start = (i * frameSize).toInt
        val end = math.min(start + frameSize, r.content.length)
        Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.content, start, end))
      }
    }
  }

  /** Frame sampling with REAL container offsets where the payload has
    * them: a `video/` payload whose BMFF sample tables parse yields
    * every `everyN`-th actual sample's bytes at its real
    * [[videoSampleRanges]] offsets (frame_idx = the sample's index in
    * the container); everything else — opaque payloads, videos without
    * a parseable table — keeps the deterministic fixed-chunk stub, so
    * the oracle-checkable arm is unchanged. Same output shape either
    * way: one row per sampled frame.
    */
  def frameSample(media: Dataset[MediaRecord], frameSize: Int,
                  everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val real: Option[Seq[Frame]] =
        if (r.mime.startsWith("video/"))
          videoSampleRanges(r.content).map(_.zipWithIndex.collect {
            case ((off, sz), i) if i % everyN == 0 =>
              Frame(r.doc_id, i.toLong, java.util.Arrays.copyOfRange(
                r.content, off.toInt, (off + sz).toInt))
          })
        else None
      real.getOrElse {
        val nFrames = math.max(1, r.content.length / frameSize)
        (0L until nFrames.toLong).filter(_ % everyN == 0).map { i =>
          val start = (i * frameSize).toInt
          val end = math.min(start + frameSize, r.content.length)
          Frame(r.doc_id, i,
            java.util.Arrays.copyOfRange(r.content, start, end))
        }
      }
    }
  }

  /** Registry wrapper driving the REAL [[resizeMedia]] typed path (not
    * an expression twin): binary payloads through mapPartitions
    * batching, then scalar accounting columns the oracle can recompute
    * (the fixtures are octet-stream payloads, so they take the
    * deterministic stub arm — a prefix-sized view of the payload; real
    * PNGs take the ImageIO arm, spec-gated).
    */
  def resizeMeta(documents: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import documents.sparkSession.implicits._
    resizeMedia(asMedia(documents).as[MediaRecord], targetW, targetH).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        length(col("content")).cast("long").as("n_bytes_out"),
        md5(col("content")).as("digest"))
      .orderBy(col("doc_id"))
  }

  /** Registry wrapper driving the REAL `frameSampleStub` flatMap path:
    * one output row per sampled frame with index + length — the row
    * explosion shape of a real video frame sampler.
    */
  def frameStats(documents: DataFrame, frameSize: Int, everyN: Int): DataFrame = {
    import documents.sparkSession.implicits._
    frameSample(asMedia(documents).as[MediaRecord], frameSize, everyN).toDF()
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame_bytes")).cast("long").as("frame_len"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Expression-level twin of `extractMeta` (codegen-friendly, used as
    * the DuckDB-checkable registry query; the spec asserts it agrees
    * with the mapPartitions path row-for-row).
    */
  /** Tile-grid expansion: one row per (tile_x, tile_y) cell of each
    * media item's (derived) dimensions, with edge tiles clipped — the
    * patch/tiling fan-out of a vision pipeline (ViT patches, SAM tiles)
    * as pure generators: two Generate nodes, no shuffle, no UDF.
    */
  def tileGrid(documents: DataFrame, tile: Int = 64): DataFrame = {
    val t = lit(tile.toLong)
    val ntx = expr(s"(width + ${tile - 1}) div $tile")
    val nty = expr(s"(height + ${tile - 1}) div $tile")
    metaExpr(documents).select(col("doc_id"), col("width"), col("height"))
      .select(col("doc_id"), col("width"), col("height"),
        explode(sequence(lit(0L), ntx - 1)).as("tx"))
      .select(col("doc_id"), col("width"), col("height"), col("tx"),
        explode(sequence(lit(0L), nty - 1)).as("ty"))
      .select(col("doc_id"), col("tx"), col("ty"),
        least(t, col("width") - col("tx") * t).cast("long").as("tile_w"),
        least(t, col("height") - col("ty") * t).cast("long").as("tile_h"))
      .orderBy(col("doc_id"), col("tx"), col("ty"))
  }

  /** Embedding-extraction STUB: binary payload → fixed-dim feature
    * vector, the media-to-vector step a real pipeline runs with a
    * vision/audio encoder before ANN indexing (`sim_*`). The stub
    * derives dims from the payload digest (one hex pair each,
    * normalized to [0,1] by a single exact division), so the whole
    * binary→vector→search plumbing is engine-checkable; swapping in a
    * real encoder changes only this projection. Flattened to scalar
    * columns for the cross-engine compare.
    */
  def embedStub(documents: DataFrame, dims: Int = 8): DataFrame = {
    val media = asMedia(documents)
    media
      .withColumn("dg", md5(col("content")))
      .select(col("doc_id") +: (0 until dims).map { i =>
        (conv(substring(col("dg"), i * 2 + 1, 2), 16, 10).cast("double") / 255.0)
          .as(s"e$i")
      }: _*)
      .orderBy(col("doc_id"))
  }

  /** CONTENT-BASED image embedding — block-mean luminance over a
    * fixed bilinear-resized grid (the blockhash/pHash family feature
    * map): decode the pixels ([[decodeImage]]'s codecs), bilinear-
    * resize to the smallest g×g grid with g² ≥ dims, and take the
    * first `dims` cells' mean luminance (ITU-R BT.601 weights)
    * normalized to [0,1]. Deterministic, model-free, and computed
    * from the DECODED CONTENT: two re-encodes of the same picture map
    * to nearby vectors, different pictures don't — which is what the
    * ANN tier downstream needs from an encoder. Swapping in a learned
    * vision encoder changes only this function. None when the bytes
    * don't decode.
    */
  def pixelEmbedding(content: Array[Byte], dims: Int = 8): Option[Array[Double]] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))).map { img =>
      val g = math.ceil(math.sqrt(dims.toDouble)).toInt
      val grid = new java.awt.image.BufferedImage(
        g, g, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = grid.createGraphics()
      gr.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gr.drawImage(img, 0, 0, g, g, null)
      gr.dispose()
      Array.tabulate(dims) { i =>
        val rgb = grid.getRGB(i % g, i / g)
        val (r, gn, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        (0.299 * r + 0.587 * gn + 0.114 * b) / 255.0
      }
    }
    // NonFatal, not just IOException: ImageIO on corrupt/hostile
    // payloads throws RuntimeExceptions too (IllegalArgumentException,
    // CMMException, AIOOBE from codec plugins) — an undecodable
    // payload must always take the stub arm, never kill the task (O17)
    catch { case scala.util.control.NonFatal(_) => None }

  /** CONTENT-BASED audio embedding — windowed energy over the decoded
    * PCM stream (the log-mel front end's shape, model-free): decode
    * through `javax.sound.sampled` ([[decodeAudio]]'s codecs), convert
    * to 16-bit signed PCM, mix channels to mono, split the stream into
    * `dims` equal time windows, and take each window's RMS amplitude
    * normalized to [0,1]. Deterministic and computed from the DECODED
    * SAMPLES: two containers of the same signal (WAV vs AIFF, or a
    * byte-order re-encode) map to near-identical vectors, different
    * signals don't — the property the ANN tier downstream needs from
    * an encoder. Swapping in a learned audio encoder changes only this
    * function. None when the bytes don't decode (compressed codecs —
    * MP3/Opus — have no JVM decoder; they take the stub arm, same
    * honest boundary as video pixel decode).
    */
  def audioEmbedding(content: Array[Byte], dims: Int = 8): Option[Array[Double]] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(
          new java.io.ByteArrayInputStream(content)))
      try {
        val f = raw.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels,
          f.getChannels * 2, f.getSampleRate, false)
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(target, raw)
        try {
          val bytes = in.readAllBytes()
          val ch = target.getChannels
          val nFrames = bytes.length / (2 * ch)
          if (nFrames == 0) None
          else {
            // mono mix per frame, then RMS per fixed time window
            val sumSq = new Array[Double](dims)
            val counts = new Array[Long](dims)
            var fr = 0
            while (fr < nFrames) {
              var c = 0; var acc = 0.0
              while (c < ch) {
                val o = (fr * ch + c) * 2
                val s = ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
                acc += s / 32768.0; c += 1
              }
              val w = math.min(dims - 1, (fr.toLong * dims / nFrames).toInt)
              val m = acc / ch
              sumSq(w) += m * m; counts(w) += 1
              fr += 1
            }
            Some(Array.tabulate(dims)(i =>
              if (counts(i) == 0) 0.0
              else math.min(1.0, math.sqrt(sumSq(i) / counts(i)))))
          }
        } finally in.close()
      } finally raw.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** CONTENT-BASED video embedding — decoded-frame pooling over the
    * container's real sample table: resolve the per-frame byte ranges
    * from the BMFF stsz/stco/stsc tables ([[videoSampleRanges]] — the
    * same demuxer composition [[frameSample]] serves), decode every
    * `everyN`-th sample's bytes as a still image, block-mean-embed the
    * decoded pixels ([[pixelEmbedding]] — the image tier's encoder),
    * and MEAN-POOL across the sampled frames (the standard
    * frame-pooling video baseline: two cuts of the same footage map
    * close, different footage doesn't). None when the container
    * doesn't parse or NO sampled frame decodes to pixels — a payload
    * whose samples are a codec bitstream the JVM can't decode (H.264
    * etc.) falls to the digest stub, the same honest boundary as
    * compressed audio; containers carrying image-coded frames (MJPEG-
    * style, the fixtures' shape) embed from real pixel content.
    */
  def videoEmbedding(content: Array[Byte], dims: Int = 8,
                     everyN: Int = 1): Option[Array[Double]] =
    videoSampleRanges(content).flatMap { ranges =>
      val embs = ranges.zipWithIndex.collect {
        case ((off, sz), i) if i % everyN == 0 =>
          pixelEmbedding(java.util.Arrays.copyOfRange(
            content, off.toInt, (off + sz).toInt), dims)
      }.flatten
      if (embs.isEmpty) None
      else Some(Array.tabulate(dims)(d => embs.map(_(d)).sum / embs.length))
    }

  /** Typed media→vector ENCODER with codec dispatch — the serving
    * encoder of the multimodal tier: `image/` payloads embed from
    * their decoded pixels ([[pixelEmbedding]]), `audio/` payloads from
    * their decoded PCM samples ([[audioEmbedding]]), `video/` payloads
    * from their decoded sampled frames pooled over time
    * ([[videoEmbedding]]); everything else (and any payload its codec
    * rejects) takes the digest stub with arithmetic IDENTICAL to
    * [[embedStub]]'s expression twin (spec-asserted row-for-row on the
    * stub arm), so the oracle-checkable registry formulation and this
    * batch path can never drift. Output: (doc_id, embedding) — the
    * same column shape the `embeddings` fixture table and the whole
    * `sim_*` tier consume; nothing downstream knows the vector came
    * from bytes.
    */
  def embedMedia(media: Dataset[MediaRecord],
                 dims: Int = 8,
                 batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { r =>
          val real =
            if (r.mime.startsWith("image/")) pixelEmbedding(r.content, dims)
            else if (r.mime.startsWith("audio/")) audioEmbedding(r.content, dims)
            else if (r.mime.startsWith("video/")) videoEmbedding(r.content, dims)
            else None
          val vec = real.getOrElse {
            md.reset()
            val digest = md.digest(r.content).map("%02x".format(_)).mkString
            Array.tabulate(dims)(i =>
              java.lang.Long.parseLong(digest.substring(i * 2, i * 2 + 2), 16)
                .toDouble / 255.0)
          }
          (r.doc_id, vec)
        }
      }
    }.toDF("doc_id", "embedding")
  }

  /** Multimodal retrieval END-TO-END: media payload → embedding
    * ([[embedStub]]'s projection, as an array) → cosine top-k — the
    * "find media like this one" pipeline (CLIP-style retrieval), here
    * closing the loop between the multimodal ingest tier and the
    * similarity tier: the SAME serving shape as
    * [[graft.ops.Similarity.cosineTopK]], fed by the binary column
    * instead of a precomputed vector table. Swapping the stub for a
    * real encoder changes only the projection; at corpus scale the
    * brute-force arm hands off to the IVF/PQ tier exactly as the
    * `embeddings` table does (the vectors are just a column — nothing
    * downstream knows they came from binary payloads).
    *
    * Scale shape: embedding is a per-row projection inside the scan
    * (no shuffle); queries broadcast; per-query top-k through the
    * two-phase heap node — the full candidate set never sorts.
    */
  def annRetrieve(documents: DataFrame, nQueries: Int = 8, k: Int = 5,
                  dims: Int = 8): DataFrame = {
    val media = asMedia(documents)
      .withColumn("dg", md5(col("content")))
    val emb = media.select(col("doc_id"),
      array((0 until dims).map { i =>
        conv(substring(col("dg"), i * 2 + 1, 2), 16, 10).cast("double") / 255.0
      }: _*).as("embedding"))
    annFromEmbeddings(emb, nQueries, k)
  }

  /** [[annRetrieve]] over the TYPED encoder path ([[embedMedia]]) —
    * the serving composition for real media: image payloads rank by
    * their decoded pixel content (two re-encodes of one picture find
    * each other), opaque payloads by the digest stub. Identical plan
    * shape to [[annRetrieve]] downstream of the encoder.
    */
  def annRetrieveMedia(media: Dataset[MediaRecord], nQueries: Int = 8,
                       k: Int = 5, dims: Int = 8): DataFrame =
    annFromEmbeddings(embedMedia(media, dims), nQueries, k)

  private def annFromEmbeddings(emb: DataFrame, nQueries: Int,
                                k: Int): DataFrame = {
    val queries = emb.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("embedding").as("qe"))
    val scored = emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qe"), col("ce")).as("sim"))
    Similarity.topKRanked(scored, "sim", k)
  }

  /** pHash-style perceptual fingerprint geometry: 64 bits as 4 × 16-bit
    * BAND values — the band is both the LSH bucketing unit and keeps
    * every value comfortably inside a signed BIGINT on both engines.
    * Single source of truth is [[graft.functions.PhashBands]] (the
    * native expression computing the fingerprint).
    */
  val phashBandBits: Int = graft.functions.PhashBands.bandBits
  val phashNBands: Int = graft.functions.PhashBands.nBands
  val phashChunks: Int = graft.functions.PhashBands.chunks

  /** The 4 band columns of the stub perceptual hash, BUILTIN-EXPRESSION
    * formulation — kept as the cross-checkable twin of the native
    * [[graft.functions.PhashBands]] expression (MultimodalSpec asserts
    * they agree row-for-row; the DuckDB oracle mirrors this SQL shape).
    * NOT used on the hot path: its 64 inlined md5 trees exceed janino's
    * 64 KB generated-method limit, silently dropping the projection out
    * of whole-stage codegen.
    *
    * Like real pHash resizes every image to fixed dimensions before
    * hashing, the payload is cut into exactly [[phashChunks]] chunks of
    * length-PROPORTIONAL width (clen = len div 64) — a short payload
    * still fills all 64 bits; a fixed chunk width would leave short
    * docs sharing constant empty-tail bits and make every pair of
    * short docs a false near-dup. Bit i = parity of chunk i's md5:
    * CHUNK-LOCAL, so an edit flips only the touched chunks' bits and
    * Hamming distance tracks the edited area — the locality a real
    * blockhash/pHash gets from block means over pixels. Swapping
    * chunk-parity for DCT sign bits over a real decode changes only
    * this projection; the banding, candidate generation, and
    * verification around it are the production shape.
    */
  def phashBandCols(text: Column, clen: Column): Seq[Column] =
    (0 until phashNBands).map { b =>
      (0 until phashBandBits).map { r =>
        val i = b * phashBandBits + r
        val chunk = substr(text, lit(1L) + lit(i.toLong) * clen, clen)
        val bit = conv(substring(md5(chunk), 1, 1), 16, 10).cast("long") % 2
        bit * lit(1L << r)
      }.reduce(_ + _)
    }

  /** Per-document fingerprint: (doc_id, b0..b3). One projection, no
    * shuffle — the fingerprint pass streams over the corpus once,
    * through the native codegen'd [[graft.functions.PhashBands]]
    * expression (one generated call per row; the builtin
    * [[phashBandCols]] twin's 64 inlined md5 trees blew janino's 64 KB
    * method limit and ran interpreted). The band array lands in its own
    * projection; the element extracts stay a SEPARATE projection —
    * CollapseProject keeps non-cheap expressions used more than once
    * uninlined, so the fingerprint is computed exactly once per row.
    */
  def phashFingerprints(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        graft.functions.PhashBands.phash_bands(col("text")).as("__pb"))
      .select(col("doc_id") +: (0 until phashNBands).map(b =>
        element_at(col("__pb"), b + 1).as(s"b$b")): _*)

  /** Multimodal near-dup pairs via banded Hamming LSH over the pHash
    * fingerprint — the [[graft.ops.Dedup]] tier applied to media: a
    * candidate pair must share at least one EXACT 16-bit band (equi-
    * join per (band_idx, band_val) bucket — all-pairs are never
    * enumerated, plan-audited), then only candidates pay the exact
    * 64-bit Hamming verification. A pair within `maxHamming` bits
    * differs in at most that many chunks of the normalized view.
    */
  /** Perceptual near-dup CLUSTERS: connected components over the
    * banded-Hamming pair set — A~B, B~C collapse to ONE canonical
    * medium even when A~C never shared a band (pairs alone don't
    * dedup; same capstone as [[graft.ops.Dedup.nearDupClusters]]),
    * through the O(log² n) star-contraction CC
    * ([[graft.ops.Graph.connectedComponents]]) so even deep duplicate
    * chains — re-encodes of re-encodes, each within `maxHamming` of
    * the previous generation — converge in logarithmic rounds.
    * Output: (doc_id, canon_id, n_members) for every medium in ≥1
    * near-dup pair; doc_id = canon_id marks the survivor.
    */
  def phashClusters(documents: DataFrame, maxHamming: Int = 4): DataFrame =
    phashClustersFrom(phashDups(documents, maxHamming))

  /** [[phashClusters]] from a precomputed pair set — the sharing point
    * the folded `mm_phash_family` registry entry uses so the pair arm
    * and the cluster arm enumerate candidates once. Result-identical.
    */
  private[graft] def phashClustersFrom(dups: DataFrame): DataFrame =
    graft.ops.Graph.connectedComponents(
        dups.select(col("id1").as("src"), col("id2").as("dst")))
      .select(col("id").as("doc_id"), col("component").as("canon_id"),
        col("n_members"))
      .orderBy(col("doc_id"))

  def phashDups(documents: DataFrame, maxHamming: Int = 4): DataFrame = {
    val fp = phashFingerprints(documents)
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
    val banded = fp.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_idx", "band_val")))
    val cand = banded.alias("x").join(banded.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    val f1 = fp.select(col("doc_id").as("id1"), col("b0").as("x0"),
      col("b1").as("x1"), col("b2").as("x2"), col("b3").as("x3"))
    val f2 = fp.select(col("doc_id").as("id2"), col("b0").as("y0"),
      col("b1").as("y1"), col("b2").as("y2"), col("b3").as("y3"))
    cand.join(f1, Seq("id1")).join(f2, Seq("id2"))
      .select(col("id1"), col("id2"),
        expr("CAST(bit_count(x0 ^ y0) + bit_count(x1 ^ y1) + " +
          "bit_count(x2 ^ y2) + bit_count(x3 ^ y3) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  def metaExpr(documents: DataFrame): DataFrame = {
    val media = asMedia(documents)
    val digest = md5(col("content"))
    // hex digit value via 1-based locate (mirrors DuckDB strpos)
    def hv(i: Int) =
      (call_function("locate", substring(digest, i, 1), lit(hexChars)) - 1)
        .cast("long")
    media.select(
        col("doc_id"), col("mime"),
        length(col("content")).cast("long").as("n_bytes"),
        digest.as("digest"),
        (lit(16L) * (hv(1) + 1)).as("width"),
        (lit(16L) * (hv(2) + 1)).as("height"),
        (hv(3) + 1).as("n_frames"))
      .orderBy(col("doc_id"))
  }
}
