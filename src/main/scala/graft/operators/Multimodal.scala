package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, decoded/feature-extracted in
  * distributed batches.
  *
  * The Spark-side shape is real and tested — binary payload column,
  * metadata struct, partition-batched decode via `Dataset.mapPartitions`
  * (the JVM analog of mapInPandas: one iterator per partition, so a
  * decoder can amortize model/codec setup per batch). Image dimensions
  * decode for real via javax.imageio; audio/video codecs are not in
  * this container, so [[Decoder.decode]] falls back to deterministic
  * pseudo-features there. Swapping in real codecs changes only that
  * function.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      media: Array[Byte],        // opaque payload (image/audio/video)
      kind: String,              // "image" | "audio" | "video"
      source: String)

  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      byte_len: Long,
      width: Long,               // fake-decoded dimensions
      height: Long,
      n_frames: Long,
      checksum: Long)            // rolling byte hash

  /** Feature decoder. Images decode for REAL via javax.imageio (in the
    * JDK: PNG/JPEG/GIF/BMP width+height); payloads ImageIO cannot read
    * — and audio/video, whose codecs are not in this container — fall
    * back to deterministic pseudo-features derived from the bytes, so
    * the pipeline stays total and oracle-checkable. Swapping in real
    * audio/video codecs changes only [[decode]]'s fallback arms. */
  object Decoder {
    /** Real image HEADER decode: Some((width, height)) when the bytes
      * are a readable image, None otherwise. Header-only on purpose —
      * ImageIO.read would decode the full pixel raster (a 50-megapixel
      * JPEG → hundreds of MB of heap churn per row on the per-partition
      * hot path); ImageReader.getWidth/getHeight read just the header. */
    def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      var stream: javax.imageio.stream.ImageInputStream = null
      try {
        stream = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(stream)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally if (stream != null) stream.close()
    }

    def decode(r: MediaRecord): MediaFeatures = {
      val len = r.media.length.toLong
      // rolling hash of payload bytes (checksum feature)
      var h = 0L
      var i = 0
      while (i < r.media.length) { h = (h * 31 + (r.media(i) & 0xff)) % 1000000007L; i += 1 }
      val (w, ht) = (if (r.kind == "image") imageDims(r.media) else None)
        .map { case (dw, dh) => (dw.toLong, dh.toLong) }
        .getOrElse((len % 640 + 1, len % 480 + 1)) // pseudo-dims fallback
      MediaFeatures(r.doc_id, r.kind, len,
        width = w, height = ht,
        n_frames = if (r.kind == "video") len % 30 + 1 else 1L,
        checksum = h)
    }
  }

  /** Wrap documents as media records: the text payload plays the role
    * of opaque bytes; kind assigned round-robin by id (deterministic). */
  def mediaFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("source"))
      .as[MediaRecord]
  }

  /** Partition-batched feature extraction. Narrow transformation — no
    * shuffle; scales with input partitions. */
  def extractFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      // per-partition setup would go here (codec init, model load)
      batch.map(Decoder.decode)
    }
  }

  final case class MediaPhash(
      doc_id: Long,
      kind: String,
      phash: Long)               // simhash over byte 4-grams

  /** Perceptual payload fingerprint: simhash (the d05 strict-majority
    * vote) over rolling byte-4-gram hashes. A small payload edit
    * keeps most 4-grams and so usually the same phash — catching the
    * near-identical re-encodes/re-crawls that m04's exact checksum
    * can't. Narrow mapPartitions like every decode-stage feature; no
    * shuffle. Identical payloads always collide (phash is a pure
    * function of the bytes), so perceptual redundancy ≥ exact
    * redundancy by construction. */
  def perceptualHash(media: Dataset[MediaRecord], bits: Int = 24)(
      implicit spark: SparkSession): Dataset[MediaPhash] = {
    // gram hashes are taken mod 1e9+7 (< 2^30), so bit positions ≥ 30
    // would always vote 0 — a silent quality degradation, not an error
    require(bits >= 1 && bits <= 30,
      s"phash bits must be in [1, 30] (gram hashes carry 30 bits), got $bits")
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        // null payload (a null CSV text cast to binary) = empty: no
        // grams, no votes, phash 0 — never an NPE on user data
        val bs = if (r.media == null) Array.emptyByteArray else r.media
        MediaPhash(r.doc_id, r.kind, gramSimhash(bs, 0, bs.length, bits))
      }
    }
  }

  /** Strict-majority simhash (the d05 vote) over rolling byte-4-gram
    * hashes of bs[from, until) — grams fully inside the range vote.
    * Shared by [[perceptualHash]] (whole payload) and
    * [[videoSignatures]] (per-frame span). */
  private def gramSimhash(bs: Array[Byte], from: Int, until: Int,
      bits: Int): Long = {
    val ones = new Array[Long](bits)
    var n = 0L
    var i = math.max(from, 0)
    while (i + 3 < until) {
      var h = 0L
      var j = 0
      while (j < 4) { h = (h * 31 + (bs(i + j) & 0xff)) % 1000000007L; j += 1 }
      var b = 0
      while (b < bits) { ones(b) += (h >> b) & 1L; b += 1 }
      n += 1
      i += 1
    }
    var ph = 0L
    var b = 0
    while (b < bits) { if (2 * ones(b) > n) ph |= (1L << b); b += 1 }
    ph
  }

  /** Strict-majority simhash over an explicit hash list (the same
    * vote as [[gramSimhash]], tokens given directly). */
  private def simhashOver(hs: Seq[Long], bits: Int): Long = {
    var ph = 0L
    var b = 0
    while (b < bits) {
      var ones = 0L
      hs.foreach(h => ones += (h >> b) & 1L)
      if (2 * ones > hs.size) ph |= (1L << b)
      b += 1
    }
    ph
  }

  final case class VideoSig(
      doc_id: Long,
      sig: Long)                 // order-aware per-video signature

  /** m06: per-video perceptual signature — m02's evenly-spaced frame
    * sampling composed with m05's 4-gram simhash, per FRAME SPAN: the
    * payload is cut into n_frames equal byte spans (the pseudo-frame
    * contract), each sampled span gets its gram simhash, and the
    * (phash·31 + pos) token hashes fold into one order-aware simhash.
    * A re-encode (small byte edits, different checksum) keeps most
    * grams in most sampled spans, so the signature usually survives —
    * the collision m04's exact checksum can never produce. Narrow
    * mapPartitions like every decode-stage feature; no shuffle. */
  def videoSignatures(media: Dataset[MediaRecord], maxFrames: Int = 4,
      bits: Int = 24)(implicit spark: SparkSession): Dataset[VideoSig] = {
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val bs = if (r.media == null) Array.emptyByteArray else r.media
        val len = bs.length.toLong
        val nf = len % 30 + 1          // Decoder.decode's video n_frames
        val samples = math.min(nf, maxFrames.toLong).toInt
        val step = nf / samples
        val span = math.max(1L, len / nf)
        val toks = (0 until samples).map { i =>
          val pos = i.toLong * step
          val from = math.min(pos * span, len).toInt
          val until = math.min((pos + 1) * span, len).toInt
          (gramSimhash(bs, from, until, bits) * 31L + pos) % 1000000007L
        }
        VideoSig(r.doc_id, simhashOver(toks, bits))
      }
    }
  }

  final case class FrameFeature(
      doc_id: Long,
      kind: String,
      frame_pos: Long,           // sampled frame index within the stream
      frame_hash: Long,          // per-frame fingerprint
      out_w: Long,               // aspect-preserving resize into box×box
      out_h: Long)

  /** Frame-sample + resize: the one-to-many leg of the multimodal
    * pipeline (a video row explodes into up to `maxFrames` evenly
    * spaced frame rows; images/audio contribute one). Row-amplifying
    * but still a narrow `mapPartitions` flatMap — no shuffle, and the
    * decoder is invoked once per record, not per emitted frame, which
    * is what makes per-partition codec amortization matter here.
    * Resize is aspect-fit into a `box`×`box` square (the usual vision
    * model input prep); with no raster decoder in the container the
    * output is the geometry (out_w, out_h) the resize would produce,
    * from the same dims [[Decoder.decode]] reports. */
  def sampleFrames(media: Dataset[MediaRecord], maxFrames: Int = 4,
      box: Int = 224)(implicit spark: SparkSession): Dataset[FrameFeature] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { r =>
        val f = Decoder.decode(r)
        // clamp ≥1: a video reporting n_frames == 0 (impossible via
        // Decoder.decode today, but an unchecked public-API invariant)
        // must not divide by zero below
        val samples =
          if (r.kind == "video") math.max(1L, math.min(f.n_frames, maxFrames.toLong)).toInt
          else 1
        val step = f.n_frames / samples // even spacing, integer stride
        val scale = math.min(box.toDouble / f.width, box.toDouble / f.height)
        val ow = math.max(1L, math.floor(f.width * scale).toLong)
        val oh = math.max(1L, math.floor(f.height * scale).toLong)
        (0 until samples).iterator.map { i =>
          val pos = i.toLong * step
          FrameFeature(f.doc_id, f.kind, pos,
            (f.checksum * 31L + pos) % 1000000007L, ow, oh)
        }
      }
    }
  }
}
