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
  * decoder can amortize model/codec setup per batch). The decode itself
  * is a STUB: this container has no image/audio codecs, so
  * [[FakeDecoder.decode]] derives deterministic pseudo-features from
  * the bytes. Swapping in a real codec changes only that function.
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

  /** STUB decoder — deterministic pseudo-decode standing in for a real
    * image/audio library (not available in this container). */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val len = r.media.length.toLong
      // rolling hash of payload bytes (checksum feature)
      var h = 0L
      var i = 0
      while (i < r.media.length) { h = (h * 31 + (r.media(i) & 0xff)) % 1000000007L; i += 1 }
      MediaFeatures(r.doc_id, r.kind, len,
        width = len % 640 + 1, height = len % 480 + 1,
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
      batch.map(FakeDecoder.decode)
    }
  }
}
