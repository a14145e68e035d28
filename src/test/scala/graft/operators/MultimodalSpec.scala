package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{Decoder, MediaRecord}
import graft.queries.Registry

class MultimodalSpec extends graft.SparkSpec {

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG bytes decode to their true dimensions") {
    val bytes = pngBytes(37, 21)
    assert(Decoder.imageDims(bytes).contains((37, 21)))
    val f = Decoder.decode(MediaRecord(1L, bytes, "image", "test"))
    assert(f.width == 37 && f.height == 21)
    assert(f.byte_len == bytes.length)
  }

  test("jpeg decodes too; non-image bytes fall back to pseudo-dims") {
    val img = new BufferedImage(8, 5, BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    assert(Decoder.imageDims(out.toByteArray).contains((8, 5)))

    val junk = "not an image at all".getBytes("UTF-8")
    assert(Decoder.imageDims(junk).isEmpty)
    val f = Decoder.decode(MediaRecord(2L, junk, "image", "test"))
    assert(f.width == junk.length % 640 + 1 && f.height == junk.length % 480 + 1)
  }

  test("audio/video kinds keep the checksum/pseudo-feature path") {
    val bytes = "audio payload".getBytes("UTF-8")
    val f = Decoder.decode(MediaRecord(3L, bytes, "video", "test"))
    assert(f.n_frames == bytes.length % 30 + 1)
    assert(f.checksum > 0)
  }

  test("frame sampling: videos explode to ≤4 evenly spaced frames, others to 1") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val media = Seq(
      MediaRecord(0L, Array.fill[Byte](9)(1), "video", "t"),   // n_frames = 9%30+1 = 10 → 4 samples, step 2
      MediaRecord(1L, Array.fill[Byte](2)(1), "video", "t"),   // n_frames = 3 → 3 samples, step 1
      MediaRecord(2L, Array.fill[Byte](50)(1), "image", "t"),  // 1 frame
      MediaRecord(3L, Array.fill[Byte](7)(1), "audio", "t")    // 1 frame
    ).toDS()
    val frames = Multimodal.sampleFrames(media).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(0L).map(_.frame_pos).sorted.toSeq == Seq(0L, 2L, 4L, 6L))
    assert(byDoc(1L).map(_.frame_pos).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(byDoc(2L).map(_.frame_pos).toSeq == Seq(0L))
    assert(byDoc(3L).map(_.frame_pos).toSeq == Seq(0L))
    // aspect-fit into 224: pseudo dims (len%640+1, len%480+1); doc 2 has
    // dims (51, 51) → square scales to (224, 224)
    assert(byDoc(2L).head.out_w == 224L && byDoc(2L).head.out_h == 224L)
    // frame hash varies with position
    assert(byDoc(0L).map(_.frame_hash).distinct.length == 4)
  }

  test("perceptual hash: identical payloads collide, near-identical usually do, " +
      "perceptual redundancy >= exact (m05 vs m04)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val base = Array.tabulate[Byte](200)(i => ((i * 37 + 11) % 251).toByte)
    val nearDup = base.clone(); nearDup(100) = (nearDup(100) ^ 0x7).toByte
    val media = Seq(
      MediaRecord(0L, base, "image", "t"),
      MediaRecord(1L, base.clone(), "image", "t"),   // exact dup
      MediaRecord(2L, nearDup, "image", "t")         // 1-byte edit
    ).toDS()
    val ph = Multimodal.perceptualHash(media).collect()
      .map(p => p.doc_id -> p.phash).toMap
    assert(ph(0L) == ph(1L), "identical bytes must share the phash")
    // a 1-byte edit changes only 4 of 197 grams — bits whose vote
    // isn't knife-edge can't flip, so the codes stay within a couple
    // of bits (this synthetic payload is near-uniform, the worst case
    // for vote margins; exact equality holds on skewed real text)
    assert(java.lang.Long.bitCount(ph(0L) ^ ph(2L)) <= 2,
      s"1-byte edit moved the phash ${java.lang.Long.bitCount(ph(0L) ^ ph(2L))} bits")
    // registry-level: every kind's perceptual redundancy >= exact
    val exact = Registry.queries("m04_media_dedup")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val perc = Registry.queries("m05_media_phash_dedup")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (kind, nRed) =>
      assert(perc(kind) >= nRed,
        s"$kind: perceptual dedup can only find MORE redundancy than exact")
    }
  }

  test("video signature survives a re-encode the exact checksum can't (m06)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    // 320 bytes → n_frames = 320%30+1 = 21, 4 sampled frames at pos
    // 0/5/10/15, span 320/21 = 15 bytes → sampled byte ranges
    // [0,15) [75,90) [150,165) [225,240). The "re-encode" flips byte
    // 50 — OUTSIDE every sampled span — so the signature is equal BY
    // CONSTRUCTION while the whole-payload checksum must differ.
    val base = Array.tabulate[Byte](320)(i => ((i * 37 + 11) % 251).toByte)
    val reenc = base.clone(); reenc(50) = (reenc(50) ^ 0x55).toByte
    val other = Array.tabulate[Byte](320)(i => ((i * 53 + 7) % 241).toByte)
    val media = Seq(
      MediaRecord(0L, base, "video", "t"),
      MediaRecord(1L, reenc, "video", "t"),
      MediaRecord(2L, other, "video", "t")).toDS()
    val sig = Multimodal.videoSignatures(media).collect()
      .map(v => v.doc_id -> v.sig).toMap
    val sums = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.checksum).toMap
    assert(sums(0L) != sums(1L), "the re-encode must change the checksum")
    assert(sig(0L) == sig(1L),
      "the re-encode must keep the perceptual video signature")
    assert(sig(0L) != sig(2L), "unrelated videos must not collide")
    // and the m06 rollup is oracle-green at the gate, so the Spark
    // arithmetic above is also what DuckDB replays byte-for-byte
    val roll = Registry.queries("m06_video_neardup")(spark, sf0001).collect()
    assert(roll.length == 1 && roll.head.getLong(0) >= roll.head.getLong(1),
      "n_videos >= n_distinct")
  }
}
