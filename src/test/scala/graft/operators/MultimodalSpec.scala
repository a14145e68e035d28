package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{Decoder, MediaRecord}

class MultimodalSpec extends AnyFunSuite {

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
}
