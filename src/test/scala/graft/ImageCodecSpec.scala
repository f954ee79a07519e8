package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.etl.{BinaryTransport, ImageCodec, Multimodal, Sources}

/** X12 end-to-end: real fixture images (ImageIO-rendered in-test) →
  * fetchBinary → magic-byte route → compress → verified output JPEGs.
  */
class ImageCodecSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Deterministic RGB gradient PNG (compressible, decodable). */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("X12: wide image shrinks to maxWidth, small converts, garbage fails soft") {
    val wide = ImageCodec.compress(png(2000, 1000), maxWidth = 1280)
    assert(wide.ok && wide.origW == 2000 && wide.origH == 1000)
    assert(wide.outW == 1280 && wide.outH == 640) // aspect preserved
    // the output is a real JPEG at the target dims
    val back = ImageIO.read(new java.io.ByteArrayInputStream(wide.jpeg))
    assert(back.getWidth == 1280 && back.getHeight == 640)
    assert((wide.jpeg(0) & 0xFF) == 0xFF && (wide.jpeg(1) & 0xFF) == 0xD8)
    // small images only convert — never enlarged (withoutEnlargement)
    val small = ImageCodec.compress(png(100, 50), maxWidth = 1280)
    assert(small.ok && small.outW == 100 && small.outH == 50)
    // robustness: garbage/empty bytes fail soft, never throw
    assert(!ImageCodec.compress("not an image".getBytes("UTF-8")).ok)
    assert(!ImageCodec.compress(Array.empty[Byte]).ok)
    assert(!ImageCodec.compress(null).ok)
    val truncated = java.util.Arrays.copyOf(png(64, 64), 40)
    assert(!ImageCodec.compress(truncated).ok)
  }

  test("X12: fetch → magic-byte route → compress runs distributed over assets") {
    val bigPng = png(1600, 800)
    val smallPng = png(64, 64)
    object T extends BinaryTransport {
      override def fetch(url: String): (String, Array[Byte]) =
        if (url.endsWith("big.png")) ("ok", bigPng)
        else if (url.endsWith("small.png")) ("ok", smallPng)
        else ("ok", Array[Byte](1, 2, 3))
    }
    val assets = Sources.fetchBinary(
      Seq("https://a.com/big.png", "https://a.com/small.png",
        "https://a.com/junk.bin").toDF("url"), T)
      .withColumn("kind", Multimodal.mediaKind(col("payload")))
    val images = Multimodal.withCompressedImage(
      assets.filter(col("kind").isin("jpeg", "png", "gif")), col("payload"))
    val got = images
      .select("url", "img_ok", "orig_w", "out_w", "out_h", "out_bytes")
      .as[(String, Boolean, Int, Int, Int, Int)].collect()
      .map(r => r._1.split('/').last -> r).toMap
    assert(got.keySet == Set("big.png", "small.png")) // junk routed away
    val big = got("big.png")
    assert(big._2 && big._3 == 1600 && big._4 == 1280 && big._5 == 640)
    assert(big._6 > 0)
    val small = got("small.png")
    assert(small._2 && small._4 == 64 && small._5 == 64)
  }
}
