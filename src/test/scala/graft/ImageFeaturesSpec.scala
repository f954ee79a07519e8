package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.etl.{ImageFeatures, Multimodal}

/** X11 real tier: pixel-statistics features + routing classifier over
  * ImageIO-rendered fixtures whose ground-truth category is known by
  * construction (flat logo, noise photo, text-like stripes, spacer).
  */
class ImageFeaturesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def encode(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Solid single-color block — a logo/flat-graphic stand-in. */
  private def flat(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    encode(img)
  }

  /** Deterministic colorful high-frequency noise — a photo stand-in
    * (no dominant color, colorful, moderate-to-high luma variation).
    */
  private def noise(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var seed = 12345L
    for (y <- 0 until h; x <- 0 until w) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      img.setRGB(x, y, ((seed >>> 16) & 0xffffff).toInt)
    }
    encode(img)
  }

  /** 1px black/white vertical stripes — rendered-text stand-in: zero
    * colorfulness, maximal luma edges.
    */
  private def stripes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x % 2 == 0) 0x000000 else 0xffffff)
    encode(img)
  }

  test("X11: categories match construction — graphic/photo/text/decorative") {
    val logo = ImageFeatures.analyze(flat(200, 200, 0x3366cc))
    assert(logo.ok && logo.category == "graphic")
    assert(logo.dominantBp == 10000 && logo.edgeDensityBp == 0)

    val photo = ImageFeatures.analyze(noise(200, 200))
    assert(photo.ok && photo.category == "photo")
    assert(photo.dominantBp < 2500 && photo.colorfulness >= 24)

    val text = ImageFeatures.analyze(stripes(200, 200))
    assert(text.ok && text.category == "text")
    assert(text.colorfulness == 0 && text.edgeDensityBp > 1500)

    // the reference's decorative gate: <50px or extreme aspect
    // (DESIGN.md:1210-1214, config/limits.yaml:74-75)
    assert(ImageFeatures.analyze(flat(16, 16, 0xffffff)).category == "decorative")
    assert(ImageFeatures.analyze(noise(1200, 60)).category == "decorative")
  }

  test("X11: sampling grid bounds cost — big image ≈ small image features") {
    // identical content at 80px and 800px must land in the same category
    // (the 64×64 grid normalizes cost; the local-gradient edge metric is
    // what keeps periodic 1px content stride-alias-proof — point-sampled
    // statistics like mean luma legitimately alias on such patterns)
    val smallT = ImageFeatures.analyze(stripes(80, 80))
    val bigT = ImageFeatures.analyze(stripes(800, 800))
    assert(smallT.category == "text" && bigT.category == "text")
    // on aperiodic content the sampled statistics ARE scale-stable
    val smallN = ImageFeatures.analyze(noise(80, 80))
    val bigN = ImageFeatures.analyze(noise(800, 800))
    assert(smallN.category == "photo" && bigN.category == "photo")
    assert(math.abs(smallN.meanLuma - bigN.meanLuma) <= 16)
    assert(math.abs(smallN.colorfulness - bigN.colorfulness) <= 16)
  }

  test("X11: robustness — garbage fails soft, never throws") {
    assert(!ImageFeatures.analyze("not an image".getBytes("UTF-8")).ok)
    assert(!ImageFeatures.analyze(Array.empty[Byte]).ok)
    assert(!ImageFeatures.analyze(null).ok)
    assert(ImageFeatures.analyze(null).category == "undecodable")
  }

  test("X11: distributed dispatch — features route assets by category") {
    val assets = Seq(
      ("logo", flat(128, 128, 0xcc3333)),
      ("photo", noise(128, 128)),
      ("shot", stripes(128, 128)),
      ("spacer", flat(400, 8, 0xffffff))).toDF("name", "payload")
    val routed = Multimodal.withImageFeatures(assets, col("payload"))
      .select("name", "img_ok", "img_category")
      .as[(String, Boolean, String)].collect()
      .map { case (k, ok, cat) => k -> ((ok, cat)) }.toMap
    assert(routed("logo") == ((true, "graphic")))
    assert(routed("photo") == ((true, "photo")))
    assert(routed("shot") == ((true, "text")))
    assert(routed("spacer") == ((true, "decorative")))
  }
}
