package graft.etl

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Real pixel-statistics feature extraction for the X11 image-analyzer
  * contract — the measurable half of the reference's image pipeline
  * (agents/image-analyzer.md:99-132 routes images into a type taxonomy
  * before describing them; DESIGN.md:1146-1253 wires the result into
  * page markdown). The reference assigns its taxonomy with a vision
  * model; that free-text description step stays a declared enrichment
  * contract. What IS computable without a model — and is what a corpus
  * pipeline filters and routes on — is extracted here for real:
  *
  *  - dimensions and aspect ratio (the decorative-image gate: the
  *    reference drops icons/banners before describing —
  *    DESIGN.md:1210-1214 min 50×50, config/limits.yaml:74-75),
  *  - mean luminance (0-255),
  *  - colorfulness (mean |R-G| + |G-B| over sampled pixels — a grayscale
  *    diagram scores ~0, a photo scores high),
  *  - edge density (basis points of sampled neighbor pairs whose luma
  *    step exceeds a threshold — flat art is low, text/screenshots are
  *    high, photos are in between),
  *  - dominant-color fraction (basis points of samples hitting the modal
  *    quantized color — logos/flat graphics concentrate, photos spread).
  *
  * A coarse routing category falls out of those statistics alone:
  * `decorative` (tiny or extreme-aspect — spacers, rules, banners),
  * `graphic` (flat, dominant-color-heavy art: logos, diagrams),
  * `text` (high edge density at low colorfulness: screenshots, tables,
  * rendered text), `photo` (colorful, moderate edges, no dominant
  * color). This is the dispatch tier that decides which assets are
  * WORTH a vision-model call at 100 TB — the expensive description runs
  * on the `photo`/`text` survivors, not on a million spacer GIFs.
  *
  * Decode cost is bounded regardless of image size: statistics are
  * computed on a ≤64×64 sampling grid (stride = dim/64), so a 10000²
  * photo costs the same as a thumbnail. Same robustness contract as
  * [[ImageCodec]]/[[PdfText]]: undecodable bytes yield ok=false, never
  * a thrown task failure.
  */
object ImageFeatures extends Serializable {

  final case class Features(ok: Boolean, w: Int, h: Int, meanLuma: Int,
      colorfulness: Int, edgeDensityBp: Int, dominantBp: Int, category: String)

  private def failed: Features =
    Features(ok = false, 0, 0, 0, 0, 0, 0, "undecodable")

  /** Luma per ITU-R 601 integer approximation: (77R + 150G + 29B) >> 8. */
  private def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (77 * r + 150 * g + 29 * b) >> 8
  }

  def analyze(bytes: Array[Byte]): Features = {
    try {
      if (bytes == null || bytes.length == 0) return failed
      System.setProperty("java.awt.headless", "true")
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return failed
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) return failed

      val sx = math.max(1, w / 64); val sy = math.max(1, h / 64)
      var n = 0; var lumaSum = 0L; var colorSum = 0L
      var edges = 0; var pairs = 0
      val colorCounts = new java.util.HashMap[Integer, Integer]()
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val l = luma(rgb)
          n += 1; lumaSum += l
          colorSum += math.abs(r - g) + math.abs(g - b)
          // 4-bit/channel quantization for the dominant-color histogram
          val q = ((r >> 4) << 8) | ((g >> 4) << 4) | (b >> 4)
          colorCounts.merge(q, 1, (a: Integer, c: Integer) => a + c)
          // edge metric = TRUE local gradient (grid pixel vs its actual
          // x-neighbor), not grid-sample deltas: comparing consecutive
          // grid samples stride-aliases on periodic content (an even
          // stride over 1px stripes reads one phase only and reports a
          // solid block), and under-reports high-frequency detail on
          // real images whenever the stride exceeds the stroke width.
          if (x + 1 < w) {
            pairs += 1
            if (math.abs(luma(img.getRGB(x + 1, y)) - l) > 24) edges += 1
          }
          x += sx
        }
        y += sy
      }
      if (n == 0) return failed
      val meanLuma = (lumaSum / n).toInt
      val colorfulness = (colorSum / n).toInt
      val edgeBp = if (pairs == 0) 0 else edges * 10000 / pairs
      var maxCount = 0
      val it = colorCounts.values().iterator()
      while (it.hasNext) maxCount = math.max(maxCount, it.next())
      val domBp = maxCount * 10000 / n

      // Routing rules; thresholds are structural, not corpus-fit:
      // the reference's own decorative gate is the 50 px minimum
      // (DESIGN.md:1210-1214); 8:1 aspect catches rules/banners.
      val aspect = math.max(w, h).toDouble / math.max(1, math.min(w, h))
      // `text` is tested BEFORE the dominant-color rule: rendered text /
      // screenshots are background-dominated (white usually exceeds half
      // the samples), so dominant-first would eat them into `graphic`.
      val category =
        if (w < 50 || h < 50 || aspect > 8.0) "decorative"
        else if (colorfulness < 24 && edgeBp >= 1500) "text" // gray + busy
        else if (domBp >= 5000) "graphic"          // one color ≥ half the pixels
        else if (colorfulness >= 24 && domBp < 2500) "photo"
        else "graphic"
      Features(ok = true, w, h, meanLuma, colorfulness, edgeBp, domBp, category)
    } catch { case _: Exception => failed }
  }
}
