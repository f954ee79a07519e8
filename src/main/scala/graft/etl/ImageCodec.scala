package graft.etl

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Real image compression codec — the X12 contract made executable
  * (reference semantics: scripts/compress-image.mjs:49-97 — images
  * wider than maxWidth resize to it aspect-preserving and re-encode
  * as JPEG quality 85; narrower images just convert at quality 90).
  * Pure JDK (`javax.imageio` + headless Graphics2D): decodes PNG /
  * JPEG / GIF / BMP, renders onto an RGB canvas (JPEG has no alpha;
  * transparency flattens to white, matching sharp's default), bilinear
  * resize, explicit-quality JPEG encode.
  *
  * Robustness contract mirrors [[PdfText]]: undecodable or truncated
  * bytes yield ok=false with the original byte count — never a thrown
  * task failure, because one bad asset must not kill a 100 TB stage.
  */
object ImageCodec extends Serializable {

  final case class Compressed(ok: Boolean, origW: Int, origH: Int,
      outW: Int, outH: Int, origBytes: Int, outBytes: Int, jpeg: Array[Byte])

  private def failed(nBytes: Int): Compressed =
    Compressed(ok = false, 0, 0, 0, 0, nBytes, 0, Array.empty[Byte])

  def compress(bytes: Array[Byte], maxWidth: Int = 1280): Compressed = {
    try {
      if (bytes == null || bytes.length == 0) return failed(0)
      System.setProperty("java.awt.headless", "true")
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return failed(bytes.length)
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) return failed(bytes.length)
      // reference rule: only shrink (fit inside, withoutEnlargement),
      // quality 85 when resizing, 90 for a pure format conversion
      val (tw, th, quality) =
        if (w > maxWidth)
          (maxWidth, math.max(1, math.round(h.toDouble * maxWidth / w).toInt), 0.85f)
        else (w, h, 0.90f)
      val canvas = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
      val g = canvas.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, java.awt.Color.WHITE, null)
      } finally g.dispose()
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream(bytes.length)
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new IIOImage(canvas, null, null), param)
      } finally { writer.dispose(); ios.close() }
      Compressed(ok = true, w, h, tw, th, bytes.length, bos.size(), bos.toByteArray)
    } catch { case _: Exception => failed(if (bytes == null) 0 else bytes.length) }
  }
}
