package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image encode/decode on the JDK's built-in codecs
  * (`javax.imageio` ships PNG/BMP/GIF/JPEG writers — zero external
  * dependencies, headless-safe). This is the genuine decode path for
  * the multimodal pipeline's IMAGE rows; audio/video stay stubbed
  * (the JDK carries no such codecs).
  *
  * All functions are pure and deterministic — the pipeline's
  * determinism spec rides on PNG being a lossless format: pixels
  * survive an encode/decode round trip bit-exactly.
  */
object ImageCodec {

  // per-call disk-cache temp files (ImageIO's default) would mean
  // filesystem churn per ROW in the executor hot path; payloads are
  // kilobytes, the in-memory cache suffices
  ImageIO.setUseCache(false)

  @inline private[operators] def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^= (x >>> 31)
    x
  }

  /** Deterministic RGB test image for an id: every pixel's color is a
    * pure function of (id, x, y). Fixture payload generator — stands
    * in for reading real image files, with real bytes.
    */
  def syntheticImage(id: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = mix64(id ^ (x * 0x9e3779b97f4a7c15L) ^ (y * 0xc2b2ae3d27d4eb4fL))
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** PNG-encode (lossless, deterministic). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream(img.getWidth * img.getHeight + 256)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG); None for
    * bytes no installed reader accepts — including truncated or
    * bit-flipped payloads, where ImageIO throws rather than returning
    * null (a corrupt row must never kill a featurize job; fuzz-pinned
    * in MediaFuzzSpec).
    */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** (width, height, mean luminance in [0,255], distinct-color ratio) —
    * the per-image features, computed from REAL decoded pixels.
    * Luminance = Rec.601 luma of each pixel, accumulated as the exact
    * integer 299·R + 587·G + 114·B (milli-luma): the sum is then
    * independent of pixel visit order — the parallel-safe formulation —
    * and the mean is a single IEEE division of exact operands, so the
    * value is bit-stable across engines (the DuckDB oracle recomputes
    * it from regenerated pixels).
    */
  def pixelFeatures(img: BufferedImage): (Int, Int, Double, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    var lumaMilliSum = 0L
    val seen = new java.util.HashSet[Integer]()
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        lumaMilliSum += 299L * r + 587L * g + 114L * b
        seen.add(rgb & 0xffffff)
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (w, h, if (n == 0) 0.0 else lumaMilliSum.toDouble / (n * 1000L).toDouble,
      if (n == 0) 0.0 else seen.size.toDouble / n.toDouble)
  }

  /** Real resize: decode → area-scale via Graphics2D (bilinear) →
    * PNG re-encode. Deterministic (software rasterizer, fixed hints).
    */
  def resizePng(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    decode(bytes).map { src =>
      val dst = new BufferedImage(newW, newH, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, newW, newH, null)
      } finally g.dispose()
      encodePng(dst)
    }
}
