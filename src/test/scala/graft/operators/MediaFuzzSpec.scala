package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-payload robustness for the media decoders: at corpus scale
  * a scraped binary column WILL contain truncated and bit-flipped
  * payloads, and one throwing row must not kill a whole featurize
  * job — every decoder's contract is Option (None for junk), never an
  * exception. Deterministic RNG so failures reproduce.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def realPng: Array[Byte] = ImageCodec.encodePng(
    ImageCodec.syntheticImage(id = 7L, w = 24, h = 16))
  private def realWav: Array[Byte] = AudioCodec.encodeWav(
    AudioCodec.syntheticPcm(id = 7L, nSamples = 800), sampleRate = 8000)
  private def realAvi: Array[Byte] = VideoContainer.encodeAvi(
    width = 32, height = 24, nFrames = 10, junk = Array.fill(64)(1.toByte))

  private def mutants(payload: Array[Byte], rng: scala.util.Random): Seq[Array[Byte]] = {
    val truncs = Seq(0, 1, 3, 7, 11, 12, 19, 43, payload.length / 2,
      payload.length - 1).filter(_ <= payload.length).map(payload.take)
    val flips = (1 to 40).map { _ =>
      val b = payload.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      b
    }
    val garbage = (1 to 40).map { _ =>
      val b = new Array[Byte](rng.nextInt(2048))
      rng.nextBytes(b); b
    }
    truncs ++ flips ++ garbage :+ Array.emptyByteArray
  }

  private def neverThrows[A](name: String, decode: Array[Byte] => Option[A],
      payload: Array[Byte]): Unit = {
    val rng = new scala.util.Random(42)
    mutants(payload, rng).zipWithIndex.foreach { case (m, i) =>
      try decode(m)
      catch {
        case e: Throwable =>
          fail(s"$name threw on mutant #$i (len=${m.length}): $e")
      }
    }
  }

  test("PNG decode never throws on truncated/flipped/garbage payloads") {
    neverThrows("ImageCodec.decode", ImageCodec.decode, realPng)
  }

  test("WAV decode never throws on truncated/flipped/garbage payloads") {
    neverThrows("AudioCodec.decode", AudioCodec.decode, realWav)
  }

  test("AVI parse never throws on truncated/flipped/garbage payloads") {
    neverThrows("VideoContainer.parseAvi", VideoContainer.parseAvi, realAvi)
  }

  test("intact payloads still decode after the fuzz contract holds") {
    assert(ImageCodec.decode(realPng).isDefined)
    assert(AudioCodec.decode(realWav).isDefined)
    assert(VideoContainer.parseAvi(realAvi).isDefined)
  }
}
