package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real WAV encode/decode on the JDK's built-in audio stack
  * (`javax.sound.sampled` ships a WAVE reader/writer — zero external
  * dependencies, headless-safe), the audio counterpart of
  * [[ImageCodec]]. This is the genuine decode path for the multimodal
  * pipeline's AUDIO rows; video stays stubbed (the JDK carries no
  * video codec).
  *
  * All functions are pure and deterministic — PCM WAV is lossless, so
  * samples survive an encode/decode round trip bit-exactly (spec'd),
  * and decoded format metadata (sample rate, channels, frame count)
  * is read back from the container, not assumed.
  */
object AudioCodec {

  /** Deterministic 16-bit mono PCM samples for an id: every sample is
    * a pure function of (id, index). Fixture payload generator —
    * stands in for reading real recordings, with real WAV bytes.
    */
  def syntheticPcm(id: Long, nSamples: Int): Array[Short] = {
    val out = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      out(i) = (ImageCodec.mix64(id ^ (i.toLong * 0x9e3779b97f4a7c15L)) & 0xFFFFL).toShort
      i += 1
    }
    out
  }

  /** WAV-encode 16-bit mono little-endian PCM (lossless,
    * deterministic — the WAVE container is a fixed 44-byte header over
    * the raw samples).
    */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream(bytes.length + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded PCM audio: container-reported format plus the samples. */
  final case class DecodedAudio(
      sampleRate: Int, channels: Int, nFrames: Long, samples: Array[Short]) {
    def durationSec: Double =
      if (sampleRate <= 0) 0.0 else nFrames.toDouble / sampleRate
  }

  /** Decode a 16-bit PCM WAV payload; None for bytes the installed
    * readers reject (or non-16-bit encodings this pipeline never
    * writes).
    */
  def decode(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = (((data(2 * i + 1) & 0xFF) << 8) | (data(2 * i) & 0xFF)).toShort
          i += 1
        }
        Some(DecodedAudio(
          fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength, samples))
      }
    } catch { case _: Exception => None }

  /** Root-mean-square amplitude of normalized ([-1, 1)) samples — the
    * standard loudness feature. The squares are accumulated as exact
    * integers (Σs² fits a Long: ≤ n·2³⁰), so the sum is independent of
    * sample visit order — the parallel-safe formulation — and
    * √(Σs² / (n·2³⁰)) is one exact division plus one IEEE sqrt,
    * bit-stable across engines (the DuckDB oracle recomputes it from
    * regenerated samples). Mathematically identical to the textbook
    * √(Σ(s/32768)²/n).
    */
  def rms(samples: Array[Short]): Double = {
    if (samples.isEmpty) return 0.0
    var sumSq = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      sumSq += s * s
      i += 1
    }
    math.sqrt(sumSq.toDouble / (samples.length.toLong * 1073741824L).toDouble)
  }
}
