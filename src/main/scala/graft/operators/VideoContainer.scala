package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/AVI container encode + metadata parse in pure JDK byte work —
  * the video counterpart of [[ImageCodec]]/[[AudioCodec]] to the
  * extent the environment allows: the JDK ships no video CODEC, so
  * frame pixels stay undecodable (the pipeline's documented stub),
  * but the CONTAINER is real. Payloads are spec-conformant AVI files
  * (RIFF 'AVI ' with an 'hdrl' LIST carrying the 56-byte 'avih' main
  * header — Microsoft AVI RIFF form, public spec), and the pipeline
  * reads width/height/frame-count back out of the bytes instead of
  * trusting side metadata. Swapping in a real codec would change only
  * the frame-decode step.
  *
  * All functions are pure and deterministic.
  */
object VideoContainer {

  private val Fps = 30 // fixture frame rate: dwMicroSecPerFrame below

  /** Minimal spec-conformant AVI: RIFF('AVI ') → LIST('hdrl'){avih} →
    * JUNK(payload). The junk chunk carries the caller's opaque bytes so
    * fixture payload content stays deterministic per document; a real
    * recording would carry LIST('movi') frame data there instead.
    */
  def encodeAvi(width: Int, height: Int, nFrames: Int, junk: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 0,
      s"bad AVI dims/frames: ${width}x$height/$nFrames")
    val junkPadded = if (junk.length % 2 == 0) junk else junk :+ 0.toByte
    // sizes: avih chunk = 8 + 56; hdrl LIST = 12 + avih; junk chunk = 8 + len
    val hdrlSize = 4 + 8 + 56
    val riffSize = 4 + (8 + hdrlSize) + (8 + junkPadded.length)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / Fps) // dwMicroSecPerFrame
    buf.putInt(0)             // dwMaxBytesPerSec
    buf.putInt(0)             // dwPaddingGranularity
    buf.putInt(0)             // dwFlags
    buf.putInt(nFrames)       // dwTotalFrames
    buf.putInt(0)             // dwInitialFrames
    buf.putInt(1)             // dwStreams
    buf.putInt(0)             // dwSuggestedBufferSize
    buf.putInt(width)         // dwWidth
    buf.putInt(height)        // dwHeight
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // dwReserved
    fourcc("JUNK"); buf.putInt(junkPadded.length); buf.put(junkPadded)
    buf.array()
  }

  /** Container-level metadata read back from real AVI bytes.
    * `junkOffset` is the byte offset where the payload chunk's data
    * begins, DERIVED from the parsed chunk structure
    * (12 RIFF + 12 LIST/hdrl + 8 avih header + avihSize + 8 chunk
    * header) — 96 for [[encodeAvi]]'s fixed 56-byte avih, but correct
    * for any spec-conformant avihSize >= 56 that [[parseAvi]] accepts.
    */
  final case class AviMeta(
      width: Int, height: Int, nFrames: Int, junkOffset: Int = 96)

  /** Parse the main header of an AVI payload; None for bytes that are
    * not a RIFF 'AVI ' form with a leading 'hdrl'/'avih' (which is how
    * undecodable / truncated / foreign payloads surface, mirroring the
    * image and audio decoders' Option contract).
    */
  def parseAvi(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes.length < 12 + 12 + 8 + 56) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    try {
      if (fourcc() != "RIFF") return None
      val riffSize = buf.getInt
      // long arithmetic: riffSize near Int.MaxValue must not wrap the
      // truncation check into a silent pass
      if (riffSize < 0 || riffSize.toLong + 8 > bytes.length) return None
      if (fourcc() != "AVI ") return None
      if (fourcc() != "LIST") return None
      buf.getInt // hdrl list size
      if (fourcc() != "hdrl") return None
      if (fourcc() != "avih") return None
      val avihSize = buf.getInt
      if (avihSize < 56) return None
      buf.getInt // dwMicroSecPerFrame
      buf.getInt; buf.getInt; buf.getInt
      val nFrames = buf.getInt
      buf.getInt; buf.getInt; buf.getInt
      val w = buf.getInt
      val h = buf.getInt
      if (w <= 0 || h <= 0 || nFrames < 0) None
      else Some(AviMeta(w, h, nFrames,
        junkOffset = 12 + 12 + 8 + avihSize + 8))
    } catch { case _: java.nio.BufferUnderflowException => None }
  }
}
