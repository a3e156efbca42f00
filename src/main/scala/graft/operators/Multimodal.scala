package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * IMAGE rows are REAL: payloads are PNG bytes (encoded, decoded, and
  * resized with the JDK's `javax.imageio` — see [[ImageCodec]]), and
  * image features come from actual decoded pixels. AUDIO rows are
  * REAL too: payloads are 16-bit PCM WAV (`javax.sound.sampled` —
  * see [[AudioCodec]]), and audio features (sample rate, duration,
  * RMS) come from an actual container decode. VIDEO rows carry a real
  * RIFF/AVI container ([[VideoContainer]]) whose header metadata
  * (dimensions, frame count) is parsed back out of the payload bytes;
  * only the frame-pixel DECODE remains stubbed (the JDK ships no
  * video codec), with the schema contract, the `mapPartitions` batch
  * shape (one partition = one decoder instantiation, the Spark-side
  * analogue of a Pandas-UDF batch), and the partitioning identical to
  * what a real codec would use — so swapping one in changes one
  * function.
  *
  * Scale: decode is per-row map work; `repartition` before decode
  * controls batch size / executor memory; features are tiny relative
  * to payloads so any shuffle after extraction carries features only.
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  private val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", MetaType)))

  // one mixer for fixture ids and pixels: syntheticMedia's media-type
  // and dimension derivations must stay bit-identical to the codec's
  @inline private def mix64(x: Long): Long = ImageCodec.mix64(x)

  /** Sample rates the synthetic audio fixtures draw from. */
  val AudioRates: Array[Int] = Array(8000, 11025, 16000, 22050)

  /** Wrap a corpus into the multimodal contract:
    * (id, content binary, meta struct). IMAGE rows carry REAL PNG
    * payloads (deterministic pixels from the id, ImageIO-encoded);
    * AUDIO rows carry REAL 16-bit PCM WAV payloads (deterministic
    * samples from the id, `javax.sound.sampled`-encoded) with meta =
    * (sample rate, channels, PCM frame count); VIDEO rows carry a real
    * RIFF/AVI container (deterministic dims/frames from the id, the
    * text fixture riding the JUNK chunk) — the frame pixels are the
    * codec-less stand-in. Runs via mapPartitions — the same batch
    * shape the decoder uses.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    docs.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mediaType = (Math.floorMod(mix64(id), 3L): @unchecked) match {
            case 0L => "image"
            case 1L => "audio"
            case 2L => "video"
          }
          mediaType match {
            case "image" =>
              // small real images: fixture payloads stay kilobytes
              val w = Math.floorMod(mix64(id ^ 1L), 64L).toInt + 1
              val h = Math.floorMod(mix64(id ^ 2L), 48L).toInt + 1
              val png = ImageCodec.encodePng(ImageCodec.syntheticImage(id, w, h))
              Row(id, png, Row("image", w, h, 1))
            case "audio" =>
              // small real clips: up to ~2100 samples, kilobyte WAVs;
              // meta carries (sample rate, channels, frame count) in
              // the (width, height, n_frames) slots
              val rate = AudioRates(Math.floorMod(mix64(id ^ 1L), 4L).toInt)
              val n = Math.floorMod(mix64(id ^ 3L), 2000L).toInt + 100
              val wav = AudioCodec.encodeWav(AudioCodec.syntheticPcm(id, n), rate)
              Row(id, wav, Row("audio", rate, 1, n))
            case _ =>
              // REAL RIFF/AVI container (frame pixels stay codec-less —
              // the documented stub); the text fixture rides the JUNK
              // chunk so payload content is deterministic per doc
              val w = Math.floorMod(mix64(id ^ 1L), 1920L).toInt + 1
              val h = Math.floorMod(mix64(id ^ 2L), 1080L).toInt + 1
              val frames = Math.floorMod(mix64(id ^ 3L), 300L).toInt + 1
              val avi = VideoContainer.encodeAvi(w, h, frames,
                r.getString(1).getBytes("UTF-8"))
              Row(id, avi, Row(mediaType, w, h, frames))
          }
        }
      }(enc)
  }

  /** Output schema of the decode+feature step. Image rows populate the
    * pixel-derived columns from a REAL decode; audio rows populate the
    * audio columns from a REAL container decode; video rows populate
    * img_width/img_height from a REAL container-header parse but keep
    * decoded_ok = false (no frame decode without a codec) and -1/0
    * elsewhere.
    */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("byte_entropy_proxy", DoubleType),
    StructField("decoded_ok", BooleanType),
    StructField("img_width", IntegerType),
    StructField("img_height", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("distinct_color_ratio", DoubleType),
    StructField("audio_sample_rate", IntegerType),
    StructField("audio_duration_sec", DoubleType),
    StructField("audio_rms", DoubleType),
    StructField("sampled_frames", ArrayType(IntegerType))))

  /** Decode + featurize. Image rows: REAL ImageIO decode, features
    * from pixels (dimensions, Rec.601 mean luma, distinct-color
    * ratio). Audio rows: REAL WAV decode, features from the container
    * and samples (sample rate, duration, RMS). Video: stub features
    * from raw bytes. Frame sampling picks every `sampleEvery`-th frame
    * index from metadata. Runs via mapPartitions so decoder/codec
    * state amortizes per partition.
    */
  def decodeAndFeaturize(media: DataFrame, sampleEvery: Int = 30): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(FeatureSchema))
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id    = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val meta  = r.getStruct(2)
          val mediaType = meta.getString(0)
          val nFrames   = meta.getInt(3)
          var sum = 0L
          val distinct = new Array[Boolean](256)
          var nDistinct = 0
          bytes.foreach { b =>
            val u = b & 0xff
            sum += u
            if (!distinct(u)) { distinct(u) = true; nDistinct += 1 }
          }
          val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
          val frames = (0 until nFrames by sampleEvery).toArray
          var (ok, w, h, luma, colorRatio) = (false, -1, -1, 0.0, 0.0)
          var (aRate, aDur, aRms) = (-1, 0.0, 0.0)
          // decode-derived features are emitted at FULL precision: the
          // codecs compute them as single IEEE operations over exact
          // integer accumulators, so the raw doubles are bit-stable
          // across engines — a ×10000 rint here would only reintroduce
          // tie-rounding divergence risk against the DuckDB oracle
          if (mediaType == "image")
            ImageCodec.decode(bytes).foreach { img =>
              val (dw, dh, ml, dc) = ImageCodec.pixelFeatures(img)
              ok = true; w = dw; h = dh
              luma = ml
              colorRatio = dc
            }
          else if (mediaType == "audio")
            AudioCodec.decode(bytes).foreach { a =>
              ok = true
              aRate = a.sampleRate
              aDur = a.durationSec
              aRms = AudioCodec.rms(a.samples)
            }
          else
            // video: REAL container-header parse (dims read back from
            // the payload bytes); decoded_ok stays false — there is no
            // frame decode without a codec
            VideoContainer.parseAvi(bytes).foreach { m =>
              w = m.width
              h = m.height
            }
          Row(id, mediaType, bytes.length.toLong,
            math.rint(mean * 10000) / 10000,
            math.rint(nDistinct.toDouble / 256 * 10000) / 10000,
            ok, w, h, luma, colorRatio, aRate, aDur, aRms, frames)
        }
      }(enc)
  }

  /** End-to-end: wrap + decode, the full multimodal feature pipeline. */
  def featurePipeline(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    decodeAndFeaturize(syntheticMedia(docs, idCol, textCol))

  /** Resize. Image rows: REAL decode → bilinear scale → PNG re-encode
    * ([[ImageCodec.resizePng]]). Audio rows: spatial resize is
    * undefined for audio — identity (payload and meta unchanged), so a
    * mixed-media resize pass stays type-correct. Video rows: stub —
    * payload truncated to the area-scaled length (byte count tracks
    * pixel count), as a stand-in for a codec transcode, metadata
    * rewritten to the new dimensions.
    */
  def resize(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    require(newW > 0 && newH > 0, s"bad resize target: ${newW}x$newH")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(MediaSchema))
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id    = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val meta  = r.getStruct(2)
          val mediaType = meta.getString(0)
          val (out, outW, outH) =
            if (mediaType == "image")
              ImageCodec.resizePng(bytes, newW, newH) match {
                case Some(b) => (b, newW, newH)
                // undecodable payload: keep ORIGINAL bytes and meta
                // dims — claiming the new size would contradict the
                // payload for downstream decoders
                case None => (bytes, meta.getInt(1), meta.getInt(2))
              }
            else if (mediaType == "audio")
              (bytes, meta.getInt(1), meta.getInt(2)) // identity
            else {
              // stub transcode over a REAL container: re-encode the AVI
              // header at the new dimensions and area-scale the junk
              // payload (byte count tracks pixel count, as a transcode's
              // would); payloads that don't parse keep original bytes
              // and meta dims, mirroring the image branch's contract
              VideoContainer.parseAvi(bytes) match {
                case Some(m) =>
                  // payload offset comes from the parsed chunk
                  // structure, not encodeAvi's fixed layout — parseAvi
                  // accepts any avihSize >= 56
                  val junkLen = math.max(0, bytes.length - m.junkOffset).toLong
                  val area = m.width.toLong * m.height
                  // BigInt product: junkLen * newW * newH can overflow
                  // Long at extreme target dims, turning `scaled`
                  // negative and the allocation into a throw
                  val scaled = if (area <= 0) 0L
                    else (BigInt(junkLen) * newW * newH / area)
                      .min(BigInt(junkLen)).toLong
                  (VideoContainer.encodeAvi(newW, newH, m.nFrames,
                    new Array[Byte](scaled.toInt)), newW, newH)
                case None => (bytes, meta.getInt(1), meta.getInt(2))
              }
            }
          Row(id, out, Row(mediaType, outW, outH, meta.getInt(3)))
        }
      }(enc)
  }

  /** Frame sampling as a first-class relation: one row per sampled
    * frame index, (media_id, frame_idx, n_frames) — the fan-out shape
    * a video pipeline feeds to per-frame feature extraction. The
    * explode multiplies rows but carries no payload; the frame decode
    * join happens downstream on (media_id, frame_idx).
    */
  def sampleFrames(media: DataFrame, every: Int = 30): DataFrame =
    media.select(
      col("media_id"),
      col("meta.n_frames").as("n_frames"),
      explode(sequence(lit(0), col("meta.n_frames") - 1,
        lit(every))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"), col("n_frames"))
}
