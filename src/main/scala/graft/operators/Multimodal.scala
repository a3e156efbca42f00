package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The actual media decoding is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic fake pixels from
  * the bytes. Everything around it — the schema contract, the
  * `mapPartitions` batch shape (one partition = one decoder
  * instantiation, the Spark-side analogue of a Pandas-UDF batch), the
  * partitioning, and the output feature schema — is real and tested,
  * so swapping a real codec in changes one function.
  *
  * Scale: decode is per-row map work; `repartition` before decode
  * controls batch size / executor memory; features are tiny relative
  * to payloads so the shuffle after extraction carries features only.
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a corpus into the multimodal contract:
    * (id, content binary, meta struct). Payload bytes are derived
    * deterministically from the text fixture (UTF-8), metadata from
    * stable hashes — a stand-in for real image bytes.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")).as("media_type"),
        (pmod(xxhash64(col(idCol), lit(1)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(idCol), lit(2)), lit(1080)) + 1).cast("int").as("height"),
        (pmod(xxhash64(col(idCol), lit(3)), lit(300)) + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** Output schema of the decode+feature step. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("byte_entropy_proxy", DoubleType),
    StructField("sampled_frames", ArrayType(IntegerType))))

  /** STUB decoder: stands in for image/audio decode + resize +
    * feature extraction. Deterministic features from raw bytes; frame
    * sampling picks `sampleEvery`-th frame index from metadata. Runs
    * via mapPartitions so a real decoder would amortize codec init
    * per partition (the Pandas-UDF batch pattern, in Scala).
    */
  def decodeAndFeaturize(media: DataFrame, sampleEvery: Int = 30): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(FeatureSchema))
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, etc.)
        rows.map { r =>
          val id    = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val meta  = r.getStruct(2)
          val mediaType = meta.getString(0)
          val nFrames   = meta.getInt(3)
          var sum = 0L
          var distinct = new Array[Boolean](256)
          var nDistinct = 0
          bytes.foreach { b =>
            val u = b & 0xff
            sum += u
            if (!distinct(u)) { distinct(u) = true; nDistinct += 1 }
          }
          val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
          val frames = (0 until nFrames by sampleEvery).toArray
          Row(id, mediaType, bytes.length.toLong,
            math.rint(mean * 10000) / 10000,
            math.rint(nDistinct.toDouble / 256 * 10000) / 10000,
            frames)
        }
      }(enc)
  }

  /** End-to-end: wrap + decode, the full multimodal feature pipeline. */
  def featurePipeline(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    decodeAndFeaturize(syntheticMedia(docs, idCol, textCol))

  /** STUB resize: a real implementation decodes, scales, re-encodes;
    * the stub transforms the payload deterministically (truncation to
    * the area-scaled length — byte count tracks pixel count) and
    * rewrites the metadata. Schema contract and per-row shape are the
    * real ones.
    */
  def resizeStub(media: DataFrame, newW: Int, newH: Int): DataFrame =
    media.select(
      col("media_id"),
      substring(col("content"), lit(1),
        greatest(lit(1),
          (length(col("content")) * lit(newW * newH) /
            greatest(col("meta.width") * col("meta.height"), lit(1)))
            .cast("int")))
        .as("content"),
      struct(
        col("meta.media_type").as("media_type"),
        lit(newW).as("width"),
        lit(newH).as("height"),
        col("meta.n_frames").as("n_frames")).as("meta"))

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
