package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: images/audio/video ride through the
  * engine as opaque `binary` payloads plus a typed metadata struct —
  * the same shape a 100 TB media corpus takes in parquet (payload
  * column with large row groups, metadata columns for pruning).
  *
  * The Spark-side plumbing here is real and tested: schema, batch
  * iteration shape (`mapPartitions` over row batches — the JVM
  * equivalent of a `mapInPandas` batch loop), partition sizing, and
  * deterministic feature extraction. The actual codec call is STUBBED
  * (`decodeStub`): this container has no image/audio libraries, so the
  * "decoder" derives deterministic pseudo-dimensions/frames from the
  * payload bytes; swap `decodeStub` for a real codec (JavaCV, TwelveMonkeys,
  * or a Python `mapInPandas` stage) without touching any plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType))), nullable = true)))

  /** Wrap any table into the media shape, payload = utf8 bytes of a
    * text column (deterministic stand-in for real image/audio bytes). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(textCol).cast("binary").as("payload"),
      struct(lit("utf8").as("format"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  /** decoded-media schema: what a real decoder would emit per item. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder: deterministic pseudo-decode of one payload.
    * A real implementation calls the codec here — the signature
    * (bytes in, dims + feature vector out) is the integration point. */
  def decodeStub(payload: Array[Byte], featureDim: Int): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val nFrames = 1 + (n % 8)
    // deterministic feature: stride-sampled byte values, normalized
    val feature = Array.tabulate(featureDim) { i =>
      if (n == 0) 0f else (payload((i * 31) % n) & 0xff) / 255.0f
    }
    (width, height, nFrames, feature)
  }

  /** Decode/feature-extract stage: batched per partition, preserving
    * partitioning (no shuffle). This is the stage you size with
    * `spark.sql.files.maxPartitionBytes` so a partition of payloads
    * fits executor memory. */
  def decode(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        // batch loop shape: pull rows, decode, emit — a real codec
        // would amortize native-lib init across the partition here
        rows.map { r =>
          val id = r.getLong(0)
          val tpe = r.getString(1)
          val payload = if (r.isNullAt(2)) Array.empty[Byte]
            else r.getAs[Array[Byte]](2)
          val (w, h, f, feat) = decodeStub(payload, featureDim)
          Row(id, tpe, w, h, f, feat.toSeq)
        }
      }
    spark.createDataFrame(out, decodedSchema)
  }

  /** "resize": recompute pseudo-dims at a target size — plumbing for
    * the transform-stage position of a real resize. */
  def resize(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height"))
            .cast("double")))
      .withColumn("width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("height", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** frame sampling for video-typed rows: one output row per sampled
    * frame index (explode — the Spark-native fan-out). */
  def sampleFrames(decoded: DataFrame, everyN: Int): DataFrame =
    decoded.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
}
