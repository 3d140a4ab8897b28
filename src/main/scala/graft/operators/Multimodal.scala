package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (builder-prompt extension): image/audio/video
  * as opaque `binary` columns plus typed metadata structs.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `fakeDecodeFeatures` derives a deterministic feature vector
  * from the bytes so the Spark-side plumbing — schema, batched partition
  * processing, feature shape — is real and testable. Swap `decodeBatch` for
  * a real decoder (JNI/ONNX) without touching the plan.
  */
object Multimodal {

  /** Canonical multimodal schema: id + media bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Build a deterministic synthetic media table from any id column — used
    * by tests and as the reference shape for real ingestion.
    */
  def syntheticMedia(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("media_id"), lit(3)) + 1).cast("int")))
      // deterministic pseudo-bytes from the id (stand-in for real payloads)
      .withColumn("bytes", unhex(conv(xxhash64(col("media_id")).cast("string"), 10, 16)))
      .withColumn("meta", struct(
        (pmod(xxhash64(col("media_id"), lit(1)), lit(1024L)) + 16).cast("int").as("width"),
        (pmod(xxhash64(col("media_id"), lit(2)), lit(1024L)) + 16).cast("int").as("height"),
        lit(3).as("channels"),
        lit(16000).as("sample_rate"),
        (pmod(xxhash64(col("media_id"), lit(3)), lit(300L)) + 1).cast("int").as("n_frames")))
  }

  /** STUB decoder: deterministic 8-dim feature vector from the payload bytes.
    * Real implementation would decode pixels/samples here; the signature and
    * batch shape (Iterator[Row] per partition, vectorized per batch) is what
    * a real JNI decoder plugs into.
    */
  private def fakeDecodeFeatures(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    out.map(x => math.round(x * 1e6) / 1e6)
  }

  /** Feature-extract over media rows in partition-sized batches. Returns
    * (media_id, media_type, features array<double>). The mapPartitions shape
    * mirrors what a real decoder needs: per-partition init (model load) then
    * streamed batches.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val bytesIdx = media.schema.fieldIndex("bytes")
    val rdd = media.rdd.mapPartitions { it =>
      // per-partition decoder init would happen here (setup/teardown bundle)
      it.map { r =>
        val feats = fakeDecodeFeatures(r.getAs[Array[Byte]](bytesIdx))
        Row(r.getLong(idIdx), r.getString(typeIdx), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("features", ArrayType(DoubleType)))))
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index from
    * the metadata — pure expression, no decode needed to *plan* the work.
    */
  def sampleFrameIndices(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"))
}
