package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) plumbing for a training-data
  * pipeline — north-star extension. Media travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs
  * per-partition in batches so a real decoder (JNI codec, ONNX
  * runtime) amortizes model/codec init across a partition instead of
  * paying it per row — the JVM analogue of a Pandas-UDF batch.
  *
  * The decode itself is STUBBED (no media libraries in this
  * environment): [[FakeDecoder]] derives deterministic features from
  * the bytes. The Spark-side contract — schema, batch iteration,
  * partition sizing, output shape — is real and tested; swapping in a
  * real decoder only replaces the `Decoder` implementation.
  */
object Multimodal {

  /** Canonical media-table schema: id, kind (image|audio|video), raw
    * bytes, width/height/duration metadata as a map.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: Map[String, String])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int, features: Array[Float])

  /** Pluggable decoder: bytes -> fixed-dim feature vector. A real
    * implementation would decode + resize + embed; init happens once
    * per partition via `open()`.
    */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
    def close(): Unit = ()
  }

  /** STUB decoder — deterministic fake features from a rolling hash of
    * the payload (`???`-equivalent stand-in; see class doc). Keeps
    * every downstream op (partitioning, joins, ANN) testable.
    */
  object FakeDecoder extends Decoder {
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 0xcbf29ce484222325L ^ kind.hashCode.toLong
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(d) = ((h >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
        d += 1
      }
      out
    }
  }

  /** Batched per-partition feature extraction. `mapPartitions` (not
    * per-row UDF) so `decoder.open()` runs once per partition; at
    * scale, media tables are repartitioned by size so each task holds
    * roughly `targetPartitionBytes` of payload.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      dim: Int = 64,
      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      decoder.open()
      val out = rows.map { r =>
        val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
        MediaFeatures(r.media_id, r.kind, bytes.length, decoder.decode(r.kind, bytes, dim))
      }
      out // close() omitted: iterator is lazy; a real impl hooks TaskContext.addTaskCompletionListener
    }
  }

  /** Frame-sampling plumbing for video rows: emit (media_id, frame_idx)
    * every `everyN` frames based on metadata frame counts — a pure
    * column-level explode, the real decode would be applied downstream.
    */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame = {
    val frames = coalesce(element_at(col("meta"), "n_frames").cast("int"), lit(0))
    media
      .filter(col("kind") === "video" && frames > 0)
      .select(
        col("media_id"),
        explode(sequence(lit(0), frames - 1, lit(everyN))).as("frame_idx"))
  }

  /** Build a synthetic media table from any (id, text) frame — test
    * scaffolding: text bytes stand in for an encoded payload.
    */
  def syntheticMedia(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (col(idCol) % 3 + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("bytes"),
      map(
        lit("n_frames"), (col(idCol) % 30 + 1).cast("string"),
        lit("width"), lit("640"),
        lit("height"), lit("480")).as("meta"))
      .as[MediaRow]
  }
}
